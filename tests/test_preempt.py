"""Graceful preemption: SIGTERM latching, mid-epoch emergency save, resume
(din_tpu/train/preempt.py + engine wiring; the reference loses the run,
SURVEY.md §5 'failure detection / elastic recovery')."""

import os
import signal

from din_tpu.experiments.presets import PRESETS
from din_tpu.train import engine
from din_tpu.train.engine import train_net
from din_tpu.train.preempt import PreemptionGuard


def _smoke_cfg(tmp_path, **kw):
    cfg = PRESETS["synthetic_smoke"]()
    kw.setdefault("max_epoch", 1)
    kw.setdefault("backbone", "alex")
    kw.setdefault("out_size", (1, 2))
    kw.setdefault("emb_features", 256)
    return cfg.replace(result_root=str(tmp_path), **kw)


def test_preemption_guard_latches_sigterm():
    """A real SIGTERM inside the guard sets the flag instead of killing the
    process; the previous handler is restored on exit."""
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert guard.armed and not guard.should_stop
        os.kill(os.getpid(), signal.SIGTERM)
        # CPython delivers at the next bytecode boundary in the main thread
        for _ in range(100):
            if guard.should_stop:
                break
        assert guard.should_stop
    assert signal.getsignal(signal.SIGTERM) is before


class _FakeGuard:
    """should_stop turns True after `after` queries (one per train step)."""

    def __init__(self, after=2):
        self.after = after
        self.calls = 0
        self.armed = True

    @property
    def should_stop(self):
        self.calls += 1
        return self.calls > self.after

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        pass


def test_preemption_saves_and_auto_resumes(tmp_path, monkeypatch):
    """Engine path: a preemption mid-epoch writes a full-state _preempt
    checkpoint and returns cleanly; auto_resume picks it up and reruns the
    interrupted epoch."""
    monkeypatch.setattr(engine, "PreemptionGuard", lambda: _FakeGuard(2))
    cfg1 = _smoke_cfg(tmp_path, max_epoch=5, exp_note="pre",
                      exp_name="preempt_exp")
    train_net(cfg1)                      # returns early via the fake guard
    files = os.listdir(cfg1.result_path)
    pre = [f for f in files if f.endswith("_preempt.ckpt")]
    assert pre == ["stage2_epoch0_preempt.ckpt"]   # died in epoch 1
    log = open(os.path.join(cfg1.result_path, "log.txt")).read()
    assert "preemption: state saved" in log

    monkeypatch.setattr(engine, "PreemptionGuard", PreemptionGuard)
    cfg2 = _smoke_cfg(tmp_path, max_epoch=1, exp_note="pre",
                      exp_name="preempt_exp", auto_resume=True)
    train_net(cfg2, max_steps_per_epoch=2)
    log = open(os.path.join(cfg2.result_path, "log.txt")).read()
    assert "resuming at epoch 1" in log
    assert "Train at epoch #1" in log


def test_preemption_stage1_resume(tmp_path, monkeypatch):
    """Stage-1 runs (component-style regular saves) resume from the
    _preempt full-state save too."""
    monkeypatch.setattr(engine, "PreemptionGuard", lambda: _FakeGuard(2))
    cfg1 = _smoke_cfg(tmp_path, max_epoch=5, exp_note="pre1",
                      exp_name="preempt1_exp", training_stage=1,
                      test_before_train=False)
    train_net(cfg1)
    pre = [f for f in os.listdir(cfg1.result_path)
           if f.endswith("_preempt.ckpt")]
    assert pre == ["stage1_epoch0_preempt.ckpt"]

    monkeypatch.setattr(engine, "PreemptionGuard", PreemptionGuard)
    cfg2 = _smoke_cfg(tmp_path, max_epoch=1, exp_note="pre1",
                      exp_name="preempt1_exp", training_stage=1,
                      test_before_train=False, auto_resume=True)
    train_net(cfg2, max_steps_per_epoch=2)
    log = open(os.path.join(cfg2.result_path, "log.txt")).read()
    assert "Resuming stage1" in log
    assert "Train at epoch #1" in log


def test_guard_degrades_off_main_thread():
    """Installed off the main thread the guard is inert, not an error
    (embedding the engine in a worker thread keeps working)."""
    import threading

    result = {}

    def run():
        with PreemptionGuard() as guard:
            result["armed"] = guard.armed
            result["stop"] = guard.should_stop

    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert result == {"armed": False, "stop": False}


def test_exact_mid_epoch_resume(tmp_path, monkeypatch):
    """A preempted-then-resumed run reproduces the uninterrupted run's
    parameters EXACTLY: the save carries step count + step PRNG, and the
    loader's set_epoch makes data order a pure function of (seed, epoch)
    so the resumed epoch continues at the next batch."""
    import numpy as np
    from din_tpu.train import checkpoint as ckpt_lib

    # run A: 2 uninterrupted epochs
    cfgA = _smoke_cfg(tmp_path, max_epoch=2, exp_note="ex",
                      exp_name="exactA")
    train_net(cfgA)

    # run B: preempt after 4 steps of epoch 1, then auto-resume to epoch 2
    monkeypatch.setattr(engine, "PreemptionGuard", lambda: _FakeGuard(3))
    cfgB1 = _smoke_cfg(tmp_path, max_epoch=5, exp_note="ex",
                       exp_name="exactB")
    train_net(cfgB1)
    pre = [f for f in os.listdir(cfgB1.result_path)
           if f.endswith("_preempt.ckpt")]
    assert pre == ["stage2_epoch0_preempt.ckpt"]
    assert ckpt_lib.load_checkpoint(
        os.path.join(cfgB1.result_path, pre[0]))["step"] == 4

    monkeypatch.setattr(engine, "PreemptionGuard", PreemptionGuard)
    cfgB2 = _smoke_cfg(tmp_path, max_epoch=2, exp_note="ex",
                       exp_name="exactB", auto_resume=True)
    train_net(cfgB2)
    log = open(os.path.join(cfgB2.result_path, "log.txt")).read()
    assert "resuming at epoch 1, step 4" in log

    def epoch2_params(result_path):
        f = [f for f in os.listdir(result_path)
             if f.startswith("stage2_epoch2_")]
        assert len(f) == 1, f
        return ckpt_lib.load_checkpoint(os.path.join(result_path, f[0]))

    a = epoch2_params(cfgA.result_path)
    b = epoch2_params(cfgB2.result_path)
    import jax
    for la, lb in zip(jax.tree_util.tree_leaves(a["params"]),
                      jax.tree_util.tree_leaves(b["params"])):
        np.testing.assert_allclose(la, lb, rtol=1e-6, atol=1e-7)


def test_newest_resumable_prefers_preempt_on_epoch_tie(tmp_path):
    """A _preempt save shares its epoch number with that epoch's regular
    eval save but is mid-NEXT-epoch state — it must win the tie regardless
    of directory order (code-review finding)."""
    from din_tpu.train.engine import newest_resumable

    for name in ("stage2_epoch3_91.25%.ckpt", "stage2_epoch3_preempt.ckpt",
                 "stage2_epoch2_90.00%.ckpt"):
        open(os.path.join(str(tmp_path), name), "wb").close()
    got = newest_resumable(str(tmp_path), training_stage=2)
    assert got.endswith("stage2_epoch3_preempt.ckpt")
    # stage 1: only _preempt files are resumable
    got1 = newest_resumable(str(tmp_path), training_stage=1)
    assert got1.endswith("stage2_epoch3_preempt.ckpt")


def test_preemption_during_eval_aborts_and_saves(tmp_path, monkeypatch):
    """A preemption that lands during the per-epoch eval pass aborts the
    eval and saves immediately (epoch complete, step 0) instead of
    deferring past the grace window (code-review finding)."""
    # 2 train steps consume 2 guard queries; the 3rd lands on an eval batch
    monkeypatch.setattr(engine, "PreemptionGuard", lambda: _FakeGuard(2))
    cfg = _smoke_cfg(tmp_path, max_epoch=3, exp_note="ev",
                     exp_name="preempt_eval_exp")
    train_net(cfg, max_steps_per_epoch=2)
    pre = [f for f in os.listdir(cfg.result_path)
           if f.endswith("_preempt.ckpt")]
    assert pre == ["stage2_epoch1_preempt.ckpt"]   # epoch 1 COMPLETE
    from din_tpu.train import checkpoint as ckpt_lib
    ck = ckpt_lib.load_checkpoint(os.path.join(cfg.result_path, pre[0]))
    assert ck["epoch"] == 1 and ck["step"] == 0
    # no best/regular checkpoint recorded from the partial eval
    assert not [f for f in os.listdir(cfg.result_path)
                if f.startswith("stage2_epoch1_") and "preempt" not in f]


def test_frame_parallel_cfg_usable_without_mesh(tmp_path):
    """A frame_parallel cfg must stay usable outside train_net (Predictor,
    bare init): the trunk's sharding constraints are skipped when no
    ambient mesh carries the frame axes (code-review finding)."""
    import jax
    import numpy as np

    from __graft_entry__ import _make_batch
    from din_tpu.models.registry import build_model
    from din_tpu.train.engine import init_model

    cfg = PRESETS["synthetic_smoke"]().replace(
        result_root=str(tmp_path), backbone="alex", out_size=(1, 2),
        emb_features=256, frame_parallel=True)
    model = build_model(cfg)
    batch = _make_batch(cfg, batch_size=2)
    variables = init_model(cfg, model, batch)   # no mesh installed
    out = model.apply(variables, batch["images"], batch["boxes"],
                      train=False)
    assert np.asarray(out["activities"]).shape[0] == 2


def test_train_to_epoch_absolute_target(tmp_path, monkeypatch):
    """cfg.train_to_epoch is an absolute stop (consistent with lr_plan's
    absolute keys): a preempted-and-relaunched run completes the original
    plan instead of training max_epoch MORE epochs every relaunch."""
    monkeypatch.setattr(engine, "PreemptionGuard", lambda: _FakeGuard(2))
    cfg1 = _smoke_cfg(tmp_path, max_epoch=99, train_to_epoch=2,
                      exp_note="tt", exp_name="tt_exp")
    train_net(cfg1)                     # preempted in epoch 1

    monkeypatch.setattr(engine, "PreemptionGuard", PreemptionGuard)
    cfg2 = _smoke_cfg(tmp_path, max_epoch=99, train_to_epoch=2,
                      exp_note="tt", exp_name="tt_exp", auto_resume=True)
    train_net(cfg2, max_steps_per_epoch=2)
    log = open(os.path.join(cfg2.result_path, "log.txt")).read()
    assert "Train at epoch #2" in log
    assert "Train at epoch #3" not in log    # absolute target respected


def test_sigterm_subprocess_integration(tmp_path):
    """Full unix integration: a real `python -m din_tpu.experiments.run`
    process receives SIGTERM mid-training, exits 0 with the emergency
    checkpoint on disk (covers handler install in the CLI main thread —
    the in-process tests above use injected guards)."""
    import signal as _signal
    import subprocess
    import sys
    import time

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # single CPU device: the inherited 8-virtual-device XLA flag would make
    # the child replicate its batch and crawl (8x oversubscribed on 1 core)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "din_tpu.experiments.run",
         "--preset", "synthetic_smoke", "--exp-name", "sig_exp",
         "--max-epoch", "50", "--result-root", str(tmp_path)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    # wait for training to be under way (epoch-1 summary in the log file),
    # then terminate mid-epoch-2
    log = os.path.join(str(tmp_path), "sig_exp", "log.txt")
    deadline = time.time() + 420
    while time.time() < deadline:
        if proc.poll() is not None:
            raise AssertionError("run exited early:\n"
                                 + proc.communicate()[0][-2000:])
        if os.path.exists(log) and "Train at epoch #1" in open(log).read():
            break
        time.sleep(1.0)
    else:
        proc.kill()
        raise AssertionError("training never reached epoch 1")
    time.sleep(2.0)                      # land inside epoch 2
    proc.send_signal(_signal.SIGTERM)
    out, _ = proc.communicate(timeout=240)
    assert proc.returncode == 0, out[-2000:]
    assert "preemption: state saved" in out
    pre = [f for f in os.listdir(os.path.join(str(tmp_path), "sig_exp"))
           if f.endswith("_preempt.ckpt")]
    assert len(pre) == 1
