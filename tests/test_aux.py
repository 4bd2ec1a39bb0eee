"""Auxiliary subsystems: resume, MAD diagnostics, FLOP/cost analysis
(SURVEY.md §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from din_tpu.experiments.presets import PRESETS
from din_tpu.train.engine import train_net
from din_tpu.utils.meters import MADmeter
from din_tpu.utils.profiling import gflops, param_count


def _smoke_cfg(tmp_path, **kw):
    cfg = PRESETS["synthetic_smoke"]()
    kw.setdefault("max_epoch", 1)
    return cfg.replace(result_root=str(tmp_path), **kw)


def test_resume_continues_epochs(tmp_path):
    """Stage-2 resume restores epoch + optimizer (the reference saved both
    but restored neither, train_net.py:99,121-125)."""
    cfg1 = _smoke_cfg(tmp_path, max_epoch=2, exp_note="resume_a",
                      backbone="alex", out_size=(1, 2), emb_features=256)
    train_net(cfg1, max_steps_per_epoch=2)
    ckpts = sorted(f for f in os.listdir(cfg1.result_path)
                   if f.endswith(".ckpt"))
    assert ckpts
    last = os.path.join(cfg1.result_path, ckpts[-1])

    cfg2 = _smoke_cfg(tmp_path, max_epoch=1, exp_note="resume_b",
                      backbone="alex", out_size=(1, 2), emb_features=256,
                      load_stage2model=True, stage2model=last)
    train_net(cfg2, max_steps_per_epoch=2)
    log = open(os.path.join(cfg2.result_path, "log.txt")).read()
    assert "resuming at epoch 3" in log
    assert "Train at epoch #3" in log


def test_mad_diagnostic(tmp_path):
    cfg = _smoke_cfg(tmp_path, exp_note="mad", measure_mad=True,
                     backbone="alex", out_size=(1, 2), emb_features=256)
    train_net(cfg, max_steps_per_epoch=1)
    log = open(os.path.join(cfg.result_path, "log.txt")).read()
    assert "MAD:" in log


def test_madmeter_rect_oracle(rng):
    """MADmeter rect mode vs a direct 1-cos computation on the
    fully-connected field."""
    f = rng.randn(2, 3, 4, 8)
    m = MADmeter(3, 4)
    m.cal_MAD(f, [3, 4], field_shape="rect")
    got = m.output_MAD()
    flat = f.reshape(2, 12, 8)
    n = np.linalg.norm(flat, axis=2, keepdims=True)
    cos = flat @ flat.transpose(0, 2, 1) / (n @ n.transpose(0, 2, 1) + 1e-8)
    ref = (1 - cos).sum(2) / 12
    np.testing.assert_allclose(got, ref.mean(1).sum() / 2, rtol=1e-6)


def test_gflops_and_params():
    def fn(a, b):
        return a @ b

    a = jnp.zeros((128, 256))
    b = jnp.zeros((256, 512))
    g = gflops(fn, a, b)
    assert 0.9 * (2 * 128 * 256 * 512 / 1e9) <= g <= \
        1.5 * (2 * 128 * 256 * 512 / 1e9)
    assert param_count({"w": np.zeros((3, 4)), "b": np.zeros(4)}) == 16


def test_auto_resume(tmp_path):
    """auto_resume picks up the newest checkpoint in a fixed exp dir."""
    cfg1 = _smoke_cfg(tmp_path, max_epoch=1, exp_note="ar",
                      exp_name="fixed_exp", backbone="alex",
                      out_size=(1, 2), emb_features=256)
    train_net(cfg1, max_steps_per_epoch=2)
    cfg2 = _smoke_cfg(tmp_path, max_epoch=1, exp_note="ar",
                      exp_name="fixed_exp", backbone="alex",
                      out_size=(1, 2), emb_features=256, auto_resume=True)
    train_net(cfg2, max_steps_per_epoch=2)
    log = open(os.path.join(cfg2.result_path, "log.txt")).read()
    assert "resuming at epoch 2" in log


def test_head_flop_probes():
    """The per-head FLOP probe CLI (reference __main__ analogue,
    AT_infer_module.py:146-151) builds and reports every head."""
    from din_tpu.utils.profiling import _head_probes, module_cost_report

    probes = {name: (mod, ex) for name, mod, ex in _head_probes()}
    assert len(probes) == 8
    import jax
    mod, ex = probes["BiUTE"]
    variables = mod.init(jax.random.PRNGKey(0), *ex)
    line = module_cost_report(mod, variables, *ex, name="BiUTE")
    assert "GFLOPs" in line and "#Params" in line


def test_orbax_checkpoint_roundtrip_and_resume(tmp_path):
    """cfg.checkpoint_backend='orbax' writes a directory checkpoint that
    load_checkpoint auto-detects and a second run can resume from —
    multi-host-safe saves the msgpack file path can't provide."""
    cfg1 = _smoke_cfg(tmp_path, max_epoch=2, exp_note="orbax_a",
                      backbone="alex", out_size=(1, 2), emb_features=256,
                      checkpoint_backend="orbax")
    train_net(cfg1, max_steps_per_epoch=2)
    ckpts = sorted(f for f in os.listdir(cfg1.result_path)
                   if f.endswith(".ckpt"))
    assert ckpts
    last = os.path.join(cfg1.result_path, ckpts[-1])
    assert os.path.isdir(last)          # orbax = directory checkpoint

    from din_tpu.train.checkpoint import load_checkpoint
    ckpt = load_checkpoint(last)
    assert int(ckpt["epoch"]) == 2
    assert "params" in ckpt and "opt_state" in ckpt

    cfg2 = _smoke_cfg(tmp_path, max_epoch=1, exp_note="orbax_b",
                      backbone="alex", out_size=(1, 2), emb_features=256,
                      load_stage2model=True, stage2model=last)
    train_net(cfg2, max_steps_per_epoch=2)
    log = open(os.path.join(cfg2.result_path, "log.txt")).read()
    assert "resuming at epoch 3" in log


def test_prune_checkpoints(tmp_path):
    """Retention: newest K regular saves kept, plus the best-acc file;
    _preempt and other-stage files untouched (train/checkpoint.py)."""
    from din_tpu.train.checkpoint import prune_checkpoints

    names = ["stage2_epoch1_80.00%.ckpt", "stage2_epoch2_95.00%.ckpt",
             "stage2_epoch3_90.00%.ckpt", "stage2_epoch4_91.00%.ckpt",
             "stage2_epoch2_preempt.ckpt", "stage1_epoch9_70.00%.ckpt"]
    for n in names:
        open(os.path.join(str(tmp_path), n), "wb").close()
    removed = prune_checkpoints(str(tmp_path), stage=2, keep=2)
    left = sorted(os.listdir(str(tmp_path)))
    assert removed == ["stage2_epoch1_80.00%.ckpt"]
    assert "stage2_epoch2_95.00%.ckpt" in left        # best acc protected
    assert "stage2_epoch3_90.00%.ckpt" in left        # newest-2
    assert "stage2_epoch4_91.00%.ckpt" in left
    assert "stage2_epoch2_preempt.ckpt" in left       # emergency save kept
    assert "stage1_epoch9_70.00%.ckpt" in left        # other stage kept
    # keep=0 disables pruning (reference behaviour)
    assert prune_checkpoints(str(tmp_path), stage=2, keep=0) == []


def test_keep_checkpoints_engine(tmp_path):
    """cfg.keep_checkpoints prunes after each stage-2 save in train_net."""
    cfg = _smoke_cfg(tmp_path, max_epoch=3, exp_note="gc",
                     backbone="alex", out_size=(1, 2), emb_features=256,
                     keep_checkpoints=1)
    train_net(cfg, max_steps_per_epoch=1)
    regular = [f for f in os.listdir(cfg.result_path)
               if f.endswith(".ckpt")]
    # 3 epochs saved; retention keeps newest 1 + best (may coincide)
    assert 1 <= len(regular) <= 2


def test_inspect_ckpt(tmp_path, capsys):
    """Checkpoint inspection CLI: structure summary for din_tpu msgpack
    checkpoints and reference .pth dumps (din_tpu/train/inspect_ckpt.py)."""
    import numpy as np

    from din_tpu.train.checkpoint import save_checkpoint
    from din_tpu.train.inspect_ckpt import describe

    path = str(tmp_path / "stage2_epoch3_50.00%.ckpt")
    save_checkpoint(path, {
        "epoch": 3,
        "params": {"trunk": {"w": np.zeros((4, 8), np.float32)},
                   "head": {"b": np.ones((8,), np.float32)}},
        "batch_stats": {},
    })
    info = describe(path, full=True)
    assert info["scalars"]["epoch"] == 3
    assert info["subtrees"]["params"]["elements"] == 40
    out = capsys.readouterr().out
    assert "params/trunk/w: (4, 8) float32" in out

    try:
        import torch
    except ImportError:
        return
    pth = str(tmp_path / "ref.pth")
    torch.save({"epoch": 1, "state_dict":
                {"fc.weight": torch.zeros(2, 3)}, "optimizer": {}}, pth)
    info = describe(pth)
    assert info["kind"] == "torch"
    assert info["subtrees"]["state_dict"]["elements"] == 6
