"""End-to-end engine tests on synthetic data (SURVEY.md §4: CPU-runnable
train loop), plus loss-function unit tests against torch."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from din_tpu.config import Config
from din_tpu.experiments.presets import PRESETS
from din_tpu.train.engine import train_net
from din_tpu.train.losses import cross_entropy
from din_tpu.train.optim import lr_for_epoch


def test_cross_entropy_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    logits = rng.randn(7, 5).astype(np.float32)
    labels = rng.randint(0, 5, 7)
    w = rng.uniform(0.2, 2.0, 5).astype(np.float32)
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                         jnp.asarray(w))
    ref = F.cross_entropy(torch.from_numpy(logits),
                          torch.from_numpy(labels),
                          weight=torch.from_numpy(w))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_cross_entropy_ignores_masked(rng):
    logits = rng.randn(4, 3).astype(np.float32)
    labels = np.array([0, 1, -1, 2])
    mask = labels >= 0
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                         valid_mask=jnp.asarray(mask))
    ref = cross_entropy(jnp.asarray(logits[mask]), jnp.asarray(labels[mask]))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_lr_plan():
    cfg = Config("volleyball").replace(train_learning_rate=1e-4,
                                       lr_plan={11: 3e-5, 21: 1e-5})
    assert lr_for_epoch(cfg, 1) == 1e-4
    assert lr_for_epoch(cfg, 11) == 3e-5
    assert lr_for_epoch(cfg, 15) == 3e-5
    assert lr_for_epoch(cfg, 30) == 1e-5


def test_set_learning_rate_is_functional():
    """set_learning_rate returns a NEW state and leaves the old one
    untouched (a previous version mutated optax internals in place)."""
    import jax.numpy as jnp

    from din_tpu.train.optim import make_optimizer, set_learning_rate

    cfg = Config("volleyball").replace(train_learning_rate=1e-4)
    params = {"trunk": {"w": jnp.ones((4, 4))}, "head": {"w": jnp.ones(3)}}
    tx = make_optimizer(cfg, params)
    st = tx.init(params)
    st2 = set_learning_rate(st, 5e-5)
    assert np.isclose(float(st.inner_state.hyperparams["learning_rate"]),
                      1e-4)
    assert np.isclose(float(st2.inner_state.hyperparams["learning_rate"]),
                      5e-5)
    # the new state drives updates at the new lr
    upd, _ = tx.update(params, st2, params)
    assert np.isclose(float(jnp.abs(upd["head"]["w"]).max()), 5e-5,
                      rtol=1e-2)


def _smoke_cfg(tmp_path, **kw):
    cfg = PRESETS["synthetic_smoke"]()
    kw.setdefault("max_epoch", 1)
    cfg = cfg.replace(result_root=str(tmp_path), **kw)
    return cfg


def test_engine_stage2_synthetic(tmp_path):
    cfg = _smoke_cfg(tmp_path)
    best = train_net(cfg, max_steps_per_epoch=2)
    assert "activities_acc" in best
    # a checkpoint was written
    files = os.listdir(cfg.result_path)
    assert any(f.endswith(".ckpt") for f in files)
    assert "log.txt" in files
    # machine-readable epoch stream: one JSON object per epoch/phase
    import json
    recs = [json.loads(line) for line in
            open(os.path.join(cfg.result_path, "metrics.jsonl"))]
    phases = {r["phase"] for r in recs}
    assert {"Train", "Test"} <= phases
    assert all("activities_acc" in r and "loss" in r for r in recs)


def test_engine_stage1_then_stage2_graft(tmp_path):
    """Full two-stage flow: stage-1 trains and saves components; stage-2
    grafts backbone + fc_emb from the stage-1 checkpoint
    (infer_model.py:122-126 semantics)."""
    cfg1 = _smoke_cfg(tmp_path, training_stage=1, num_frames=1,
                      exp_note="smoke_s1")
    best1 = train_net(cfg1, max_steps_per_epoch=2)
    ckpts = [f for f in os.listdir(cfg1.result_path) if f.endswith(".ckpt")]
    assert ckpts
    stage1_path = os.path.join(cfg1.result_path, ckpts[0])

    cfg2 = _smoke_cfg(tmp_path, num_frames=4, exp_note="smoke_s2",
                      load_backbone_stage2=True,
                      stage1_model_path=stage1_path)
    best2 = train_net(cfg2, max_steps_per_epoch=2)
    assert "activities_acc" in best2


def test_engine_collective_synthetic(tmp_path):
    cfg = Config("collective").replace(
        training_stage=2, inference_module_name="dynamic_collective",
        data_path="synthetic", backbone="alex", image_size=(64, 96),
        out_size=(1, 2), emb_features=256, num_frames=4, num_boxes=13,
        num_actions=5, num_activities=4, num_features_boxes=64,
        num_features_gcn=64, ST_kernel_size=(3, 3), sampling_ratio=[1],
        beta_factor=False, batch_size=4, test_batch_size=4, max_epoch=1,
        train_backbone=True, compute_dtype="float32",
        result_root=str(tmp_path), exp_note="smoke_collective")
    best = train_net(cfg, max_steps_per_epoch=2)
    assert "activities_acc" in best


def test_loss_decreases_on_learnable_synthetic(tmp_path):
    """Overfit check: with a fixed tiny dataset the training loss after a
    few epochs must drop (the whole compiled step — backbone, RoIAlign,
    DIN, Adam — actually learns)."""
    cfg = _smoke_cfg(tmp_path, max_epoch=3, exp_note="smoke_learn",
                     backbone="alex", out_size=(1, 2), emb_features=256,
                     test_interval_epoch=3)
    # capture per-epoch train losses via the log file
    best = train_net(cfg, max_steps_per_epoch=4)
    log = open(os.path.join(cfg.result_path, "log.txt")).read()
    losses = [float(line.split("Loss: ")[1].split(",")[0])
              for line in log.splitlines()
              if "Loss: " in line and "Train" not in line][:]
    # gather train-phase losses only (lines after 'Train at epoch')
    train_losses = []
    lines = log.splitlines()
    for i, line in enumerate(lines):
        if line.startswith("Train at epoch") and i + 1 < len(lines):
            nxt = lines[i + 1]
            if "Loss: " in nxt:
                train_losses.append(
                    float(nxt.split("Loss: ")[1].split(",")[0]))
    assert len(train_losses) >= 3
    assert train_losses[-1] < train_losses[0]


def test_engine_ref_checkpoint_graft(tmp_path):
    """cfg.ref_checkpoint_path grafts a reference-framework .pth (full
    state_dict format, train_net.py:120-127) into the model before
    training; the grafted head weights must actually land in the step."""
    torch = pytest.importorskip("torch")
    import jax
    from din_tpu.models.registry import build_model

    cfg = _smoke_cfg(tmp_path, exp_note="smoke_refckpt")
    # discover the real head shapes from an init, then fabricate a
    # reference checkpoint carrying a recognisable fc_activities
    model = build_model(cfg)
    from din_tpu.data.datasets import return_dataset
    from din_tpu.data.loader import BatchLoader
    train_set, _ = return_dataset(cfg)
    sample = next(iter(BatchLoader(train_set, cfg.batch_size,
                                   shuffle=False, num_workers=1)))
    from din_tpu.train.engine import init_model
    variables = init_model(cfg, model, sample)
    kern = np.asarray(variables["params"]["fc_activities"]["kernel"])
    w = np.full(kern.T.shape, 0.0625, np.float32)
    b = np.arange(kern.shape[1], dtype=np.float32) / 64.0
    path = str(tmp_path / "ref_stage2.pth")
    torch.save({"epoch": 1,
                "state_dict": {"fc_activities.weight": torch.tensor(w),
                               "fc_activities.bias": torch.tensor(b)},
                "optimizer": {}}, path)

    cfg2 = cfg.replace(ref_checkpoint_path=path)
    best = train_net(cfg2, max_steps_per_epoch=1)
    assert "activities_acc" in best
    log = open(os.path.join(cfg2.result_path, "log.txt")).read()
    assert "Loaded reference checkpoint" in log and "0 keys skipped" in log


def _accum_state_and_batch(cfg):
    from din_tpu.data.datasets import return_dataset
    from din_tpu.data.loader import BatchLoader
    from din_tpu.models.registry import build_model
    from din_tpu.train.engine import TrainState, init_model
    from din_tpu.train.optim import make_optimizer

    model = build_model(cfg)
    train_set, _ = return_dataset(cfg)
    batch = next(iter(BatchLoader(train_set, cfg.batch_size,
                                  shuffle=False, num_workers=1)))
    variables = init_model(cfg, model, batch)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       rng=jax.random.PRNGKey(0))
    return model, tx, state, batch, bool(variables.get("batch_stats"))


def test_grad_accum_matches_single_step(tmp_path):
    """grad_accum_steps=2 must reproduce the single-step update exactly:
    with no BN (alex) and no dropout, mean-of-micro-means equals the
    full-batch mean loss/grad, so one Adam update from accumulated grads
    lands on the same parameters (f32 reduction-order tolerance)."""
    from din_tpu.train.engine import make_train_step

    cfg = Config("volleyball").replace(
        training_stage=2, inference_module_name="dynamic_volleyball",
        data_path="synthetic", backbone="alex", image_size=(64, 96),
        out_size=(1, 2), emb_features=256, num_frames=2, num_boxes=12,
        num_features_boxes=64, num_features_gcn=64, lite_dim=32,
        ST_kernel_size=((3, 3),), sampling_ratio=[1], beta_factor=False,
        batch_size=4, test_batch_size=4, train_backbone=True,
        compute_dtype="float32", train_dropout_prob=0.0,
        result_root=str(tmp_path), exp_note="accum_eq")
    model, tx, state, batch, has_bn = _accum_state_and_batch(cfg)
    assert not has_bn

    step1 = make_train_step(model, cfg, tx, frame0_labels=True,
                            has_bn=has_bn, donate=False)
    step2 = make_train_step(model, cfg.replace(grad_accum_steps=2), tx,
                            frame0_labels=True, has_bn=has_bn, donate=False)
    s1, m1 = step1(state, batch)
    s2, m2 = step2(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    # counters combine exactly
    assert int(m1["activities_total"]) == int(m2["activities_total"])
    np.testing.assert_array_equal(np.asarray(m1["activities_conf"]),
                                  np.asarray(m2["activities_conf"]))
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_grad_accum_trains_with_bn(tmp_path):
    """End-to-end engine run with grad_accum_steps=2 on a BN backbone
    (res18): batch_stats are carried across micro-batches and the loop
    completes with metrics + checkpoint."""
    cfg = _smoke_cfg(tmp_path, grad_accum_steps=2, exp_note="accum_bn")
    best = train_net(cfg, max_steps_per_epoch=2)
    assert "activities_acc" in best


def test_eval_only_scores_checkpoint_without_training(tmp_path):
    """cfg.eval_only: one eval pass on the loaded checkpoint, no training —
    the first-class form of scoring released weights (replaces the
    reference's test_before_train + max_epoch=0 combination,
    train_net.py:93-95)."""
    cfg = _smoke_cfg(tmp_path, exp_note="evalonly_train")
    train_net(cfg, max_steps_per_epoch=2)
    ckpts = [f for f in os.listdir(cfg.result_path) if f.endswith(".ckpt")]
    assert ckpts
    ckpt = os.path.join(cfg.result_path, ckpts[0])

    cfg2 = _smoke_cfg(tmp_path, exp_note="evalonly_eval", eval_only=True,
                      load_stage2model=True, stage2model=ckpt,
                      load_backbone_stage2=False)
    info = train_net(cfg2)
    assert "activities_acc" in info and "activities_MPCA" in info
    # no training happened: the eval-only run wrote no checkpoint
    files = os.listdir(cfg2.result_path)
    assert not any(f.endswith(".ckpt") for f in files)
    assert "log.txt" in files


def test_engine_zero1_shard_opt_state(tmp_path):
    """cfg.shard_opt_state through the FULL engine: train + eval + the
    checkpoint writer must handle sharded Adam moments (np.asarray gathers
    a fully-addressable sharded array), and resume must reload them."""
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs a multi-device mesh")
    cfg = _smoke_cfg(tmp_path, exp_note="smoke_zero", shard_opt_state=True)
    best = train_net(cfg, max_steps_per_epoch=2)
    assert "activities_acc" in best
    files = os.listdir(cfg.result_path)
    ckpts = [f for f in files if f.endswith(".ckpt")]
    assert ckpts
    # resume from the sharded-state checkpoint (full stage-2 state)
    cfg2 = _smoke_cfg(tmp_path, exp_note="smoke_zero_resume", max_epoch=2,
                      shard_opt_state=True, load_stage2model=True,
                      stage2model=os.path.join(cfg.result_path, ckpts[-1]))
    best2 = train_net(cfg2, max_steps_per_epoch=2)
    assert "activities_acc" in best2
