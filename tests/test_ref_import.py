"""Reference-checkpoint migration: .pth files written by the reference
framework load directly into din_tpu models (din_tpu/nn/ref_import.py).

Round-trips actual ``torch.save`` artifacts in both reference formats —
the stage-1 component file (base_model.py:46-54) and the full-model
``state_dict`` file (train_net.py:120-127) — and checks the grafted flax
model reproduces the torch model's logits.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from test_full_model_oracle import (_jax_inputs, _make_inputs,  # noqa: E402
                                    _our_cfg, _ref_cfg, _randomize_din,
                                    _torch_inputs, ref_models)

from din_tpu.models.registry import build_model  # noqa: E402
from din_tpu.nn.ref_import import load_reference_checkpoint  # noqa: E402


def test_full_model_state_dict_import(ref_models, rng, tmp_path):
    """train_net.py full-checkpoint format -> flagship Dynamic_volleyball."""
    rcfg = _ref_cfg()
    torch.manual_seed(0)
    tm = ref_models.infer_model.Dynamic_volleyball(rcfg)
    _randomize_din(tm.DPI, seed=1)
    tm.eval()
    path = str(tmp_path / "stage2_epoch7.pth")
    torch.save({"epoch": 7, "state_dict": tm.state_dict(),
                "optimizer": {}}, path)

    images, boxes = _make_inputs(rng, rcfg)
    images = np.round(images)
    with torch.no_grad():
        want = tm(_torch_inputs(images, boxes))["activities"].numpy()

    cfg = _our_cfg(rcfg)
    model = build_model(cfg)
    ij, bj = _jax_inputs(images, boxes)
    variables = model.init(jax.random.PRNGKey(0), ij, bj, train=False)
    variables, skipped = load_reference_checkpoint(variables, path, cfg)
    assert skipped == []                 # every tensor recognised
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    np.testing.assert_allclose(np.asarray(out["activities"]), want,
                               rtol=2e-3, atol=2e-3)


def test_stage1_component_import(ref_models, rng, tmp_path):
    """base_model.py savemodel component format -> stage-1 Basenet."""
    rcfg = _ref_cfg(num_frames=3, num_features_boxes=32, lite_dim=None)
    torch.manual_seed(0)
    tm = ref_models.base_model.Basenet_volleyball(rcfg)
    tm.eval()
    path = str(tmp_path / "stage1_epoch3.pth")
    torch.save({"backbone_state_dict": tm.backbone.state_dict(),
                "fc_emb_state_dict": tm.fc_emb.state_dict(),
                "fc_actions_state_dict": tm.fc_actions.state_dict(),
                "fc_activities_state_dict": tm.fc_activities.state_dict()},
               path)

    images, boxes = _make_inputs(rng, rcfg)
    images = np.round(images)
    with torch.no_grad():
        want_actions, want_acts = tm(_torch_inputs(images, boxes))

    cfg = _our_cfg(rcfg, training_stage=1, lite_dim=None)
    model = build_model(cfg)
    ij, bj = _jax_inputs(images, boxes)
    variables = model.init(jax.random.PRNGKey(0), ij, bj, train=False)
    variables, skipped = load_reference_checkpoint(variables, path, cfg)
    assert skipped == []
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    np.testing.assert_allclose(np.asarray(out["actions"]),
                               want_actions.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["activities"]),
                               want_acts.numpy(), rtol=2e-3, atol=2e-3)


# ---- every head family round-trips through the flat importer ---------------

from test_backbones import _randomize_bn_stats  # noqa: E402


def _roundtrip(rng, tmp_path, rcfg, model_name, tm, B=2, input_cfg=None,
               out_key="activities", want=None, allow_skipped=()):
    """Save ``tm.state_dict()`` in the reference's full-model format, import
    via load_reference_checkpoint, compare logits end-to-end.

    ``allow_skipped`` lists report entries that are EXPECTED: reference
    modules whose parameters exist on disk but feed no returned output
    (dead heads our models omit by design)."""
    path = str(tmp_path / "ref_full.pth")
    torch.save({"epoch": 1, "state_dict": tm.state_dict(),
                "optimizer": {}}, path)
    images, boxes = _make_inputs(rng, input_cfg or rcfg, B=B)
    images = np.round(images)
    if want is None:
        with torch.no_grad():
            want = tm(_torch_inputs(images, boxes))[out_key].numpy()
    cfg = _our_cfg(rcfg, inference_module_name=model_name)
    model = build_model(cfg)
    ij, bj = _jax_inputs(images, boxes)
    variables = model.init(jax.random.PRNGKey(0), ij, bj, train=False)
    variables, skipped = load_reference_checkpoint(variables, path, cfg)
    assert skipped == sorted(allow_skipped), skipped
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    np.testing.assert_allclose(np.asarray(out[out_key]), want,
                               rtol=2e-3, atol=2e-3)


def test_at_import(ref_models, rng, tmp_path):
    rcfg = _ref_cfg(num_frames=3, lite_dim=None,
                    temporal_pooled_first=False)
    torch.manual_seed(0)
    tm = ref_models.infer_model.AT_volleyball(rcfg)
    tm.eval()
    # AT_volleyball builds fc_actions but returns activities only
    # (infer_model.py:838-867) — dead head, omitted from our model
    _roundtrip(rng, tmp_path, rcfg, "at_volleyball", tm,
               allow_skipped=["(unapplied) params/fc_actions"])


def test_arg_import(ref_models, rng, tmp_path):
    rcfg = _ref_cfg(num_frames=3, lite_dim=None, num_graph=4, gcn_layers=1,
                    pos_threshold=0.2, dataset_name="volleyball")
    torch.manual_seed(0)
    tm = ref_models.infer_model.ARG_volleyball(rcfg)
    tm.eval()
    _roundtrip(rng, tmp_path, rcfg, "arg_volleyball", tm,
               input_cfg=_ref_cfg(num_frames=9))


def test_higcin_import(ref_models, rng, tmp_path):
    rcfg = _ref_cfg(backbone="res18", num_frames=3, lite_dim=None)
    torch.manual_seed(0)
    tm = ref_models.infer_model.HiGCIN_volleyball(rcfg)
    _randomize_bn_stats(tm, seed=4)
    tm.eval()
    _roundtrip(rng, tmp_path, rcfg, "higcin_volleyball", tm)


def test_sacrf_biute_import(ref_models, rng, tmp_path):
    rcfg = _ref_cfg(num_frames=3, lite_dim=None, num_features_boxes=32)
    torch.manual_seed(0)
    tm = ref_models.infer_model.SACRF_BiUTE_volleyball(rcfg)
    tm.eval()
    _roundtrip(rng, tmp_path, rcfg, "sacrf_biute_volleyball", tm)


def test_pctdm_import(ref_models, rng, tmp_path):
    rcfg = _ref_cfg(num_frames=2, lite_dim=None, num_features_boxes=1024)
    torch.manual_seed(0)
    tm = ref_models.infer_model.PCTDM_volleyball(rcfg)
    tm.eval()
    # PCTDM_volleyball also carries a never-returned fc_actions
    # (infer_model.py:472-608) — dead head, omitted from our model
    _roundtrip(rng, tmp_path, rcfg, "pctdm_volleyball", tm, B=1,
               allow_skipped=["(unapplied) params/fc_actions"])


def test_optimizer_state_resume(ref_models, rng, tmp_path):
    """Exact mid-training migration: torch runs 3 Adam steps and saves a
    full checkpoint (incl. optimizer.state_dict(), train_net.py:121-125);
    our engine adopts weights AND Adam moments/step, then both continue on
    identical batches — the continuation loss trajectories must match.
    """
    import jax.numpy as jnp
    import torch.nn.functional as F

    from din_tpu.nn.ref_import import load_reference_optimizer
    from din_tpu.train.engine import TrainState, make_train_step
    from din_tpu.train.optim import make_optimizer

    lr, B = 1e-3, 2
    rcfg = _ref_cfg(backbone="res18", train_dropout_prob=0.0,
                    ST_kernel_size=[(3, 3)], num_DIM=1, lite_dim=32)
    torch.manual_seed(0)
    tm = ref_models.infer_model.Dynamic_volleyball(rcfg)
    _randomize_bn_stats(tm.backbone, seed=2)
    _randomize_din(tm.DPI, seed=1)

    batches = []
    for _ in range(5):
        images, boxes = _make_inputs(rng, rcfg, B=B)
        images = np.round(images)
        labels = rng.randint(0, rcfg.num_activities,
                             (B, rcfg.num_frames)).astype(np.int64)
        batches.append((images, boxes, labels))

    tm.train()
    opt = torch.optim.Adam([p for p in tm.parameters() if p.requires_grad],
                           lr=lr)

    def torch_step(images, boxes, labels):
        ti, tb = _torch_inputs(images, boxes)
        loss = F.cross_entropy(tm((ti, tb))["activities"],
                               torch.from_numpy(labels[:, 0]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss.detach())

    for images, boxes, labels in batches[:3]:       # warm up 3 torch steps
        torch_step(images, boxes, labels)
    path = str(tmp_path / "mid_training.pth")
    torch.save({"epoch": 3, "state_dict": tm.state_dict(),
                "optimizer": opt.state_dict()}, path)
    ref_losses = [torch_step(*b) for b in batches[3:]]  # torch continuation

    cfg = _our_cfg(rcfg, train_dropout_prob=0.0, train_learning_rate=lr,
                   lr_plan={}, weight_decay=0.0, set_bn_eval=False)
    model = build_model(cfg)
    ij0, bj0 = _jax_inputs(batches[0][0], batches[0][1])
    variables = model.init(jax.random.PRNGKey(0), ij0, bj0, train=False)
    variables, _ = load_reference_checkpoint(variables, path, cfg)
    tx = make_optimizer(cfg, variables["params"])
    opt_state, epoch = load_reference_optimizer(
        tx.init(variables["params"]), path, cfg)
    assert epoch == 3
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=opt_state, rng=jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, tx, frame0_labels=True, has_bn=True,
                           donate=False)
    got_losses = []
    with jax.default_matmul_precision("highest"):
        for images, boxes, labels in batches[3:]:
            ij, bj = _jax_inputs(images, boxes)
            batch = {"images": ij, "boxes": bj,
                     "activities": jnp.asarray(labels.astype(np.int32)),
                     "actions": jnp.zeros(
                         (B, rcfg.num_frames, rcfg.num_boxes), jnp.int32)}
            state, metrics = step(state, batch)
            got_losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(got_losses, ref_losses, rtol=5e-3, atol=5e-3)


def test_dynamic_collective_import(ref_models, rng, tmp_path):
    """Dynamic_collective writes a PLAIN ``DPI.*`` layout (a bare
    Dynamic_Person_Inference, infer_model.py:1174-1185) — the importer must
    nest it under our single-kernel DIM_0 (heads/din.py:229-259)."""
    import jax.numpy as jnp
    from test_full_model_oracle import _Unpack0

    rcfg = _ref_cfg(backbone="res18", num_boxes=13, num_frames=4,
                    num_activities=4, num_actions=5, lite_dim=None,
                    ST_kernel_size=(3, 3), num_DIM=1, beta_factor=False)
    torch.manual_seed(0)
    tm = ref_models.infer_model.Dynamic_collective(rcfg)
    _randomize_bn_stats(tm.backbone, seed=2)
    _randomize_din(tm.DPI, seed=3)
    # checkpoint written with the reference's own module tree (DPI.* keys),
    # BEFORE the _Unpack0 forward-bug shim rewrites key prefixes
    path = str(tmp_path / "collective_stage2.pth")
    torch.save({"epoch": 1, "state_dict": tm.state_dict(),
                "optimizer": {}}, path)
    tm.DPI = _Unpack0(tm.DPI)
    tm.eval()

    B = 2
    images, boxes = _make_inputs(rng, rcfg, B=B)
    images = np.round(images)
    counts = np.repeat(rng.randint(5, rcfg.num_boxes + 1, (B, 1)),
                       rcfg.num_frames, axis=1).astype(np.int64)
    n_idx = np.arange(rcfg.num_boxes)[None, None]
    boxes = np.where((n_idx < counts[:, :, None])[..., None], boxes, 0.0)
    ti, tb = _torch_inputs(images, boxes)
    with torch.no_grad():
        want = tm((ti, tb, torch.from_numpy(counts)))["activities"].numpy()

    cfg = _our_cfg(rcfg, dataset_name="collective",
                   inference_module_name="dynamic_collective", lite_dim=None)
    model = build_model(cfg)
    ij, bj = _jax_inputs(images, boxes)
    cj = jnp.asarray(counts.astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), ij, bj, bboxes_num=cj,
                           train=False)
    variables, skipped = load_reference_checkpoint(variables, path, cfg)
    assert skipped == [], skipped
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, bboxes_num=cj, train=False)
    np.testing.assert_allclose(np.asarray(out["activities"]), want,
                               rtol=2e-3, atol=2e-3)


def test_dynamic_tce_import(ref_models, rng, tmp_path):
    rcfg = _ref_cfg(lite_dim=None, ST_kernel_size=[(3, 3)], num_DIM=1)
    torch.manual_seed(0)
    tm = ref_models.infer_model.Dynamic_TCE_volleyball(rcfg)
    _randomize_din(tm.DPI, seed=5)
    tm.eval()
    _roundtrip(rng, tmp_path, rcfg, "dynamic_tce_volleyball", tm, B=1)
