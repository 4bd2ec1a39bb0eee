"""Checkpoint EXPORT: din_tpu variables -> reference-framework .pth files
(din_tpu/nn/ref_export.py), the inverse of the ref_import migration path.

Pins two things:
  * torch round-trips — a real reference model ``load_state_dict``s the
    exported file with no missing/unexpected keys and reproduces our
    logits end-to-end (full-model format AND the stage-1 component
    format);
  * converter bijectivity — for every head family, export followed by
    ref_import.convert_model_state reconstructs the exact variable tree,
    so no parameter is silently dropped in either direction.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_full_model_oracle import (_jax_inputs, _make_inputs,  # noqa: E402
                                    _our_cfg, _ref_cfg, _torch_inputs,
                                    ref_models)

from din_tpu.models.registry import build_model  # noqa: E402
from din_tpu.nn.ref_export import (export_model_state,  # noqa: E402
                                   save_reference_checkpoint)
from din_tpu.nn.ref_import import convert_model_state  # noqa: E402
from din_tpu.nn.torch_port import graft_variables  # noqa: E402


def _randomize_variables(variables, seed=0, scale=0.05):
    """Replace every leaf with small random values so no head path is
    degenerate (DIN offset convs are zero-init by parity); BN variances
    stay positive."""
    rng = np.random.default_rng(seed)

    def leafmap(path, x):
        name = str(getattr(path[-1], "key", path[-1]))
        v = rng.normal(0.0, scale, x.shape).astype(np.float32)
        if name == "var":
            v = np.abs(v) + 0.5
        return jnp.asarray(v, x.dtype)

    return jax.tree_util.tree_map_with_path(leafmap, variables)


def _tensors(flat):
    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in flat.items()}


def test_full_model_export_to_reference(ref_models, rng, tmp_path):
    """Flagship Dynamic_volleyball: export full-model format, strict-load
    into the reference torch model, logits must match ours."""
    rcfg = _ref_cfg()
    cfg = _our_cfg(rcfg)
    model = build_model(cfg)
    images, boxes = _make_inputs(rng, rcfg)
    images = np.round(images)
    ij, bj = _jax_inputs(images, boxes)
    variables = model.init(jax.random.PRNGKey(0), ij, bj, train=False)
    variables = _randomize_variables(variables, seed=1)

    path = str(tmp_path / "export_stage2.pth")
    save_reference_checkpoint(variables, cfg, path, fmt="full", epoch=9)

    state = torch.load(path, map_location="cpu", weights_only=False)
    assert state["epoch"] == 9
    torch.manual_seed(0)
    tm = ref_models.infer_model.Dynamic_volleyball(rcfg)
    result = tm.load_state_dict(state["state_dict"], strict=False)
    assert result.unexpected_keys == []
    assert result.missing_keys == []
    tm.eval()

    with torch.no_grad():
        want = tm(_torch_inputs(images, boxes))["activities"].numpy()
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    np.testing.assert_allclose(np.asarray(out["activities"]), want,
                               rtol=2e-3, atol=2e-3)


def test_stage1_component_export(ref_models, rng, tmp_path):
    """Stage-1 Basenet: export the savemodel component layout
    (base_model.py:46-54); each component strict-loads into the torch
    Basenet and logits match."""
    rcfg = _ref_cfg(num_frames=3, num_features_boxes=32, lite_dim=None)
    cfg = _our_cfg(rcfg, training_stage=1, lite_dim=None)
    model = build_model(cfg)
    images, boxes = _make_inputs(rng, rcfg)
    images = np.round(images)
    ij, bj = _jax_inputs(images, boxes)
    variables = model.init(jax.random.PRNGKey(0), ij, bj, train=False)
    variables = _randomize_variables(variables, seed=2)

    path = str(tmp_path / "export_stage1.pth")
    save_reference_checkpoint(variables, cfg, path, fmt="stage1")

    sd = torch.load(path, map_location="cpu", weights_only=False)
    torch.manual_seed(0)
    tm = ref_models.base_model.Basenet_volleyball(rcfg)
    tm.backbone.load_state_dict(sd["backbone_state_dict"], strict=True)
    tm.fc_emb.load_state_dict(sd["fc_emb_state_dict"], strict=True)
    tm.fc_actions.load_state_dict(sd["fc_actions_state_dict"], strict=True)
    tm.fc_activities.load_state_dict(sd["fc_activities_state_dict"],
                                     strict=True)
    tm.eval()

    with torch.no_grad():
        want_actions, want_acts = tm(_torch_inputs(images, boxes))
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    np.testing.assert_allclose(np.asarray(out["actions"]),
                               want_actions.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["activities"]),
                               want_acts.numpy(), rtol=2e-3, atol=2e-3)


def test_export_cli_roundtrip(tmp_path):
    """python -m din_tpu.experiments.export_ref: our .ckpt -> reference
    .pth, format inferred from the checkpoint layout."""
    from din_tpu.experiments.export_ref import main
    from din_tpu.experiments.presets import PRESETS
    from din_tpu.train.checkpoint import save_checkpoint

    cfg = PRESETS["synthetic_smoke"]()
    model = build_model(cfg)
    H, W = cfg.image_size
    ij = jnp.zeros((1, cfg.num_frames, H, W, 3), jnp.uint8)
    bj = jnp.tile(jnp.asarray([0.0, 0.0, 1.5, 1.5]),
                  (1, cfg.num_frames, cfg.num_boxes, 1))
    variables = model.init(jax.random.PRNGKey(0), ij, bj, train=False)

    ckpt = str(tmp_path / "stage2_epoch2.ckpt")
    save_checkpoint(ckpt, {"params": variables["params"],
                           "batch_stats": variables["batch_stats"],
                           "epoch": 2})
    out = str(tmp_path / "for_reference.pth")
    main(["--preset", "synthetic_smoke", "--ckpt", ckpt, "--out", out,
          "--epoch", "2"])

    state = torch.load(out, map_location="cpu", weights_only=False)
    assert state["epoch"] == 2
    keys = state["state_dict"]
    assert "backbone.features.0.weight" in keys          # res18 Sequential
    assert "DPI.DIMlist.0.hidden_weight.weight" in keys  # Multi-DIN layout
    assert "fc_activities.weight" in keys
    assert keys["backbone.features.0.weight"].shape[1] == 3  # OIHW


# ---- converter bijectivity per head family ---------------------------------

_FAMILIES = [
    ("dynamic_volleyball", {}),
    ("dynamic_collective", dict(dataset_name="collective", backbone="res18",
                                num_boxes=13, num_frames=4, num_activities=4,
                                num_actions=5, lite_dim=None,
                                ST_kernel_size=[(3, 3)], num_DIM=1,
                                beta_factor=False)),
    ("at_volleyball", dict(num_frames=3, lite_dim=None)),
    ("arg_volleyball", dict(num_frames=3, lite_dim=None, num_graph=4,
                            gcn_layers=1, pos_threshold=0.2)),
    ("higcin_volleyball", dict(backbone="res18", num_frames=3,
                               lite_dim=None)),
    ("sacrf_biute_volleyball", dict(num_frames=3, lite_dim=None,
                                    num_features_boxes=32)),
    ("pctdm_volleyball", dict(num_frames=2, lite_dim=None,
                              num_features_boxes=64)),
    ("dynamic_tce_volleyball", dict(lite_dim=None, num_frames=2,
                                    ST_kernel_size=[(3, 3)], num_DIM=1)),
    ("hierarchical", dict(hierarchical_inference=True, num_frames=3,
                          ST_kernel_size=[(1, 3), (3, 1)])),
]


@pytest.mark.parametrize("name,overrides",
                         [pytest.param(n, o, id=n) for n, o in _FAMILIES])
def test_export_import_bijective(rng, name, overrides):
    """export_model_state o convert_model_state == identity on the whole
    variable tree: nothing silently dropped in either direction."""
    overrides = dict(overrides)
    ds = overrides.pop("dataset_name", "volleyball")
    model_name = ("dynamic_volleyball" if name == "hierarchical" else name)
    rcfg = _ref_cfg(**overrides)
    cfg = _our_cfg(rcfg, dataset_name=ds, inference_module_name=model_name)
    model = build_model(cfg)
    images, boxes = _make_inputs(rng, rcfg, B=1)
    ij, bj = _jax_inputs(images, boxes)
    kw = {}
    if ds == "collective":
        kw["bboxes_num"] = jnp.full((1, rcfg.num_frames), rcfg.num_boxes,
                                    jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ij, bj, train=False, **kw)
    variables = _randomize_variables(variables, seed=3)

    flat = export_model_state(variables, cfg)
    converted, skipped = convert_model_state(flat, cfg)
    assert skipped == [], skipped

    zeroed = jax.tree.map(jnp.zeros_like, variables)
    grafted = graft_variables(zeroed, converted)
    flat_want = jax.tree_util.tree_flatten_with_path(variables)
    flat_got = dict(jax.tree_util.tree_flatten_with_path(grafted)[0])
    mismatched = [
        jax.tree_util.keystr(path) for path, leaf in flat_want[0]
        if not np.allclose(np.asarray(flat_got[path]), np.asarray(leaf),
                           rtol=1e-6, atol=1e-6)]
    assert mismatched == [], mismatched
