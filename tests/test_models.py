"""End-to-end model forward tests for every registry entry, plus the masked
collective-batching equivalence at the full-model level."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from din_tpu.config import Config
from din_tpu.models.registry import STAGE2_MODELS, build_model

T, H, W, N = 4, 64, 96, 12
OUT = (2, 3)


def _cfg(**kw):
    base = dict(
        backbone="res18", image_size=(H, W), out_size=OUT, emb_features=512,
        crop_size=(5, 5), num_frames=T, num_boxes=N, train_backbone=True,
        num_features_boxes=64, num_features_gcn=64, num_features_relation=32,
        num_graph=4, lite_dim=None, ST_kernel_size=((3, 3),),
        sampling_ratio=(1,), dynamic_sampling=True, scale_factor=True,
        beta_factor=False, hierarchical_inference=False, num_DIM=1,
        compute_dtype="float32", roi_align_impl="onehot",
    )
    base.update(kw)
    ds = base.pop("dataset_name", "volleyball")
    return Config(dataset_name=ds).replace(**base)


def _batch(rng, cfg, B=2, t=T):
    images = rng.randint(0, 255, (B, t, H, W, 3)).astype(np.uint8)
    n = cfg.num_boxes
    x1 = rng.uniform(0, OUT[1] - 1, (B, t, n))
    y1 = rng.uniform(0, OUT[0] - 1, (B, t, n))
    boxes = np.stack([x1, y1, x1 + 1.0, y1 + 1.0], -1).astype(np.float32)
    return jnp.asarray(images), jnp.asarray(boxes)


def _init_and_run(model, images, boxes, bboxes_num=None, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, images, boxes, bboxes_num=bboxes_num,
                           train=train)
    mutable = ["batch_stats"] if ("batch_stats" in variables and train) else []
    rngs_apply = {"dropout": jax.random.PRNGKey(2)} if train else {}
    if mutable:
        out, _ = model.apply(variables, images, boxes, bboxes_num=bboxes_num,
                             train=train, rngs=rngs_apply, mutable=mutable)
    else:
        out = model.apply(variables, images, boxes, bboxes_num=bboxes_num,
                          train=train, rngs=rngs_apply)
    return out, variables


def test_basenet_volleyball(rng):
    cfg = _cfg(training_stage=1)
    model = build_model(cfg)
    images, boxes = _batch(rng, cfg)
    out, _ = _init_and_run(model, images, boxes, train=True)
    assert out["actions"].shape == (2 * N, cfg.num_actions)
    assert out["activities"].shape == (2, cfg.num_activities)


def test_basenet_collective(rng):
    cfg = _cfg(dataset_name="collective", training_stage=1, num_boxes=13,
               num_actions=5, num_activities=4)
    model = build_model(cfg)
    images, boxes = _batch(rng, cfg)
    counts = jnp.asarray(rng.randint(3, 13, (2, T)), jnp.int32)
    out, _ = _init_and_run(model, images, boxes, bboxes_num=counts,
                           train=True)
    assert out["actions"].shape == (2 * T * 13, 5)
    assert out["activities"].shape == (2 * T, 4)
    assert out["actions_mask"].shape == (2 * T * 13,)


@pytest.mark.parametrize("name", [
    "dynamic_volleyball", "dynamic_tce_volleyball", "pctdm_volleyball",
    "higcin_volleyball", "at_volleyball", "arg_volleyball",
    "sacrf_biute_volleyball", "gcnnet_volleyball",
])
def test_stage2_volleyball_models(rng, name):
    kw = dict(training_stage=2, inference_module_name=name)
    if name == "higcin_volleyball":
        kw["crop_size"] = (5, 5)
    if name == "dynamic_volleyball":
        kw["lite_dim"] = 32
    cfg = _cfg(**kw)
    model = build_model(cfg)
    images, boxes = _batch(rng, cfg)
    out, _ = _init_and_run(model, images, boxes, train=True)
    assert out["activities"].shape == (2, cfg.num_activities)
    assert bool(jnp.isfinite(out["activities"]).all())
    if name in ("sacrf_biute_volleyball", "gcnnet_volleyball"):
        assert out["actions"].shape == (2 * N, cfg.num_actions)
    if name == "sacrf_biute_volleyball":
        assert np.isfinite(float(out["halting"]))


@pytest.mark.parametrize("name", ["dynamic_collective", "gcnnet_collective"])
def test_stage2_collective_models(rng, name):
    cfg = _cfg(dataset_name="collective", training_stage=2, num_boxes=13,
               num_actions=5, num_activities=4, inference_module_name=name)
    model = build_model(cfg)
    images, boxes = _batch(rng, cfg)
    counts = jnp.asarray(np.full((2, T), 9), jnp.int32)
    out, _ = _init_and_run(model, images, boxes, bboxes_num=counts,
                           train=True)
    assert out["activities"].shape == (2, 4)
    assert bool(jnp.isfinite(out["activities"]).all())


def test_arg_three_crop_eval(rng):
    """Eval on 9 frames triggers the reference's 3-crop averaging
    (infer_model.py:939-943)."""
    cfg = _cfg(training_stage=2, inference_module_name="arg_volleyball",
               num_frames=3)
    model = build_model(cfg)
    images, boxes = _batch(rng, cfg, B=1, t=9)
    out, _ = _init_and_run(model, images, boxes, train=False)
    assert out["activities"].shape == (1, cfg.num_activities)


def test_dynamic_collective_masked_equals_sliced(rng):
    """The masked MAX_N batch must reproduce the reference's exact-N
    slicing (infer_model.py:1286-1314) at the full-model level."""
    cfg13 = _cfg(dataset_name="collective", training_stage=2, num_boxes=13,
                 num_actions=5, num_activities=4,
                 inference_module_name="dynamic_collective")
    n_real = 9
    cfg9 = cfg13.replace(num_boxes=n_real)

    images, boxes13 = _batch(rng, cfg13, B=1)
    boxes13 = np.array(boxes13)
    boxes13[:, :, n_real:] = 0.0                   # padded boxes are zeros
    boxes9 = boxes13[:, :, :n_real]

    m13 = build_model(cfg13)
    m9 = build_model(cfg9)
    counts13 = jnp.full((1, T), n_real, jnp.int32)
    counts9 = jnp.full((1, T), n_real, jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0)}
    v13 = m13.init(rngs, images, jnp.asarray(boxes13), bboxes_num=counts13,
                   train=False)
    out13 = m13.apply(v13, images, jnp.asarray(boxes13), bboxes_num=counts13,
                      train=False)
    # same params work for the sliced model (shapes are N-agnostic)
    out9 = m9.apply(v13, images, jnp.asarray(boxes9), bboxes_num=counts9,
                    train=False)
    np.testing.assert_allclose(np.asarray(out13["activities"]),
                               np.asarray(out9["activities"]),
                               rtol=2e-3, atol=2e-4)


def test_gcnnet_collective_three_crop_eval(rng):
    """Legacy collective 3-crop eval averaging (gcn_model.py:322-327)."""
    cfg = _cfg(dataset_name="collective", training_stage=2, num_boxes=13,
               num_actions=5, num_activities=4, num_frames=3,
               inference_module_name="gcnnet_collective")
    model = build_model(cfg)
    images, boxes = _batch(rng, cfg, B=1, t=9)
    counts = jnp.full((1, 9), 9, jnp.int32)
    out, _ = _init_and_run(model, images, boxes, bboxes_num=counts,
                           train=False)
    assert out["activities"].shape == (1, 4)
    assert out["actions"].shape == (13, 5)
    assert out["actions_mask"].shape == (13,)
