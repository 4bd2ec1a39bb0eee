"""Every preset must construct a valid Config whose model traces at the
full reference geometry (eval_shape = abstract init, no FLOPs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from din_tpu.experiments.presets import PRESETS
from din_tpu.models.registry import build_model
from din_tpu.parallel.multihost import shard_indices_for_process


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_traces(name):
    cfg = PRESETS[name]()
    model = build_model(cfg)
    H, W = cfg.image_size
    T = cfg.num_frames if cfg.training_stage == 2 else 1
    B = 1
    N = cfg.num_boxes
    images = jax.ShapeDtypeStruct((B, T, H, W, 3), jnp.uint8)
    boxes = jax.ShapeDtypeStruct((B, T, N, 4), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    if cfg.dataset_name == "collective":
        counts = jax.ShapeDtypeStruct((B, T), jnp.int32)
        shapes = jax.eval_shape(
            lambda r, i, b, c: model.init(r, i, b, bboxes_num=c,
                                          train=False),
            rngs, images, boxes, counts)
    else:
        shapes = jax.eval_shape(
            lambda r, i, b: model.init(r, i, b, train=False),
            rngs, images, boxes)
    assert "params" in shapes

    # the trunk consumes the configured emb_features channel count
    leaves = jax.tree_util.tree_leaves_with_path(shapes["params"])
    fc_emb = [l for p, l in leaves
              if any(getattr(k, "key", "") == "fc_emb_1" for k in p)
              and l.ndim == 2]
    if fc_emb:
        K = cfg.crop_size[0] * cfg.crop_size[1]
        assert fc_emb[0].shape[0] == K * cfg.emb_features


def test_shard_indices():
    assert shard_indices_for_process(10, 0, 4) == [0, 4, 8]
    assert shard_indices_for_process(10, 3, 4) == [3, 7]
    all_idx = sorted(sum((shard_indices_for_process(10, p, 4)
                          for p in range(4)), []))
    assert all_idx == list(range(10))
