"""BatchNorm semantics: torch parity + live cross-chunk stats in the trunk.

The reference finetunes BN backbones with live batch statistics
(train_net.py:18-21 — models stay in .train() unless set_bn_eval;
base_model.py:89), under nn.DataParallel, where each replica's BN sees only
its sub-batch.  The trunk's frame-chunk scan reproduces exactly that: each
chunk normalises with its own batch stats and the running stats thread
through the scan carry (din_tpu/models/trunk.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from din_tpu.nn.backbones import ResNet18Backbone
from din_tpu.nn.layers import TorchBatchNorm
from din_tpu.models.trunk import Trunk
from din_tpu.ops.image import prep_images


def test_torch_batchnorm_oracle(rng):
    """Train-mode forward, running-stat update (unbiased var), eval forward
    — all bit-matched to torch BatchNorm2d."""
    torch = pytest.importorskip("torch")
    B, H, W, C = 3, 5, 7, 4
    x = rng.randn(B, H, W, C).astype(np.float32) * 2.0 + 0.5

    tm = torch.nn.BatchNorm2d(C, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tm.weight.copy_(torch.from_numpy(rng.randn(C).astype(np.float32)))
        tm.bias.copy_(torch.from_numpy(rng.randn(C).astype(np.float32)))
    tm.train()
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        want_train = tm(xt).numpy().transpose(0, 2, 3, 1)
    want_mean = tm.running_mean.numpy().copy()
    want_var = tm.running_var.numpy().copy()
    tm.eval()
    with torch.no_grad():
        want_eval = tm(xt).numpy().transpose(0, 2, 3, 1)

    mod = TorchBatchNorm(use_running_average=False)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    v = {"params": {"scale": jnp.asarray(tm.weight.detach().numpy()),
                    "bias": jnp.asarray(tm.bias.detach().numpy())},
         "batch_stats": v["batch_stats"]}
    out, upd = mod.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), want_train, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["mean"]),
                               want_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["var"]),
                               want_var, rtol=1e-5, atol=1e-6)

    eval_mod = TorchBatchNorm(use_running_average=True)
    out_eval = eval_mod.apply({"params": v["params"],
                               "batch_stats": upd["batch_stats"]},
                              jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_eval), want_eval, rtol=1e-5,
                               atol=1e-5)


def _small_trunk(frame_chunk):
    return Trunk(backbone="res18", out_size=(2, 3), crop_size=(2, 2),
                 train_backbone=True, compute_dtype=jnp.float32,
                 frame_chunk=frame_chunk)


def _small_batch(rng, B=2, T=2, N=3, H=64, W=96):
    images = rng.randint(0, 255, (B, T, H, W, 3)).astype(np.uint8)
    x1 = rng.uniform(0, 1.0, (B, T, N))
    y1 = rng.uniform(0, 0.5, (B, T, N))
    boxes = np.stack([x1, y1, x1 + 1.5, y1 + 1.2], -1).astype(np.float32)
    return jnp.asarray(images), jnp.asarray(boxes)


def test_trunk_chunked_bn_stats_live(rng):
    """2-chunk scan == applying the backbone chunk-by-chunk, threading the
    running stats forward (live BN under chunking)."""
    images, boxes = _small_batch(rng)
    trunk = Trunk(backbone="res18", out_size=(2, 3), crop_size=(2, 2),
                  train_backbone=True, compute_dtype=jnp.float32,
                  frame_chunk=2)
    v = trunk.init(jax.random.PRNGKey(0), images, boxes, bn_train=False)
    (roi, multiscale, outputs), upd = trunk.apply(
        v, images, boxes, bn_train=True, mutable=["batch_stats"])
    got_stats = upd["batch_stats"]["frames_scan"]["backbone"]

    # sequential reference: backbone applied per 2-frame chunk, stats
    # threaded through
    bb = ResNet18Backbone(dtype=jnp.float32)
    bb_params = v["params"]["frames_scan"]["backbone"]
    bb_stats = v["batch_stats"]["frames_scan"]["backbone"]
    B, T, H, W, _ = images.shape
    frames = images.reshape(B * T, H, W, 3)
    outs = []
    for c in range(0, B * T, 2):
        xin = prep_images(frames[c:c + 2].reshape(2, H, W * 3)
                          .reshape(2, H, W, 3), dtype=jnp.float32)
        (o,), upd2 = bb.apply({"params": bb_params, "batch_stats": bb_stats},
                              xin, True, mutable=["batch_stats"])
        bb_stats = upd2["batch_stats"]
        outs.append(o)
    want_out = jnp.concatenate(outs, axis=0)

    np.testing.assert_allclose(np.asarray(outputs[0]), np.asarray(want_out),
                               rtol=1e-3, atol=1e-4)
    flat_got = jax.tree_util.tree_leaves(got_stats)
    flat_want = jax.tree_util.tree_leaves(bb_stats)
    assert len(flat_got) == len(flat_want) > 0
    for g, w in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-4,
                                   atol=1e-5)
    # stats actually moved (live, not frozen)
    init_leaves = jax.tree_util.tree_leaves(
        v["batch_stats"]["frames_scan"]["backbone"])
    moved = sum(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(flat_got, init_leaves))
    assert moved > 1e-3


def test_trunk_single_chunk_matches_unchunked(rng):
    """num_chunks=1 (scan skipped) vs frame_chunk=None: identical outputs
    and stats updates."""
    images, boxes = _small_batch(rng)
    t_un = _small_trunk(frame_chunk=None)
    v = t_un.init(jax.random.PRNGKey(0), images, boxes, bn_train=False)
    out_un, upd_un = t_un.apply(v, images, boxes, bn_train=True,
                                mutable=["batch_stats"])
    t_4 = _small_trunk(frame_chunk=4)   # B*T=4 -> one chunk
    out_c, upd_c = t_4.apply(v, images, boxes, bn_train=True,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_un[0]), np.asarray(out_c[0]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(upd_un["batch_stats"]),
                    jax.tree_util.tree_leaves(upd_c["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_trunk_chunked_bn_grads_flow(rng):
    """Backward through the rematted live-BN scan compiles and yields finite
    grads (remat + mutable batch_stats + scan carry)."""
    images, boxes = _small_batch(rng)
    trunk = Trunk(backbone="res18", out_size=(2, 3), crop_size=(2, 2),
                  train_backbone=True, compute_dtype=jnp.float32,
                  frame_chunk=2)
    v = trunk.init(jax.random.PRNGKey(0), images, boxes, bn_train=False)

    def loss(params):
        (roi, _, _), upd = trunk.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            images, boxes, bn_train=True, mutable=["batch_stats"])
        return jnp.sum(roi.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def test_fused_relu_matches_relu_and_grad(rng):
    from din_tpu.nn.layers import fused_relu
    x = jnp.asarray(rng.randn(64).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(fused_relu(x)),
                                  np.asarray(jnp.maximum(x, 0)))
    g1 = jax.grad(lambda x: jnp.sum(fused_relu(x) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.maximum(x, 0) ** 2))(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
