"""RoIAlign vs a numpy crop_and_resize oracle.

The oracle independently implements TF crop_and_resize semantics with the
transform_fpcoor box transform used by the reference's CUDA extension
(see din_tpu/ops/roi_align.py docstring; reference import base_model.py:3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from din_tpu.ops.roi_align import roi_align, roi_align_pallas


def oracle_crop_and_resize(features, boxes, crop_size):
    """features [B,H,W,C] float64, boxes [B,N,4] x1y1x2y2 feature pixels."""
    B, H, W, C = features.shape
    N = boxes.shape[1]
    KH, KW = crop_size
    out = np.zeros((B, N, KH, KW, C), dtype=np.float64)
    for b in range(B):
        for n in range(N):
            x1, y1, x2, y2 = boxes[b, n]
            bin_h = (y2 - y1) / KH
            bin_w = (x2 - x1) / KW
            for i in range(KH):
                in_y = y1 + (i + 0.5) * bin_h - 0.5
                for j in range(KW):
                    in_x = x1 + (j + 0.5) * bin_w - 0.5
                    if in_y < 0 or in_y > H - 1 or in_x < 0 or in_x > W - 1:
                        continue  # extrapolation value 0
                    ty, by = int(np.floor(in_y)), int(np.ceil(in_y))
                    lx, rx = int(np.floor(in_x)), int(np.ceil(in_x))
                    yl = in_y - ty
                    xl = in_x - lx
                    top = features[b, ty, lx] * (1 - xl) + features[b, ty, rx] * xl
                    bot = features[b, by, lx] * (1 - xl) + features[b, by, rx] * xl
                    out[b, n, i, j] = top * (1 - yl) + bot * yl
    return out


def _random_case(rng, B=2, H=9, W=13, C=7, N=5, K=(5, 5)):
    feats = rng.randn(B, H, W, C).astype(np.float32)
    x1 = rng.uniform(-2, W - 2, (B, N))
    y1 = rng.uniform(-2, H - 2, (B, N))
    x2 = x1 + rng.uniform(0.5, 6, (B, N))
    y2 = y1 + rng.uniform(0.5, 6, (B, N))
    boxes = np.stack([x1, y1, x2, y2], axis=-1).astype(np.float32)
    return feats, boxes


@pytest.mark.parametrize("impl", ["onehot", "gather", "pallas_interpret"])
def test_matches_oracle(rng, impl):
    feats, boxes = _random_case(rng)
    ref = oracle_crop_and_resize(feats.astype(np.float64),
                                 boxes.astype(np.float64), (5, 5))
    got = roi_align(jnp.asarray(feats), jnp.asarray(boxes), (5, 5), impl=impl)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_k7(rng):
    feats, boxes = _random_case(rng, K=(7, 7))
    ref = oracle_crop_and_resize(feats.astype(np.float64),
                                 boxes.astype(np.float64), (7, 7))
    got = roi_align(jnp.asarray(feats), jnp.asarray(boxes), (7, 7), impl="onehot")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_impls_agree(rng):
    feats, boxes = _random_case(rng, B=3, H=12, W=20, C=16, N=12)
    a = roi_align(jnp.asarray(feats), jnp.asarray(boxes), (5, 5), impl="onehot")
    b = roi_align(jnp.asarray(feats), jnp.asarray(boxes), (5, 5), impl="gather")
    c = roi_align(jnp.asarray(feats), jnp.asarray(boxes), (5, 5),
                  impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-5)


def test_gradients_match(rng):
    """onehot autodiff grad == gather autodiff grad == finite-difference."""
    feats, boxes = _random_case(rng, B=1, H=6, W=8, C=3, N=2)
    feats_j = jnp.asarray(feats)
    boxes_j = jnp.asarray(boxes)
    g_out = rng.randn(1, 2, 5, 5, 3).astype(np.float32)

    def loss(f, impl):
        out = roi_align(f, boxes_j, (5, 5), impl=impl)
        return jnp.sum(out * g_out)

    g_a = jax.grad(lambda f: loss(f, "onehot"))(feats_j)
    g_b = jax.grad(lambda f: loss(f, "gather"))(feats_j)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               rtol=1e-4, atol=1e-4)

    # finite difference spot-check
    eps = 1e-2
    idx = (0, 3, 4, 1)
    fp = feats.copy(); fp[idx] += eps
    fm = feats.copy(); fm[idx] -= eps
    fd = (loss(jnp.asarray(fp), "onehot") - loss(jnp.asarray(fm), "onehot")) / (2 * eps)
    np.testing.assert_allclose(float(g_a[idx]), float(fd), rtol=1e-2, atol=1e-2)


def test_pallas_custom_vjp_matches_onehot(rng):
    """The Pallas op's custom backward equals the XLA autodiff backward.

    (Runs the *backward* only — forward pallas needs interpret mode on CPU,
    so compare _pallas_bwd's math through roi_align's onehot grad.)
    """
    from din_tpu.ops.roi_align import _pallas_bwd
    feats, boxes = _random_case(rng, B=2, H=6, W=8, C=3, N=4)
    g = rng.randn(2, 4, 5, 5, 3).astype(np.float32)

    def loss(f):
        return jnp.sum(roi_align(f, jnp.asarray(boxes), (5, 5), impl="onehot")
                       * g)

    g_ref = jax.grad(loss)(jnp.asarray(feats))
    fmeta = (feats.shape[1], feats.shape[2], "float32")
    df, dbox = _pallas_bwd((5, 5), fmeta, jnp.asarray(boxes), jnp.asarray(g))
    assert dbox is None
    np.testing.assert_allclose(np.asarray(df), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_reference_box_layout(rng):
    """Boxes grouped per frame reproduce the reference's flat (boxes,
    box_index) calling convention (base_model.py:80-112)."""
    feats, boxes = _random_case(rng, B=4, H=6, W=9, C=2, N=3)
    out = roi_align(jnp.asarray(feats), jnp.asarray(boxes), (5, 5))
    # frame 2 crops only read frame 2's features
    feats2 = feats.copy()
    feats2[0] = 0.0
    out2 = roi_align(jnp.asarray(feats2), jnp.asarray(boxes), (5, 5))
    np.testing.assert_allclose(np.asarray(out[1:]), np.asarray(out2[1:]))


def test_multiscale_fusion_matches_materialized(rng):
    """roi_align_multiscale == resize+concat+roi_align (values and feature
    gradients): the align-corners resize composes exactly into the RoIAlign
    interpolation rows (reference pipeline infer_model.py:164-179)."""
    from din_tpu.ops.image import resize_bilinear_align_corners
    from din_tpu.ops.roi_align import roi_align_multiscale

    B, N, K = 3, 4, 5
    OH, OW = 9, 13
    shapes = [(9, 13, 6), (4, 7, 10)]      # scale 0 already at out_size
    maps = [jnp.asarray(rng.randn(B, h, w, c), jnp.float32)
            for (h, w, c) in shapes]
    x1 = rng.uniform(-1, OW - 2, (B, N))
    y1 = rng.uniform(-1, OH - 2, (B, N))
    boxes = jnp.asarray(
        np.stack([x1, y1, x1 + rng.uniform(1, 4, (B, N)),
                  y1 + rng.uniform(1, 4, (B, N))], -1), jnp.float32)

    def materialized(maps):
        cat = jnp.concatenate(
            [resize_bilinear_align_corners(m, (OH, OW)) for m in maps], -1)
        return roi_align(cat, boxes, (K, K), impl="onehot")

    def fused(maps):
        return roi_align_multiscale(maps, boxes, (K, K), (OH, OW),
                                    impl="onehot")

    want = materialized(maps)
    got = fused(maps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    cos = jnp.cos(jnp.arange(want.size).reshape(want.shape))
    g_want = jax.grad(lambda ms: (materialized(ms) * cos).sum())(maps)
    g_got = jax.grad(lambda ms: (fused(ms) * cos).sum())(maps)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["onehot", "gather", "pallas_interpret"])
def test_edge_boxes(rng, impl):
    """The probe set that has caught real bugs (verify SKILL.md), codified:
    zero-area boxes (collective zero-padding), boxes fully outside the
    map (must contribute 0), and boxes straddling the border — all vs the
    numpy oracle."""
    H, W, C = 9, 13, 7
    feats = rng.randn(2, H, W, C).astype(np.float32)
    boxes = np.asarray([
        [[0.0, 0.0, 0.0, 0.0],          # zero-area at origin (CAD padding)
         [4.0, 3.0, 4.0, 3.0],          # zero-area interior
         [-20.0, -20.0, -15.0, -15.0],  # fully outside (negative)
         [50.0, 50.0, 60.0, 60.0],      # fully outside (positive)
         [-3.0, -3.0, 4.0, 4.0]],       # straddles the top-left border
        [[10.0, 6.0, 16.0, 12.0],       # straddles the bottom-right border
         [0.0, 0.0, 12.0, 8.0],         # nearly whole map
         [2.0, 2.0, 2.0, 5.0],          # zero width, finite height
         [3.0, 4.0, 9.0, 4.0],          # zero height, finite width
         [12.0, 8.0, 12.0, 8.0]],       # zero-area at far corner
    ], np.float32)
    ref = oracle_crop_and_resize(feats.astype(np.float64),
                                 boxes.astype(np.float64), (5, 5))
    got = roi_align(jnp.asarray(feats), jnp.asarray(boxes), (5, 5),
                    impl=impl)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)
    # fully-outside boxes are exactly zero
    np.testing.assert_array_equal(np.asarray(got)[0, 2], 0.0)
    np.testing.assert_array_equal(np.asarray(got)[0, 3], 0.0)


@pytest.mark.parametrize("impl", ["onehot", "gather"])
def test_bf16_forward_and_grad(rng, impl):
    """bf16 features forward + grad-to-features compile and stay finite
    (the Mosaic precision='highest'-rejects-bf16 class of bug)."""
    feats = jnp.asarray(rng.randn(2, 9, 13, 4), jnp.bfloat16)
    boxes = jnp.asarray(rng.uniform(1, 6, (2, 3, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].add(3.0)

    def loss(f):
        return roi_align(f, boxes, (5, 5),
                         impl=impl).astype(jnp.float32).sum()

    val, grad = jax.jit(jax.value_and_grad(loss))(feats)
    assert np.isfinite(float(val))
    assert grad.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(grad, np.float32)).all()
    assert float(jnp.abs(grad.astype(jnp.float32)).sum()) > 0
