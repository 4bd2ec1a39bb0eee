"""Tests for device image ops (prep, align-corners resize, distances)."""

import jax.numpy as jnp
import numpy as np
import pytest

from din_tpu.ops.image import (calc_pairwise_distance,
                               calc_pairwise_distance_3d, prep_images,
                               resize_bilinear_align_corners)


def test_prep_images_range():
    x = np.array([[0, 127.5, 255]], dtype=np.float32)
    y = np.asarray(prep_images(jnp.asarray(x)))
    np.testing.assert_allclose(y, [[-1.0, 0.0, 1.0]], atol=1e-6)


def test_prep_images_uint8():
    x = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    y = np.asarray(prep_images(jnp.asarray(x)))
    np.testing.assert_allclose(y.min(), -1.0, atol=1e-6)
    np.testing.assert_allclose(y.max(), 1.0, atol=1e-6)


def oracle_resize_align_corners(x, size):
    """numpy align-corners bilinear (torch F.interpolate semantics)."""
    B, H, W, C = x.shape
    OH, OW = size
    out = np.zeros((B, OH, OW, C))
    ys = (np.arange(OH) * (H - 1) / (OH - 1)) if OH > 1 else np.zeros(1)
    xs = (np.arange(OW) * (W - 1) / (OW - 1)) if OW > 1 else np.zeros(1)
    for i, yy in enumerate(ys):
        y0, y1 = int(np.floor(yy)), min(int(np.floor(yy)) + 1, H - 1)
        fy = yy - y0
        for j, xx in enumerate(xs):
            x0, x1 = int(np.floor(xx)), min(int(np.floor(xx)) + 1, W - 1)
            fx = xx - x0
            out[:, i, j] = ((1 - fy) * (1 - fx) * x[:, y0, x0]
                            + (1 - fy) * fx * x[:, y0, x1]
                            + fy * (1 - fx) * x[:, y1, x0]
                            + fy * fx * x[:, y1, x1])
    return out


@pytest.mark.parametrize("insize,outsize", [((5, 7), (10, 14)),
                                            ((8, 6), (3, 11)),
                                            ((4, 4), (4, 4))])
def test_resize_align_corners(rng, insize, outsize):
    x = rng.randn(2, *insize, 3).astype(np.float32)
    ref = oracle_resize_align_corners(x, outsize)
    got = resize_bilinear_align_corners(jnp.asarray(x), outsize)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_resize_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    x = np.random.RandomState(1).randn(2, 5, 9, 4).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(11, 6),
                        mode="bilinear", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    got = resize_bilinear_align_corners(jnp.asarray(x), (11, 6))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_pairwise_distance(rng):
    X = rng.randn(5, 3).astype(np.float32)
    Y = rng.randn(7, 3).astype(np.float32)
    ref = np.sqrt(((X[:, None] - Y[None]) ** 2).sum(-1))
    got = calc_pairwise_distance(jnp.asarray(X), jnp.asarray(Y))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)

    Xb = rng.randn(2, 5, 3).astype(np.float32)
    Yb = rng.randn(2, 6, 3).astype(np.float32)
    refb = np.sqrt(((Xb[:, :, None] - Yb[:, None]) ** 2).sum(-1))
    gotb = calc_pairwise_distance_3d(jnp.asarray(Xb), jnp.asarray(Yb))
    np.testing.assert_allclose(np.asarray(gotb), refb, rtol=1e-4, atol=1e-4)
