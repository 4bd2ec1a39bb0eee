"""Masked-reduction helpers: edge cases for variable actor counts."""

import jax.numpy as jnp
import numpy as np

from din_tpu.utils.masking import mask_actors, masked_max, masked_mean


def test_masked_max_basic(rng):
    x = jnp.asarray(rng.randn(2, 3, 4).astype(np.float32))
    mask = jnp.asarray(np.array([[[1, 1, 0, 0]] * 3, [[1, 1, 1, 1]] * 3],
                                bool))[..., None] * jnp.ones((1, 1, 4, 1),
                                                             bool)
    # reshape mask to [2,3,4,1] broadcastable over a feature dim
    xf = x[..., None]
    out = masked_max(xf, mask, axis=2)[..., 0]
    ref0 = np.asarray(x)[0, :, :2].max(1)
    np.testing.assert_allclose(np.asarray(out)[0], ref0, rtol=1e-6)
    ref1 = np.asarray(x)[1].max(1)
    np.testing.assert_allclose(np.asarray(out)[1], ref1, rtol=1e-6)


def test_masked_max_all_invalid_slot():
    x = jnp.ones((1, 2, 3, 4))
    mask = jnp.zeros((1, 2, 3, 1), bool)
    out = masked_max(x, mask, axis=2)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_masked_mean(rng):
    x = jnp.asarray(rng.randn(5, 4).astype(np.float32))
    mask = jnp.asarray(np.array([1, 1, 1, 0, 0], bool))[:, None]
    out = masked_mean(x, jnp.broadcast_to(mask, x.shape), axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[:3].mean(0),
                               rtol=1e-5)
    # all-masked denominator clamps to 1 (returns 0, not NaN)
    out0 = masked_mean(x, jnp.zeros_like(x, bool), axis=0)
    np.testing.assert_array_equal(np.asarray(out0), 0.0)


def test_mask_actors():
    x = jnp.ones((2, 3, 4))
    mask = jnp.asarray(np.array([[[1], [1], [0]], [[0], [1], [1]]], bool))
    out = mask_actors(x, mask)
    assert float(out[0, 2].sum()) == 0.0
    assert float(out[0, 0].sum()) == 4.0
    assert float(out[1, 0].sum()) == 0.0
