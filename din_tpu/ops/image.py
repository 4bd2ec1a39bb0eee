"""On-device image ops.

- ``prep_images``: [0,255] -> [-1,1] normalisation (reference: utils.py:8-19).
  Unlike the reference, which ships float32 frames over PCIe, our input
  pipeline ships uint8 to the device and normalises there (SURVEY.md §3.5).
- ``resize_bilinear_align_corners``: torch ``F.interpolate(mode='bilinear',
  align_corners=True)`` equivalent used for multiscale feature assembly
  (reference: base_model.py:96, infer_model.py:169).  jax.image.resize does
  NOT implement align_corners, so it is built from an explicit separable
  interpolation matrix — two small matmuls, which XLA maps straight onto the
  MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def prep_images(images: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Normalise uint8/float images in [0,255] to [-1,1] (utils.py:8-19)."""
    x = images.astype(dtype)
    return (x / 255.0 - 0.5) * 2.0


def interp_matrix_align_corners(n_in: int, n_out: int, dtype=jnp.float32):
    """[n_out, n_in] row-stochastic matrix for 1-D align-corners interpolation."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype=dtype)
    if n_out == 1:
        # align_corners with a single output samples position 0
        m = jnp.zeros((1, n_in), dtype=dtype).at[0, 0].set(1.0)
        return m
    pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
    hi = jnp.clip(lo + 1, 0, n_in - 1)
    w_hi = pos - lo.astype(jnp.float32)
    w_lo = 1.0 - w_hi
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), dtype=jnp.float32)
    m = m.at[rows, lo].add(w_lo)
    m = m.at[rows, hi].add(w_hi)
    return m.astype(dtype)


def resize_bilinear_align_corners(x: jax.Array, size) -> jax.Array:
    """Bilinear align-corners resize of NHWC tensors to (OH, OW).

    Equivalent to torch ``F.interpolate(x, size, mode='bilinear',
    align_corners=True)`` (on NCHW); implemented as two dense matmuls so the
    resize itself runs on the MXU instead of a gather pipeline.
    """
    B, H, W, C = x.shape
    OH, OW = size
    if (H, W) == (OH, OW):
        return x
    my = interp_matrix_align_corners(H, OH, x.dtype)        # [OH, H]
    mx = interp_matrix_align_corners(W, OW, x.dtype)        # [OW, W]
    # precision='highest' keeps f32 interpolation exact; for bf16 inputs it
    # is identical to the default (bf16 multiply, f32 accumulate).
    # [B,H,W,C] -> [B,OH,W,C]
    x = jnp.einsum("oh,bhwc->bowc", my, x, precision="highest")
    # [B,OH,W,C] -> [B,OH,OW,C]
    x = jnp.einsum("pw,bowc->bopc", mx, x, precision="highest")
    return x


def calc_pairwise_distance(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Euclidean distances [N,M] (reference: utils.py:42-54)."""
    rx = jnp.sum(X ** 2, axis=1)[:, None]
    ry = jnp.sum(Y ** 2, axis=1)[None, :]
    d2 = rx - 2.0 * jnp.matmul(X, Y.T, precision="highest") + ry
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def calc_pairwise_distance_3d(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Euclidean distances [B,N,M] (reference: utils.py:56-72)."""
    rx = jnp.sum(X ** 2, axis=2)[:, :, None]
    ry = jnp.sum(Y ** 2, axis=2)[:, None, :]
    d2 = rx - 2.0 * jnp.einsum("bnd,bmd->bnm", X, Y, precision="highest") + ry
    return jnp.sqrt(jnp.maximum(d2, 0.0))
