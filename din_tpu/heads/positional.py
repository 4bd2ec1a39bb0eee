"""Sinusoidal positional encodings.

The reference keeps three duplicated copies of each of these
(infer_module/positional_encoding.py:9-91, AT_infer_module.py:12-96,
SACRF_BiUTE_infer_module.py:11-95); here there is one.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp


def _dim_t(num_pos_feats: int, temperature: float) -> jnp.ndarray:
    i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    return temperature ** (2.0 * jnp.floor(i / 2.0) / num_pos_feats)


def _interleave_sin_cos(pos: jnp.ndarray) -> jnp.ndarray:
    """stack(sin(even), cos(odd)) flattened — DETR's interleaving
    (positional_encoding.py:44-47)."""
    s = jnp.sin(pos[..., 0::2])
    c = jnp.cos(pos[..., 1::2])
    return jnp.stack([s, c], axis=-1).reshape(*pos.shape[:-1], -1)


def image_position_embedding_sine(shape: Tuple[int, int],
                                  num_pos_feats: int = 64,
                                  temperature: float = 10000.0,
                                  normalize: bool = False,
                                  scale: float = None) -> jnp.ndarray:
    """DETR-style 2-D sine PE over an all-valid mask.

    Returns [H, W, 2*num_pos_feats] (feature-last; the reference returns
    [B, 2C, H, W] — positional_encoding.py:9-49).  Cumsum over the all-ones
    mask makes coordinates 1-based, matching the reference.
    """
    H, W = shape
    if scale is None:
        scale = 2 * math.pi
    y = jnp.arange(1, H + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, W + 1, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(y, (H, W))
    x = jnp.broadcast_to(x, (H, W))
    if normalize:
        eps = 1e-6
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale
    dim_t = _dim_t(num_pos_feats, temperature)
    pos_x = _interleave_sin_cos(x[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y[..., None] / dim_t)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def context_position_embedding_sine(context: jnp.ndarray,
                                    downscale_ratio: float,
                                    num_pos_feats: int,
                                    temperature: float = 10000.0) -> jnp.ndarray:
    """Adds image-plane PE (scaled by the backbone downscale ratio) to a
    context map [B, H, W, C] (positional_encoding.py:52-99
    Context_PositionEmbeddingSine; C must equal 2*num_pos_feats)."""
    B, H, W, C = context.shape
    assert C == 2 * int(num_pos_feats), (C, num_pos_feats)
    y = jnp.arange(1, H + 1, dtype=jnp.float32)[:, None] * downscale_ratio
    x = jnp.arange(1, W + 1, dtype=jnp.float32)[None, :] * downscale_ratio
    y = jnp.broadcast_to(y, (H, W))
    x = jnp.broadcast_to(x, (H, W))
    dim_t = _dim_t(int(num_pos_feats), temperature)
    pos_x = _interleave_sin_cos(x[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y[..., None] / dim_t)
    pos = jnp.concatenate([pos_y, pos_x], axis=-1)
    return context + pos[None].astype(context.dtype)


def sincos_encoding_2d(positions: jnp.ndarray, d_emb: int) -> jnp.ndarray:
    """Legacy 2-D sin/cos position encoding (reference utils.py:74-98,
    unused by any model there; kept for capability parity).

    positions: [N, 2] -> [N, d_emb]."""
    d = d_emb // 2
    idxs = jnp.asarray([1000.0 ** (2 * (i // 2) / d) for i in range(d)],
                       jnp.float32)
    idxs = jnp.tile(idxs, 2)                                   # [d_emb]
    pos = jnp.concatenate([
        jnp.repeat(positions[:, 0:1], d, axis=1),
        jnp.repeat(positions[:, 1:2], d, axis=1)], axis=1)
    emb = pos / idxs
    even = jnp.sin(emb[:, 0::2])
    odd = jnp.cos(emb[:, 1::2])
    out = jnp.zeros_like(emb)
    out = out.at[:, 0::2].set(even)
    out = out.at[:, 1::2].set(odd)
    return out


def boxes_position_embedding(features: jnp.ndarray,
                             boxes: jnp.ndarray,
                             image_size: Tuple[int, int],
                             out_size: Tuple[int, int],
                             temperature: float = 10000.0) -> jnp.ndarray:
    """Box-centre sine PE added to actor features.

    features: [B, T, N, C]; boxes: [B, T, N, 4] (x1,y1,x2,y2 in feature-map
    coords).  Centres are rescaled to image pixels then sine/cos encoded
    (Embfeature_PositionEmbedding, AT_infer_module.py:52-96): PE = concat of
    x-encoding (C/2) and y-encoding (C/2).
    """
    B, T, N, C = features.shape
    num_pos_feats = C // 2
    cx = (boxes[..., 0] + boxes[..., 2]) / 2.0 * (image_size[1] / out_size[1])
    cy = (boxes[..., 1] + boxes[..., 3]) / 2.0 * (image_size[0] / out_size[0])
    dim_t = _dim_t(num_pos_feats, temperature)
    pos_x = _interleave_sin_cos(cx[..., None].astype(jnp.float32) / dim_t)
    pos_y = _interleave_sin_cos(cy[..., None].astype(jnp.float32) / dim_t)
    pe = jnp.concatenate([pos_x, pos_y], axis=-1)
    return features + pe.astype(features.dtype)
