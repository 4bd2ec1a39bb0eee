"""Fused 2x2 max-pool over a column-folded feature map (Pallas TPU kernel).

Input is the phase-major folded layout produced by the folded VGG stem
(din_tpu/nn/stem.py): y[f, h, j, b*c+o] == unfolded[f, h, 2j+b, o].  The
2x2 stride-2 max-pool of the unfolded map is then

    out[f, i, j, o] = max over (h in {2i, 2i+1}, b in {0, 1})

i.e. a row-pair max (sublanes) and a col-phase pair max (lane halves) —
pure elementwise work: one read + one write, HBM-bound.  Blocks cover many
row pairs per grid step (VMEM-budgeted): ~4.7 ms fwd+bwd per 8-frame
720x1280 chunk on v5e vs ~25 ms with a one-row-pair grid (H/2 steps/frame
— grid/DMA overhead dominates tiny elementwise blocks) and ~27 ms for the
XLA fallback composition.

The custom VJP routes gradient ties to the first argmax in the window
(row-major), matching torch MaxPool2d / XLA SelectAndScatter semantics
(reference pool: backbone/backbone.py:95 torchvision VGG features).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANE = 128
_VMEM_LIMIT = 11 * 2 ** 20       # 16M scoped vmem minus pipeline headroom


def _rows_per_block(half_h: int, w2: int, c: int,
                    bwd: bool = False) -> int:
    """Output row-pairs per grid step, snapped to a divisor of H//2.

    Budgeted against Mosaic's scoped-vmem STACK, not just the block DMAs:
    the kernels compute in f32 (packed-bf16 compares are rejected by this
    Mosaic build), so temporaries cost ~3 (fwd) / ~10 (bwd) f32 rows per
    output row (bwd measured 3.07 MB/row at W2=640 C=128 on v5e)."""
    per_row = (10 if bwd else 3) * w2 * c * 4
    r = max(1, min(half_h, _VMEM_LIMIT // max(per_row, 1)))
    while half_h % r:
        r -= 1
    return r


def _fwd_kernel(x_ref, o_ref, *, c):
    # f32 in-register: Mosaic (this build) rejects packed-bf16 compares
    x = x_ref[0].astype(jnp.float32)          # [R, 2, W2, C]
    r0, r1 = x[:, 0], x[:, 1]
    cm0 = jnp.maximum(r0[..., :c], r0[..., c:])
    cm1 = jnp.maximum(r1[..., :c], r1[..., c:])
    o_ref[0] = jnp.maximum(cm0, cm1).astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dx_ref, *, c):
    x = x_ref[0].astype(jnp.float32)          # [R, 2, W2, C]
    g = g_ref[0].astype(jnp.float32)          # [R, W2, c]
    a0, b0 = x[:, 0, :, :c], x[:, 0, :, c:]
    a1, b1 = x[:, 1, :, :c], x[:, 1, :, c:]
    m0 = a0 >= b0                       # col-phase winner, row 0
    m1 = a1 >= b1                       # col-phase winner, row 1
    mrow = jnp.maximum(a0, b0) >= jnp.maximum(a1, b1)  # ties -> first row
    zero = jnp.zeros_like(g)
    g_r0 = jnp.where(mrow, g, zero)
    g_r1 = jnp.where(mrow, zero, g)
    # per-phase stores (no stacked temporary — keeps the vmem stack small)
    dx_ref[0, :, 0] = jnp.concatenate(
        [jnp.where(m0, g_r0, 0), jnp.where(m0, 0, g_r0)],
        axis=-1).astype(dx_ref.dtype)
    dx_ref[0, :, 1] = jnp.concatenate(
        [jnp.where(m1, g_r1, 0), jnp.where(m1, 0, g_r1)],
        axis=-1).astype(dx_ref.dtype)


def _pallas_fwd_call(x, interpret):
    F, H, W2, C = x.shape
    c = C // 2
    R = _rows_per_block(H // 2, W2, C)
    x5 = x.reshape(F, H // 2, 2, W2, C)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, c=c),
        grid=(F, (H // 2) // R),
        in_specs=[pl.BlockSpec((1, R, 2, W2, C),
                               lambda f, r: (f, r, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, R, W2, c), lambda f, r: (f, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((F, H // 2, W2, c), x.dtype),
        interpret=interpret,
    )(x5)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _fold_pool_pallas(x, interpret=False):
    return _pallas_fwd_call(x, interpret)


def _fp_fwd(x, interpret):
    return _pallas_fwd_call(x, interpret), x


def _fp_bwd(interpret, x, g):
    F, H, W2, C = x.shape
    c = C // 2
    R = _rows_per_block(H // 2, W2, C, bwd=True)
    x5 = x.reshape(F, H // 2, 2, W2, C)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c),
        grid=(F, (H // 2) // R),
        in_specs=[pl.BlockSpec((1, R, 2, W2, C),
                               lambda f, r: (f, r, 0, 0, 0)),
                  pl.BlockSpec((1, R, W2, c), lambda f, r: (f, r, 0, 0))],
        out_specs=pl.BlockSpec((1, R, 2, W2, C),
                               lambda f, r: (f, r, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x5.shape, g.dtype),
        interpret=interpret,
    )(x5, g)
    return (dx.reshape(x.shape),)


_fold_pool_pallas.defvjp(_fp_fwd, _fp_bwd)


@jax.custom_vjp
def _paired_max(a, b):
    """max(a, b) whose VJP routes gradient ties to the FIRST argmax
    (torch semantics) with plain selects — autodiff's tie-splitting rule
    costs extra equality/normalisation passes over full-res tensors."""
    return jnp.maximum(a, b)


def _paired_max_fwd(a, b):
    return jnp.maximum(a, b), (a >= b)


def _paired_max_bwd(first_wins, g):
    return (jnp.where(first_wins, g, 0), jnp.where(first_wins, 0, g))


_paired_max.defvjp(_paired_max_fwd, _paired_max_bwd)


def _fold_pool_xla(x):
    c = x.shape[-1] // 2
    # phase pair FIRST (within-row window order), then the row pair with
    # first-row-wins — reproduces torch's row-major first-argmax exactly
    # even on cross-phase ties (a rows-first composition routes the tie
    # between (row1, col0) and (row0, col1) to the wrong input).
    cm = _paired_max(x[..., :c], x[..., c:])
    return _paired_max(cm[:, 0::2], cm[:, 1::2])


def fold_pool_2x2(x: jax.Array, impl: str = "auto") -> jax.Array:
    """2x2 stride-2 max-pool in folded layout: [F, H, W2, 2c] -> [F, H//2,
    W2, c].  impl: 'auto' | 'pallas' | 'pallas_interpret' | 'xla'."""
    F, H, W2, C = x.shape
    assert H % 2 == 0 and C % 2 == 0
    if impl == "auto":
        fits = C == _LANE and W2 * C * x.dtype.itemsize * 8 < 8 * 2 ** 20
        on_tpu = jax.default_backend() not in ("cpu",)
        impl = "pallas" if (fits and on_tpu) else "xla"
    if impl == "xla":
        return _fold_pool_xla(x)
    return _fold_pool_pallas(x, impl == "pallas_interpret")
