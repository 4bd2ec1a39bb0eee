"""Fused 2x2 max-pool over a column-folded feature map (Pallas TPU kernel).

Input is the phase-major folded layout produced by the folded VGG stem
(din_tpu/nn/stem.py): y[f, h, j, b*c+o] == unfolded[f, h, 2j+b, o].  The
2x2 stride-2 max-pool of the unfolded map is then

    out[f, i, j, o] = max over (h in {2i, 2i+1}, b in {0, 1})

i.e. a row-pair max (sublanes) and a col-phase pair max (lane halves) —
pure elementwise work.  XLA composes it from a windowed reduce + lane
slice at ~14.5 ms per 8-frame 720x1280 chunk on v5e; the fused Pallas
kernel does one read + one write (7.8 ms fwd+bwd measured, bit-exact).

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


def _fwd_kernel(x_ref, o_ref, *, c):
    # f32 in-register: Mosaic (this build) rejects packed-bf16 compares
    r0 = x_ref[0, 0].astype(jnp.float32)
    r1 = x_ref[0, 1].astype(jnp.float32)
    cm0 = jnp.maximum(r0[:, :c], r0[:, c:])
    cm1 = jnp.maximum(r1[:, :c], r1[:, c:])
    o_ref[0, 0] = jnp.maximum(cm0, cm1).astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dx_ref, *, c):
    r0 = x_ref[0, 0].astype(jnp.float32)
    r1 = x_ref[0, 1].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)
    a0, b0 = r0[:, :c], r0[:, c:]
    a1, b1 = r1[:, :c], r1[:, c:]
    m0 = a0 >= b0                       # col-phase winner, row 0
    m1 = a1 >= b1                       # col-phase winner, row 1
    cm0 = jnp.maximum(a0, b0)
    cm1 = jnp.maximum(a1, b1)
    mrow = cm0 >= cm1                   # row winner (ties -> first row)
    zero = jnp.zeros_like(g)
    g_r0 = jnp.where(mrow, g, zero)
    g_r1 = jnp.where(mrow, zero, g)
    dx_ref[0, 0] = jnp.concatenate(
        [jnp.where(m0, g_r0, 0), jnp.where(m0, 0, g_r0)],
        axis=-1).astype(dx_ref.dtype)
    dx_ref[0, 1] = jnp.concatenate(
        [jnp.where(m1, g_r1, 0), jnp.where(m1, 0, g_r1)],
        axis=-1).astype(dx_ref.dtype)


def _pallas_fwd_call(x, interpret):
    F, H, W2, C = x.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, c=C // 2),
        grid=(F, H // 2),
        in_specs=[pl.BlockSpec((1, 2, W2, C), lambda f, r: (f, r, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, W2, C // 2),
                               lambda f, r: (f, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((F, H // 2, W2, C // 2), x.dtype),
        interpret=interpret,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _fold_pool_pallas(x, interpret=False):
    return _pallas_fwd_call(x, interpret)


def _fp_fwd(x, interpret):
    return _pallas_fwd_call(x, interpret), x


def _fp_bwd(interpret, x, g):
    F, H, W2, C = x.shape
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, c=C // 2),
        grid=(F, H // 2),
        in_specs=[pl.BlockSpec((1, 2, W2, C), lambda f, r: (f, r, 0, 0)),
                  pl.BlockSpec((1, 1, W2, C // 2),
                               lambda f, r: (f, r, 0, 0))],
        out_specs=pl.BlockSpec((1, 2, W2, C), lambda f, r: (f, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, g.dtype),
        interpret=interpret,
    )(x, g)
    return (dx,)


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
    import flax.linen as nn
    c = x.shape[-1] // 2
    # rows first (full-lane windowed reduce), then the lane-half pair max
    # on the halved data — measured fastest XLA composition on v5e.
    x = nn.max_pool(x, (2, 1), strides=(2, 1))
    return _paired_max(x[..., :c], x[..., c:])


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
