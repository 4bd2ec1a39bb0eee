"""Fully-fused folded VGG stem (Pallas TPU): conv1_1+relu+conv1_2+relu+pool.

The unfused stem round-trips two [F, 720, 640, 128] intermediates (~900 MB
each per 8-frame chunk) through HBM four times across conv1_1/relu/conv1_2/
relu/pool; this kernel keeps them in VMEM.  Layout is the column-folded
stem's (din_tpu/nn/stem.py): two horizontally-adjacent pixels live in the
channel dim, so both convs run with 128 output lanes on the MXU and the
2x2 max-pool is elementwise (row pair x lane-half pair).

Structure (shaped by Mosaic's DMA/layout constraints — no in-kernel lane
concats of offset vectors, DMA extents 8-aligned on sublanes and
128-aligned on lanes):
  * The COLUMN (dw) taps of conv1_1 are expanded OUTSIDE the kernel in
    XLA: xcol [F, H+4, W2+8, 64] holds the 3 dw-shifted copies of the
    6-channel folded input (18 ch), an INDICATOR channel (ch 18, 1 inside
    the image; the conv1_1 bias rides it in the center-row kernel matrix)
    and zero padding.  Row (dh) taps stay in-kernel: dim-0 slices of the
    DMA'd tile are offset-free, so conv1_1 is 3 dots of K=64.
  * conv1_2's 9 taps become 3 dots of K=384: the dw-shifted y1 slices are
    STORED at 128-aligned lane offsets into a [2R+2, W2, 384] scratch
    (aligned stores are legal where offset-vector concats are not), and
    each dh contributes one [m2, 384] @ [384, 128] MXU pass.
  * y1's frame-boundary halo rows must be EXACT zeros (conv1_2's canonical
    zero padding); interior tiles' halo rows are real rows.  The two
    boundary tiles zero them with pl.when ref stores.
  * Tiles overlap by 4 rows, which BlockSpecs cannot express; xcol lives
    in ANY (HBM) memory and each grid step DMAs its [2R+4, W2+8, 64]
    window into double-buffered VMEM scratch, prefetching tile t+1 while
    computing tile t (the TPU grid is sequential).  Outputs are disjoint
    [R, W2, 64] blocks via a normal BlockSpec.

Forward only: the backward uses the unfused XLA path via the custom VJP in
din_tpu/nn/stem.py (wgrads need the big intermediates anyway).

STATUS — measured on v5e at the flagship geometry (8x720x1280), this
kernel is PAR with the unfused XLA stem (21.2 ms vs 20.5 ms fwd, R=4),
not faster, so it is NOT wired into the model path.  Why the fusion win
evaporates: (1) Mosaic's 128-lane DMA/layout padding forces the
materialised xcol to ~1 GB/chunk in HBM — the very traffic fusion was
meant to remove; (2) the dw-shifted y1 slices are sublane-offset vectors,
and every use costs a relayout copy (~4 MB/tile); (3) the 16 MB scoped
vmem caps tiles at R<=4 output rows, so the ~1440-step grid pays
per-step DMA-wait latency.  Kept as a working reference for the
halo-DMA pipeline technique and covered by interpret-mode tests.

Reference semantics: torchvision VGG features[0:5]
(/root/reference/backbone/backbone.py:88-112), pinned by tests/test_stem.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PHASES = 2
_CIN = 3 * _PHASES          # folded input channels
_DW = 3 * _CIN              # dw-expanded channels
_IND = _DW                  # indicator channel index (bias carrier)
_COLP = 128                 # lane-padded xcol channels (tiled
                            # HBM layouts store 128 lanes; DMA
                            # slices must match)


def _stem_kernel(x_hbm, k0_ref, k2_ref, b2_ref, o_ref, xbuf, ybuf, cbuf,
                 sem, *, R, W2):
    f = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    rows1 = 2 * R + 2     # y1 rows (1-row halo each side)
    W2E = W2 + 8          # sublane-aligned xcol width (7 zero cols)
    slot = jax.lax.rem(t, 2)

    def dma(tt, sl):
        return pltpu.make_async_copy(
            x_hbm.at[f, pl.ds(2 * R * tt, 2 * R + 4)], xbuf.at[sl],
            sem.at[sl])

    @pl.when(t == 0)
    def _start_first():
        dma(0, 0).start()

    @pl.when(t + 1 < nt)
    def _prefetch_next():
        dma(t + 1, jax.lax.rem(t + 1, 2)).start()

    dma(t, slot).wait()

    xt = xbuf[slot]                                   # [2R+4, W2E, 64]
    m1 = rows1 * W2E
    y1 = jax.lax.dot_general(
        xt[0:rows1].reshape(m1, _COLP), k0_ref[0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    for dh in (1, 2):
        y1 = y1 + jax.lax.dot_general(
            xt[dh:dh + rows1].reshape(m1, _COLP), k0_ref[dh],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # bias rides the indicator channel of the CENTER (dh=1) matrix
    y1 = jnp.maximum(y1, 0.0).astype(o_ref.dtype)
    ybuf[:, :] = y1.reshape(rows1, W2E, 128)
    # frame-boundary halo rows are conv1_2's canonical ZERO padding
    zrow = jnp.zeros((1, W2E, 128), o_ref.dtype)

    @pl.when(t == 0)
    def _zero_top():
        ybuf[0:1] = zrow

    @pl.when(t == nt - 1)
    def _zero_bottom():
        ybuf[rows1 - 1:rows1] = zrow

    # K-concat: dw-shifted y1 slices at 128-aligned lane offsets
    for dw in range(3):
        cbuf[:, :, 128 * dw:128 * (dw + 1)] = ybuf[:, dw:dw + W2, :]
    m2 = 2 * R * W2
    acc = jax.lax.dot_general(
        cbuf[0:2 * R].reshape(m2, 384), k2_ref[0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    for dh in (1, 2):
        acc = acc + jax.lax.dot_general(
            cbuf[dh:dh + 2 * R].reshape(m2, 384), k2_ref[dh],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc + b2_ref[0, :], 0.0).reshape(R, 2, W2, 128)
    # 2x2 pool: row pair (axis 1) + lane-half (phase) pair
    cm0 = jnp.maximum(y2[:, 0, :, :64], y2[:, 0, :, 64:])
    cm1 = jnp.maximum(y2[:, 1, :, :64], y2[:, 1, :, 64:])
    o_ref[0] = jnp.maximum(cm0, cm1).astype(o_ref.dtype)


def _expand_dw(xf):
    """[F, H, W2, 6] -> [F, H+4, W2+8, 64]: 3 dw-shifted copies + indicator
    channel, zero halo (2 rows / 1+7 cols) and zero lane padding."""
    F, H, W2, C = xf.shape
    xp = jnp.pad(xf, ((0, 0), (0, 0), (1, 1), (0, 0)))
    col = jnp.concatenate(
        [xp[:, :, dw:dw + W2, :] for dw in range(3)]
        + [jnp.ones((F, H, W2, 1), xf.dtype)], axis=-1)
    return jnp.pad(col, ((0, 0), (2, 2), (1, 7), (0, _COLP - _DW - 1)))


def _fold_k0(k0f, b0f, dtype):
    """[3,3,6,128] + [128] -> [3, 64, 128] per-dh matrices in dw-major
    order; bias on the indicator row of the center matrix."""
    k = jnp.zeros((3, _COLP, 128), jnp.float32)
    k = k.at[:, :_DW, :].set(
        k0f.astype(jnp.float32).reshape(3, _DW, 128))
    k = k.at[1, _IND, :].set(b0f.astype(jnp.float32))
    return k.astype(dtype)


def fused_stem_fwd(xf, k0f, b0f, k2f, b2f, *, rows_per_tile=3,
                   interpret=False):
    """xf [F, H, W2, 6] folded input; k0f [3,3,6,128] / k2f [3,3,128,128]
    folded kernels; b0f/b2f [128] folded biases.  Returns pooled
    [F, H//2, W2, 64].  Requires H % (2*rows_per_tile) == 0.
    """
    F, H, W2, C = xf.shape
    assert C == _CIN and H % (2 * rows_per_tile) == 0
    R = rows_per_tile
    dtype = xf.dtype
    xcol = _expand_dw(xf)
    k0 = _fold_k0(k0f, b0f, dtype)
    # [3, 384, 128]: dh-sliced conv1_2 kernels in dw-major K order
    k2 = k2f.astype(dtype).reshape(3, 384, 128)
    b2 = b2f.reshape(1, 128).astype(jnp.float32)
    grid = (F, H // (2 * R))
    return pl.pallas_call(
        functools.partial(_stem_kernel, R=R, W2=W2),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((3, _COLP, 128), lambda f, t: (0, 0, 0)),
            pl.BlockSpec((3, 384, 128), lambda f, t: (0, 0, 0)),
            pl.BlockSpec((1, 128), lambda f, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, W2, 64), lambda f, t: (f, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((F, H // 2, W2, 64), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * R + 4, W2 + 8, _COLP), dtype),
            pltpu.VMEM((2 * R + 2, W2 + 8, 128), dtype),
            pltpu.VMEM((2 * R + 2, W2, 384), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xcol, k0, k2, b2)
