"""RoIAlign (crop-and-resize) — the reference's only native component.

The reference imports the external ``longcw/RoIAlign.pytorch`` CUDA extension
(reference: base_model.py:3, instantiated base_model.py:30 with
``transform_fpcoor=True`` defaults; built in Dockerfile:5-9).  Semantics are
TensorFlow ``crop_and_resize``:

  * boxes are (x1, y1, x2, y2) in *feature-map pixel* coordinates,
  * with ``transform_fpcoor`` the K x K sample grid lands on RoI *bin
    centres*:  y(i) = y1 + (i + 0.5) * (y2 - y1)/K - 0.5   (same for x),
  * each sample is bilinearly interpolated (top=floor, bottom=ceil), and a
    sample whose centre falls outside [0, H-1] x [0, W-1] contributes the
    extrapolation value 0 (the whole sample, not per-corner).

TPU-native design: instead of a scalar gather kernel (slow on TPU) the crop
is expressed as separable sparse interpolation matrices applied by dense
matmuls — this maps the whole op (and its transpose/backward) onto the MXU.
Three interchangeable implementations:

  * ``onehot``  — pure-XLA einsum formulation (default; the autodiff
                  backward is just the transposed matmuls, no scatter-adds),
  * ``gather``  — pure-XLA 4-corner take_along_axis (cheaper at very large
                  OH*OW where the interpolation matrix would be huge),
  * ``pallas``  — fused Mosaic kernel: per-frame interpolation-matrix build
                  in VMEM + ``jnp.dot`` on the MXU, with a custom VJP.

All paths share ``_sample_grid`` so they agree bit-for-bit on geometry.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# geometry
# --------------------------------------------------------------------------

def _sample_grid(boxes: jax.Array, crop_size: Tuple[int, int]):
    """Sample coordinates for each box.

    boxes: [..., 4] (x1, y1, x2, y2) in feature pixels.
    Returns (ys [..., KH], xs [..., KW]) of float sample positions
    (transform_fpcoor bin centres).
    """
    KH, KW = crop_size
    x1, y1, x2, y2 = jnp.moveaxis(boxes, -1, 0)
    bin_h = (y2 - y1) / KH
    bin_w = (x2 - x1) / KW
    iy = jnp.arange(KH, dtype=boxes.dtype)
    ix = jnp.arange(KW, dtype=boxes.dtype)
    ys = y1[..., None] + (iy + 0.5) * bin_h[..., None] - 0.5
    xs = x1[..., None] + (ix + 0.5) * bin_w[..., None] - 0.5
    return ys, xs


def _corner_weights(coord: jax.Array, limit: int):
    """floor/ceil corners + lerp weights + in-range mask for 1-D samples."""
    in_range = (coord >= 0.0) & (coord <= limit - 1)
    c = jnp.clip(coord, 0.0, limit - 1)
    lo = jnp.floor(c)
    hi = jnp.ceil(c)
    w_hi = c - lo
    w_lo = 1.0 - w_hi
    return lo.astype(jnp.int32), hi.astype(jnp.int32), w_lo, w_hi, in_range


# --------------------------------------------------------------------------
# XLA: gather formulation
# --------------------------------------------------------------------------

def _roi_align_gather(features: jax.Array, boxes: jax.Array,
                      crop_size: Tuple[int, int]) -> jax.Array:
    """features [B,H,W,C], boxes [B,N,4] -> [B,N,KH,KW,C]."""
    B, H, W, C = features.shape
    N = boxes.shape[1]
    KH, KW = crop_size
    ys, xs = _sample_grid(boxes, crop_size)                      # [B,N,KH],[B,N,KW]
    y0, y1i, wy0, wy1, ok_y = _corner_weights(ys, H)
    x0, x1i, wx0, wx1, ok_x = _corner_weights(xs, W)

    flat = features.reshape(B, H * W, C)

    def take(yy, xx):
        idx = (yy[:, :, :, None] * W + xx[:, :, None, :]).reshape(B, N * KH * KW)
        out = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
        return out.reshape(B, N, KH, KW, C)

    f00 = take(y0, x0)
    f01 = take(y0, x1i)
    f10 = take(y1i, x0)
    f11 = take(y1i, x1i)
    wy0b = wy0[:, :, :, None, None]
    wy1b = wy1[:, :, :, None, None]
    wx0b = wx0[:, :, None, :, None]
    wx1b = wx1[:, :, None, :, None]
    out = (f00 * wy0b * wx0b + f01 * wy0b * wx1b +
           f10 * wy1b * wx0b + f11 * wy1b * wx1b)
    valid = (ok_y[:, :, :, None] & ok_x[:, :, None, :])[..., None]
    return jnp.where(valid, out, 0.0).astype(features.dtype)


# --------------------------------------------------------------------------
# XLA: separable interpolation-matrix (one-hot matmul) formulation
# --------------------------------------------------------------------------

def _interp_rows(boxes: jax.Array, crop_size: Tuple[int, int], H: int, W: int,
                 dtype):
    """Per-axis interpolation matrices.

    Returns (My [B,N,KH,H], Mx [B,N,KW,W]) such that the crop equals
    ``einsum('bnhH,bnwW,bHWc->bnhwc', My, Mx, features)`` — separable because
    bilinear sampling factorises over y and x.  The out-of-range mask is
    folded into each axis (a sample is zeroed if either axis is out).
    """
    ys, xs = _sample_grid(boxes, crop_size)

    def axis_matrix(coord, limit):
        lo, hi, w_lo, w_hi, ok = _corner_weights(coord, limit)
        grid = jnp.arange(limit, dtype=jnp.int32)
        onehot_lo = (lo[..., None] == grid).astype(dtype)
        onehot_hi = (hi[..., None] == grid).astype(dtype)
        m = onehot_lo * w_lo[..., None].astype(dtype) + \
            onehot_hi * w_hi[..., None].astype(dtype)
        return m * ok[..., None].astype(dtype)

    return axis_matrix(ys, H), axis_matrix(xs, W)


def _roi_align_onehot(features: jax.Array, boxes: jax.Array,
                      crop_size: Tuple[int, int]) -> jax.Array:
    """MXU-friendly RoIAlign: two dense einsums, no gathers."""
    B, H, W, C = features.shape
    my, mx = _interp_rows(boxes, crop_size, H, W, features.dtype)
    # precision='highest': exact for f32, no-op for bf16 inputs.
    # y-interp: [B,N,KH,H] x [B,H,W,C] -> [B,N,KH,W,C]
    t = jnp.einsum("bnhH,bHWc->bnhWc", my, features, precision="highest")
    # x-interp: [B,N,KW,W] x [B,N,KH,W,C] -> [B,N,KH,KW,C]
    out = jnp.einsum("bnwW,bnhWc->bnhwc", mx, t, precision="highest")
    return out.astype(features.dtype)


def roi_align_multiscale(feature_maps, boxes: jax.Array,
                         crop_size: Tuple[int, int],
                         out_size: Tuple[int, int],
                         impl: str = "auto") -> jax.Array:
    """RoIAlign over the align-corners multiscale channel-concat WITHOUT
    materializing the resized maps.

    The reference resizes every backbone map to (OH, OW), concatenates, and
    RoIAligns the result (infer_model.py:164-179).  Both the align-corners
    resize and the crop sampling are separable linear maps, so they compose:
    the per-box [KH, OH] crop-interpolation rows are multiplied into the
    [OH, h] resize rows, and the composed [KH, h] matrix samples the RAW map
    directly.  Exactly equal (f32) to
    ``roi_align(concat([resize(o, out_size) for o in maps]), boxes)`` while
    skipping the [BT, OH, OW, C] resized tensor (for inv3 that tensor is
    768-ch at 87x157 — a large HBM round-trip in forward AND backward).

    feature_maps: list of [B, h_s, w_s, C_s]; boxes [B, N, 4] in (OH, OW)
    feature coords.  Returns [B, N, KH, KW, sum(C_s)].
    """
    from din_tpu.ops.image import interp_matrix_align_corners

    OH, OW = out_size
    my = mx = None
    parts = []
    for o in feature_maps:
        _, h, w, _ = o.shape
        if (h, w) == (OH, OW):
            parts.append(roi_align(o, boxes, crop_size, impl=impl))
            continue
        if my is None:
            my, mx = _interp_rows(boxes, crop_size, OH, OW, jnp.float32)
        ry = interp_matrix_align_corners(h, OH, jnp.float32)      # [OH, h]
        rx = interp_matrix_align_corners(w, OW, jnp.float32)
        myc = jnp.einsum("bnko,oh->bnkh", my, ry,
                         precision="highest").astype(o.dtype)
        mxc = jnp.einsum("bnkp,pw->bnkw", mx, rx,
                         precision="highest").astype(o.dtype)
        t = jnp.einsum("bnhH,bHWc->bnhWc", myc, o, precision="highest")
        parts.append(jnp.einsum("bnwW,bnhWc->bnhwc", mxc, t,
                                precision="highest").astype(o.dtype))
    return jnp.concatenate(parts, axis=-1)


# --------------------------------------------------------------------------
# Pallas kernel: fused interp-matrix build + MXU matmul, one frame per step
# --------------------------------------------------------------------------

def _roi_align_pallas_kernel(ys_ref, xs_ref, feat_ref, out_ref, *, H, W):
    """Grid step = one frame.

    ys/xs blocks [1, rows, 1] (per-row y,x sample centres — precomputed in
    XLA by the SAME ``_sample_grid`` the onehot/gather paths and the
    transposed-matmul backward use, so all impls and fwd/bwd agree bitwise
    at border samples; deriving them in-kernel produced a different f32
    rounding (FMA) and flipped the in-range test for samples landing
    exactly on the map border); feat block [1, H*W, C]; out block
    [1, rows, C].  Builds the [rows, H*W] interpolation matrix with
    broadcasted iota one-hots (VPU) and contracts it against the feature
    block on the MXU.
    """
    P = H * W

    ys = ys_ref[0]                                   # [rows, 1] f32
    xs = xs_ref[0]
    rows = ys.shape[0]
    ok = ((ys >= 0.0) & (ys <= H - 1) & (xs >= 0.0) & (xs <= W - 1))
    ysc = jnp.clip(ys, 0.0, H - 1)
    xsc = jnp.clip(xs, 0.0, W - 1)
    y0 = jnp.floor(ysc)
    x0 = jnp.floor(xsc)
    yh = jnp.ceil(ysc)
    xh = jnp.ceil(xsc)
    wy1 = ysc - y0
    wx1 = xsc - x0

    # Interpolation matrix over the flattened H*W axis.
    p = jax.lax.broadcasted_iota(jnp.int32, (rows, P), 1)
    py = p // W
    px = p % W
    oy0 = (py == y0.astype(jnp.int32)).astype(jnp.float32)
    oy1 = (py == yh.astype(jnp.int32)).astype(jnp.float32)
    ox0 = (px == x0.astype(jnp.int32)).astype(jnp.float32)
    ox1 = (px == xh.astype(jnp.int32)).astype(jnp.float32)
    wmat = (oy0 * (1.0 - wy1) + oy1 * wy1) * \
           (ox0 * (1.0 - wx1) + ox1 * wx1)
    wmat = wmat * ok.astype(jnp.float32)

    feat = feat_ref[0]
    # f32 operands: request full-precision passes (exact interpolation).
    # bf16 operands: native MXU bf16 multiply / f32 accumulate ('highest'
    # would demand f32 operands and fails Mosaic lowering).
    prec = "highest" if feat.dtype == jnp.float32 else "default"
    out_ref[0] = jnp.dot(
        wmat.astype(feat.dtype), feat, preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(out_ref.dtype)


def _roi_align_pallas_fwd_impl(features: jax.Array, boxes: jax.Array,
                               crop_size: Tuple[int, int],
                               interpret: bool = False) -> jax.Array:
    B, H, W, C = features.shape
    N = boxes.shape[1]
    KH, KW = crop_size
    rows = N * KH * KW
    P = H * W
    feat_flat = features.reshape(B, P, C)

    # per-row sample centres from the shared _sample_grid (see kernel doc)
    ys_g, xs_g = _sample_grid(boxes.astype(jnp.float32), crop_size)
    ys_rows = jnp.broadcast_to(ys_g[:, :, :, None],
                               (B, N, KH, KW)).reshape(B, rows, 1)
    xs_rows = jnp.broadcast_to(xs_g[:, :, None, :],
                               (B, N, KH, KW)).reshape(B, rows, 1)

    kernel = functools.partial(_roi_align_pallas_kernel, H=H, W=W)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, C), features.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * rows * P * C,
            bytes_accessed=B * (P * C + rows * C) * features.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ys_rows, xs_rows, feat_flat)
    return out.reshape(B, N, KH, KW, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _roi_align_pallas_op(features, boxes, crop_size, fmeta):
    del fmeta
    return _roi_align_pallas_fwd_impl(features, boxes, crop_size)


def _pallas_fwd(features, boxes, crop_size, fmeta):
    del fmeta
    out = _roi_align_pallas_fwd_impl(features, boxes, crop_size)
    return out, boxes


def _pallas_bwd(crop_size, fmeta, boxes, g):
    """d(features) = My^T (Mx^T g): clean transposed matmuls, no scatter."""
    H, W, dtype_name = fmeta
    my, mx = _interp_rows(boxes, crop_size, H, W, jnp.float32)
    t = jnp.einsum("bnwW,bnhwc->bnhWc", mx, g.astype(jnp.float32),
                   precision="highest")
    df = jnp.einsum("bnhH,bnhWc->bHWc", my, t, precision="highest")
    return df.astype(dtype_name), None


_roi_align_pallas_op.defvjp(_pallas_fwd, _pallas_bwd)


def roi_align_pallas(features, boxes, crop_size, interpret: bool = False):
    """Pallas RoIAlign with a matmul-transpose backward."""
    if interpret:
        return _roi_align_pallas_fwd_impl(features, boxes, crop_size,
                                          interpret=True)
    fmeta = (features.shape[1], features.shape[2], features.dtype.name)
    return _roi_align_pallas_op(features, boxes.astype(jnp.float32),
                                crop_size, fmeta)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def roi_align(features: jax.Array, boxes: jax.Array,
              crop_size: Tuple[int, int] = (5, 5),
              impl: str = "auto") -> jax.Array:
    """Crop-and-resize RoIAlign.

    Args:
      features: [B, H, W, C] feature maps (NHWC).
      boxes:    [B, N, 4] boxes (x1, y1, x2, y2) in feature-map pixels.  The
                reference's flat [B*T*N, 4] + box_index form maps onto this by
                reshaping — box_index is always ``arange(B*T)`` repeated
                (base_model.py:80-82), i.e. boxes are grouped per frame.
      crop_size: (KH, KW) output resolution per box (5x5 default; 7x7 for
                HiGCIN, scripts/train_volleyball_stage2_higcin.py:31).
      impl: 'auto' | 'onehot' | 'gather' | 'pallas' | 'pallas_interpret'.

    Returns [B, N, KH, KW, C].  Differentiable w.r.t. ``features`` only (the
    reference also treats boxes as constants: base_model.py:104-105).
    """
    B, H, W, C = features.shape
    boxes = jax.lax.stop_gradient(boxes.astype(jnp.float32))
    if impl == "auto":
        # Measured on TPU v5e (bench.py roi_align check, 8x12 boxes K=5):
        # 45x80x512  -> onehot 2.7 ms, gather 2.6 ms, pallas 5.0 ms;
        # the interp-matrix einsum rides XLA's MXU tiling and beats the
        # hand kernel, so 'auto' uses it for stage-2 maps and falls back to
        # gather for the big Inception-v3 stage-1 maps (87x157x1056, whose
        # per-frame block also exceeds the Pallas kernel's VMEM budget).
        # 'pallas' stays available/tested as the opt-in fused path.
        impl = "onehot" if H * W <= 8192 else "gather"
    if impl == "onehot":
        return _roi_align_onehot(features, boxes, crop_size)
    if impl == "gather":
        return _roi_align_gather(features, boxes, crop_size)
    if impl in ("pallas", "pallas_interpret"):
        return roi_align_pallas(features, boxes, crop_size,
                                interpret=(impl == "pallas_interpret"))
    raise ValueError(f"unknown roi_align impl: {impl}")
