"""Column-folded (1x2 space-to-depth) VGG input stem.

Why: on TPU the MXU is 128 lanes wide, so a 64-channel bf16 conv can use at
most half the array, and the 3-channel input conv almost none of it
(measured on v5e: conv1_1 1.5% MFU, conv1_2 33%, pool1 memory-bound — the
stem is ~45% of the whole VGG fwd+bwd at 720x1280 while holding ~13% of the
flops).  Folding the image width by 2 puts two horizontally-adjacent pixels
in the channel dim, so conv1_1/conv1_2 run with 128 output lanes and the
2x2 max-pool becomes pure elementwise max (fused Pallas kernel,
din_tpu/ops/pool.py).

The folded convolutions are *mathematically identical* to the canonical
ones: each folded kernel is the canonical [3,3,Cin,Cout] kernel scattered
into a [3,3,2*Cin,2*Cout] kernel with structural zeros (the zero taps add
exact zeros to the f32 accumulator).  Folded kernels are derived from the
canonical parameters at apply time, so parameter shapes, names, checkpoints
and the torch weight port (din_tpu/nn/torch_port.py) are unchanged.

Derivation: output column 2j+b (phase b in {0,1}) of a pad-1 3x3 conv reads
input columns 2j+b-1 .. 2j+b+1.  Input column 2j'+p lives in folded column
j' channel-slot p, so tap dw of output phase b maps to folded column offset
delta = (b+dw-1)//2 in {-1,0,1} and input phase p = (b+dw-1) % 2:

    K_fold[dh, delta+1, p*Cin:(p+1)*Cin, b*Cout:(b+1)*Cout] = K[dh, dw]

Folded output channel order is phase-major, so unfolding is a plain
reshape.  Reference semantics pinned by tests/test_stem.py (folded ==
canonical) and the torch-parity tests in tests/test_backbones.py, which run
through this path (reference: backbone/backbone.py:88-112 VGG features).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from din_tpu.ops.pool import _paired_max, fold_pool_2x2

_PHASES = 2


def fold_kernel(kernel: jax.Array) -> jax.Array:
    """[3, 3, Cin, Cout] canonical -> [3, 3, 2*Cin, 2*Cout] folded (HWIO)."""
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), "folding is derived for 3x3 pad-1 kernels"
    out = jnp.zeros((3, 3, _PHASES * cin, _PHASES * cout), kernel.dtype)
    for b in range(_PHASES):
        for dw in range(3):
            p = (b + dw - 1) % _PHASES
            delta = (b + dw - 1) // _PHASES          # floor: -1, 0 or 1
            out = out.at[:, delta + 1,
                         p * cin:(p + 1) * cin,
                         b * cout:(b + 1) * cout].set(kernel[:, dw])
    return out


def _conv_folded(x, kernel, bias, dtype):
    """pad-1 stride-1 conv on a folded NHWC tensor (bias per folded chan)."""
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.tile(bias, _PHASES).astype(dtype)


def folded_stem(x, k0, b0, k2, b2, dtype):
    """conv1_1 -> relu -> conv1_2 -> relu -> maxpool(2,2) at 128 lanes.

    x: [F, H, W, 3] (H, W even), canonical params k0 [3,3,3,64] b0 [64]
    k2 [3,3,64,64] b2 [64].  Returns [F, H//2, W//2, 64], bit-equal (up to
    f32-accumulator reassociation) to the canonical stem.
    """
    from din_tpu.nn.layers import fused_relu  # local import: avoid cycle

    F, H, W, C = x.shape
    xf = x.reshape(F, H, W // 2, _PHASES * C)        # col fold (free)
    y = fused_relu(_conv_folded(xf, fold_kernel(k0), b0, dtype))
    y = fused_relu(_conv_folded(y, fold_kernel(k2), b2, dtype))
    return fold_pool_2x2(y)


def fold_kernel_s2(kernel: jax.Array) -> jax.Array:
    """[7, 7, Cin, Cout] stride-2 pad-3 canonical kernel -> [4, 4, 4*Cin,
    Cout] stride-1 kernel over a 2x2 space-to-depth folded input (HWIO).

    Derivation (per axis): output row o of the canonical conv reads input
    row r = 2o + d for tap offset d = dh - 3 in [-3, 3].  Input row 2a + p
    lives in folded row a, phase p, so tap dh maps to folded offset
    floor(d/2) in {-2,-1,0,1} (4 taps, asymmetric pad (2,1)) and phase
    d % 2.  The (dh, dw) -> (offset, phase-slot) map is injective, so the
    folded kernel is an exact scatter of the canonical one: outputs are
    bit-equal up to f32-accumulator reassociation, and canonical parameter
    shapes/names/checkpoints are unchanged (kernels folded at apply time).
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (7, 7), "s2 folding is derived for 7x7 pad-3 kernels"
    out = jnp.zeros((4, 4, _PHASES * _PHASES * cin, cout), kernel.dtype)
    for dh in range(7):
        ph, oh = (dh - 3) % _PHASES, (dh - 3) // _PHASES
        for dw in range(7):
            pw, ow = (dw - 3) % _PHASES, (dw - 3) // _PHASES
            slot = ph * _PHASES + pw
            out = out.at[oh + 2, ow + 2,
                         slot * cin:(slot + 1) * cin, :].set(kernel[dh, dw])
    return out


def folded_res_stem_conv(x, kernel, dtype):
    """7x7 stride-2 pad-3 input conv (resnet conv1, bias-free) as a 4x4
    stride-1 conv over the 2x2 space-to-depth folded image.

    The canonical form contracts 7*7*3=147 taps at stride 2 from a 3-channel
    image — the same input-conv pathology measured for the VGG stem
    (conv1_1 1.5% MFU) and inv3 Conv2d_1a (~1% MFU).  Folding quarters the
    spatial positions and raises input channels to 12.  x: [F, H, W, Cin]
    (H, W even); returns [F, H/2, W/2, Cout] = the canonical conv output
    (BN/relu/maxpool apply unchanged downstream).
    """
    F, H, W, C = x.shape
    xf = x.reshape(F, H // 2, _PHASES, W // 2, _PHASES, C)
    xf = xf.transpose(0, 1, 3, 2, 4, 5).reshape(
        F, H // 2, W // 2, _PHASES * _PHASES * C)
    return jax.lax.conv_general_dilated(
        xf.astype(dtype), fold_kernel_s2(kernel).astype(dtype),
        window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def max_pool_2x2(x):
    """2x2 stride-2 max-pool as reshape+max (torch MaxPool2d(2) on even
    NHWC maps).  Equivalent values to a windowed reduce; the _paired_max
    VJP routes gradient ties to the first (row-major) argmax like torch's
    SelectAndScatter, with plain elementwise selects instead of a windowed
    scatter."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return _paired_max(_paired_max(x[:, :, 0, :, 0], x[:, :, 0, :, 1]),
                       _paired_max(x[:, :, 1, :, 0], x[:, :, 1, :, 1]))
