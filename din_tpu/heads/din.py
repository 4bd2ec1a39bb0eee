"""DIN — Dynamic Person Inference (ICCV'21), TPU-native.

Re-implements the reference's ``Dynamic_Person_Inference`` /
``Multi_Dynamic_Inference`` / ``Hierarchical_Dynamic_Inference``
(reference: infer_module/dynamic_infer_module.py:14-498) over the
``[B, T, N, C]`` actor grid:

  * offset conv ``p_conv`` (out 2*k^2, zero-init) and affinity conv
    ``scale_conv`` (out k^2, zero-init, softmaxed) are dilated convs over the
    T x N "person map" (dynamic_infer_module.py:56-82);
  * the *dynamic walk*: each grid position samples a k x k (dilated)
    neighbourhood displaced by predicted fractional offsets, fetched by
    bilinear interpolation over the zero-padded grid
    (dynamic_infer_module.py:184-282);
  * per-ratio features mixed by learned ``beta`` or mean, then a final
    linear ``hidden_weight`` (dynamic_infer_module.py:142-149).

TPU-first design: the reference's corner gather (``_get_ft``, flatten +
``torch.gather``, dynamic_infer_module.py:344-365) becomes a dense
interpolation matrix ``M [B, T*N*k^2, P]`` (P = padded-grid cells) built from
one-hot corner masks weighted by the bilinear coefficients, applied as a
single MXU matmul.  The matrix is exact (one-hots are 0/1), differentiable
w.r.t. the offsets through the coefficients, fixed-shape, and turns the
data-dependent gather + its scatter-add backward into plain matmuls.

Masked batching: with padded actor columns zeroed by the caller, the padded
cells coincide with the reference's zero-padding, so per-sample exact-N
slicing (reference infer_model.py:1286-1314) and MAX_N masked batching are
numerically equivalent (sampled out-of-roster cells are zero either way).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from din_tpu.nn.layers import kaiming_normal_init, torch_conv


def _pos_k(kernel_size: Tuple[int, int], ratio: int) -> jnp.ndarray:
    """Kernel-grid offsets [(2*k2,)], y block then x block
    (dynamic_infer_module.py:385-392)."""
    kh, kw = kernel_size
    fy = (kh - 1) * ratio + 1
    fx = (kw - 1) * ratio + 1
    dy = jnp.arange(-(fy - 1) // 2, (fy - 1) // 2 + 1, ratio, dtype=jnp.float32)
    dx = jnp.arange(-(fx - 1) // 2, (fx - 1) // 2 + 1, ratio, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(dy, dx, indexing="ij")
    return jnp.concatenate([gy.reshape(-1), gx.reshape(-1)], axis=0)


def _pos_0(T: int, N: int, kernel_size: Tuple[int, int], ratio: int,
           stride: int, k2: int) -> jnp.ndarray:
    """Base grid positions [T, N, 2*k2] offset into the padded grid
    (dynamic_infer_module.py:394-404)."""
    kh, kw = kernel_size
    pad_tb = (kh - 1) // 2 * ratio
    pad_lr = (kw - 1) // 2 * ratio
    y0 = pad_tb + jnp.arange(T, dtype=jnp.float32) * stride
    x0 = pad_lr + jnp.arange(N, dtype=jnp.float32) * stride
    y = jnp.broadcast_to(y0[:, None, None], (T, N, k2))
    x = jnp.broadcast_to(x0[None, :, None], (T, N, k2))
    return jnp.concatenate([y, x], axis=-1)


def _bilinear_sample(x: jnp.ndarray, pos: jnp.ndarray,
                     kernel_size: Tuple[int, int], ratio: int) -> jnp.ndarray:
    """Bilinear sampling of the padded T x N grid at fractional positions.

    x:   [B, T, N, C] person features
    pos: [B, T, N, 2*k2] positions in padded-grid coords (y block, x block)
    Returns [B, T, N, k2, C] interpolated corner-blend features, with the
    reference's exact corner/clamp/coefficient math
    (dynamic_infer_module.py:207-258) folded into one interpolation matrix.
    """
    B, T, N, C = x.shape
    kh, kw = kernel_size
    k2 = kh * kw
    pad_tb = (kh - 1) // 2 * ratio
    pad_lr = (kw - 1) // 2 * ratio
    Hp, Wp = T + 2 * pad_tb, N + 2 * pad_lr
    P = Hp * Wp

    xpad = jnp.pad(x, ((0, 0), (pad_tb, pad_tb), (pad_lr, pad_lr), (0, 0)))
    xpad = xpad.reshape(B, P, C)

    pos_y, pos_x = pos[..., :k2], pos[..., k2:]
    # corners from un-clamped pos (stop-gradient floor), then clamped
    lt_y = jnp.clip(jax.lax.stop_gradient(jnp.floor(pos_y)), 0, Hp - 1)
    lt_x = jnp.clip(jax.lax.stop_gradient(jnp.floor(pos_x)), 0, Wp - 1)
    rb_y = jnp.clip(jax.lax.stop_gradient(jnp.floor(pos_y)) + 1, 0, Hp - 1)
    rb_x = jnp.clip(jax.lax.stop_gradient(jnp.floor(pos_x)) + 1, 0, Wp - 1)
    # clamped positions for the coefficients (grads flow into offsets here)
    cy = jnp.clip(pos_y, 0, Hp - 1)
    cx = jnp.clip(pos_x, 0, Wp - 1)

    # corner coefficient products, (y corner, x corner) in
    # {(lt,lt)=lt, (rb,rb)=rb, (rb,lt)=lb, (lt,rb)=rt}
    wy_lt = 1.0 - jnp.abs(cy - lt_y)
    wy_rb = 1.0 - jnp.abs(cy - rb_y)
    wx_lt = 1.0 - jnp.abs(cx - lt_x)
    wx_rb = 1.0 - jnp.abs(cx - rb_x)

    grid = jnp.arange(P, dtype=jnp.int32)

    def onehot(yy, xx):
        idx = (yy * Wp + xx).astype(jnp.int32)                 # [B,T,N,k2]
        return (idx[..., None] == grid).astype(pos.dtype)      # [B,T,N,k2,P]

    m = (onehot(lt_y, lt_x) * (wy_lt * wx_lt)[..., None]
         + onehot(rb_y, rb_x) * (wy_rb * wx_rb)[..., None]
         + onehot(rb_y, lt_x) * (wy_rb * wx_lt)[..., None]
         + onehot(lt_y, rb_x) * (wy_lt * wx_rb)[..., None])
    m = m.reshape(B, T * N * k2, P)
    ft = jnp.einsum("bqp,bpc->bqc", m, xpad.astype(m.dtype),
                    precision="highest" if m.dtype == jnp.float32 else "default")
    return ft.reshape(B, T, N, k2, C).astype(x.dtype)


def _integer_sample(x: jnp.ndarray, pos: jnp.ndarray,
                    kernel_size: Tuple[int, int], ratio: int) -> jnp.ndarray:
    """Plain (non-dynamic) sampling at integer grid positions
    (dynamic_infer_module.py:154-181 ``plain_infer_ratio``)."""
    B, T, N, C = x.shape
    kh, kw = kernel_size
    k2 = kh * kw
    pad_tb = (kh - 1) // 2 * ratio
    pad_lr = (kw - 1) // 2 * ratio
    Hp, Wp = T + 2 * pad_tb, N + 2 * pad_lr
    xpad = jnp.pad(x, ((0, 0), (pad_tb, pad_tb), (pad_lr, pad_lr), (0, 0)))
    xpad = xpad.reshape(B, Hp * Wp, C)
    idx = (pos[..., :k2] * Wp + pos[..., k2:]).astype(jnp.int32)
    idx = jnp.broadcast_to(idx, (B, T, N, k2)).reshape(B, T * N * k2)
    out = jnp.take_along_axis(xpad, idx[:, :, None], axis=1)
    return out.reshape(B, T, N, k2, C)


class DynamicPersonInference(nn.Module):
    """One DIN interaction field (dynamic_infer_module.py:14-404)."""

    in_dim: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 1
    dynamic_sampling: bool = True
    sampling_ratio: Sequence[int] = (1,)
    group: int = 1
    scale_factor: bool = True
    beta_factor: bool = False
    parallel_inference: bool = False
    dtype: Any = None

    def _offset_conv(self, ratio: int, out_ch: int, name: str):
        kh, kw = self.kernel_size
        pad = ((kh - 1) // 2 * ratio, (kw - 1) // 2 * ratio)
        # zero-init weights AND bias (dynamic_infer_module.py:66-67,80-81):
        # the walk starts at the plain grid, affinity starts uniform.
        return torch_conv(out_ch, self.kernel_size, stride=self.stride,
                          padding=pad, dilation=ratio, groups=self.group,
                          dtype=self.dtype, name=name, precision="highest",
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros)

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_mad: bool = False):
        """x: [B, T, N, C] -> ([B, T, N, C], mad or None)."""
        B, T, N, C = x.shape
        kh, kw = self.kernel_size
        k2 = kh * kw
        mad = None
        ratio_features = []
        for ratio in self.sampling_ratio:
            pos_k = _pos_k(self.kernel_size, ratio)
            pos_0 = _pos_0(T, N, self.kernel_size, ratio, self.stride, k2)
            plain_pos = pos_0[None] + pos_k[None, None, None, :]

            scale = None
            if self.scale_factor:
                s = self._offset_conv(ratio, k2, f"scale_conv_{ratio}")(x)
                scale = jax.nn.softmax(s.astype(jnp.float32), axis=-1)

            if self.parallel_inference:
                # affinity branch on the plain grid + walk branch, summed
                # (dynamic_infer_module.py:285-341)
                ft_plain = _integer_sample(x, plain_pos, self.kernel_size, ratio)
                ft_scale = jnp.sum(
                    ft_plain * scale[..., None].astype(ft_plain.dtype), axis=3)
                offset = self._offset_conv(ratio, 2 * k2, f"p_conv_{ratio}")(x)
                pos = plain_pos + offset.astype(jnp.float32)
                ft_walk = _bilinear_sample(x, pos, self.kernel_size, ratio)
                mad = ft_walk if return_mad else None
                ft_walk = jnp.mean(ft_walk, axis=3)
                ratio_features.append(ft_scale + ft_walk)
            elif self.dynamic_sampling:
                offset = self._offset_conv(ratio, 2 * k2, f"p_conv_{ratio}")(x)
                pos = plain_pos + offset.astype(jnp.float32)
                ft = _bilinear_sample(x, pos, self.kernel_size, ratio)
                mad = ft if return_mad else None
                if self.scale_factor:
                    ft = jnp.sum(ft * scale[..., None].astype(ft.dtype), axis=3)
                else:
                    ft = jnp.mean(ft, axis=3)
                ratio_features.append(ft)
            else:
                ft = _integer_sample(x, plain_pos, self.kernel_size, ratio)
                mad = ft if return_mad else None
                if self.scale_factor:
                    ft = jnp.sum(ft * scale[..., None].astype(ft.dtype), axis=3)
                else:
                    ft = jnp.mean(ft, axis=3)
                ratio_features.append(ft)

        stacked = jnp.stack(ratio_features, axis=-1)          # [B,T,N,C,R]
        if self.beta_factor:
            beta = self.param("beta", nn.initializers.ones,
                              (len(self.sampling_ratio),), jnp.float32)
            out = jnp.sum(stacked * beta.astype(stacked.dtype), axis=-1)
        else:
            out = jnp.mean(stacked, axis=-1)

        out = nn.Dense(self.in_dim, use_bias=False,
                       kernel_init=kaiming_normal_init, dtype=self.dtype,
                       precision="highest", name="hidden_weight")(out)
        return out, mad


class MultiDynamicInference(nn.Module):
    """num_DIM parallel DINs with different kernels, summed
    (dynamic_infer_module.py:407-443)."""

    in_dim: int
    kernel_sizes: Sequence[Tuple[int, int]] = ((3, 3),)
    stride: int = 1
    dynamic_sampling: bool = True
    sampling_ratio: Sequence[int] = (1,)
    group: int = 1
    scale_factor: bool = True
    beta_factor: bool = False
    parallel_inference: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 return_mad: bool = False):
        del deterministic  # no dropout here; uniform call signature with
        # HierarchicalDynamicInference
        total, mad = None, None
        for i, ks in enumerate(self.kernel_sizes):
            ft, mad = DynamicPersonInference(
                in_dim=self.in_dim, kernel_size=tuple(ks), stride=self.stride,
                dynamic_sampling=self.dynamic_sampling,
                sampling_ratio=self.sampling_ratio, group=self.group,
                scale_factor=self.scale_factor, beta_factor=self.beta_factor,
                parallel_inference=self.parallel_inference, dtype=self.dtype,
                name=f"DIM_{i}")(x, return_mad=return_mad)
            total = ft if total is None else total + ft
        return total, mad


class HierarchicalDynamicInference(nn.Module):
    """Two stacked DINs (e.g. ST-factorised (1,3) then (3,1)) with
    LN + ReLU + dropout between (dynamic_infer_module.py:446-498).

    The reference's stale ``hier_LN`` (applied to a tuple, hardcoded 1024 —
    dynamic_infer_module.py:475,492-493) is fixed by intent: LayerNorm over
    the [T, N, C] feature of DPI_1's output.  Reference uses ``F.dropout``
    with default p=0.5 and unconditional training mode; here dropout rate
    0.5 honouring ``deterministic``.
    """

    in_dim: int
    person_mat_shape: Tuple[int, int] = (10, 12)
    kernel_sizes: Sequence[Tuple[int, int]] = ((1, 3), (3, 1))
    stride: int = 1
    dynamic_sampling: bool = True
    sampling_ratio: Sequence[int] = (1,)
    group: int = 1
    scale_factor: bool = True
    beta_factor: bool = False
    parallel_inference: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 return_mad: bool = False):
        assert len(self.kernel_sizes) == 2
        common = dict(in_dim=self.in_dim, stride=self.stride,
                      dynamic_sampling=self.dynamic_sampling,
                      sampling_ratio=self.sampling_ratio, group=self.group,
                      scale_factor=self.scale_factor,
                      beta_factor=self.beta_factor,
                      parallel_inference=self.parallel_inference,
                      dtype=self.dtype)
        ft, _ = DynamicPersonInference(
            kernel_size=tuple(self.kernel_sizes[0]), name="DPI_1",
            **common)(x, return_mad=False)
        T, N = ft.shape[1], ft.shape[2]
        ft = nn.LayerNorm(epsilon=1e-5, reduction_axes=(-3, -2, -1),
                          feature_axes=(-3, -2, -1), name="hier_LN")(ft)
        ft = nn.relu(ft)
        ft = nn.Dropout(0.5, deterministic=deterministic)(ft)
        return DynamicPersonInference(
            kernel_size=tuple(self.kernel_sizes[1]), name="DPI_2",
            **common)(ft, return_mad=return_mad)
