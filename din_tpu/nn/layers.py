"""Small flax building blocks with torch-compatible semantics.

The reference initialises every Linear with ``nn.init.kaiming_normal_``
(zero bias) throughout (e.g. base_model.py:40-43, infer_model.py:115-119,
dynamic_infer_module.py:102-106); ``kaiming_linear`` reproduces that
(std = sqrt(2 / fan_in)).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch nn.init.kaiming_normal_(mode='fan_in', nonlinearity='leaky_relu', a=0)
kaiming_normal_init = nn.initializers.variance_scaling(
    2.0, "fan_in", "normal")


@jax.custom_vjp
def fused_relu(x):
    """ReLU whose VJP masks with the POST-activation (y > 0 instead of
    x > 0 — identical gradients, since y > 0 <=> x > 0 for ReLU).

    Why: the standard VJP keeps the *pre*-activation alive for the backward
    mask, so under rematerialisation the conv output has two consumers and
    XLA emits the ReLU as a separate full-tensor HBM pass (~90 ms/step on
    the VGG trunk at 720x1280).  Saving the post-activation instead leaves
    the conv output with a single consumer, letting XLA fuse max(0, .) into
    the convolution's output epilogue.
    """
    return jnp.maximum(x, 0)


def _fused_relu_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _fused_relu_bwd(y, g):
    return (g * (y > 0).astype(g.dtype),)


fused_relu.defvjp(_fused_relu_fwd, _fused_relu_bwd)


class KaimingLinear(nn.Module):
    """nn.Linear with the reference's kaiming-normal init, zero bias."""

    features: int
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = "highest"

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=kaiming_normal_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            name="dense",
        )(x)


def torch_conv(features: int,
               kernel_size: Union[int, Tuple[int, int]],
               stride: Union[int, Tuple[int, int]] = 1,
               padding: Union[int, Tuple[int, int]] = 0,
               use_bias: bool = True,
               dilation: Union[int, Tuple[int, int]] = 1,
               groups: int = 1,
               dtype=None,
               name: Optional[str] = None,
               kernel_init=None,
               bias_init=None,
               precision=None) -> nn.Conv:
    """nn.Conv configured with torch Conv2d geometry (explicit padding)."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    if bias_init is not None:
        kwargs["bias_init"] = bias_init
    return nn.Conv(
        features=features,
        kernel_size=kernel_size,
        strides=stride,
        padding=pad,
        use_bias=use_bias,
        kernel_dilation=dilation,
        feature_group_count=groups,
        dtype=dtype,
        precision=precision,
        name=name,
        **kwargs,
    )


def max_pool_torch(x, kernel_size: int, stride: int, padding: int = 0):
    """torch MaxPool2d (floor mode) on NHWC."""
    pads = ((padding, padding), (padding, padding))
    return nn.max_pool(x, (kernel_size, kernel_size),
                       strides=(stride, stride), padding=pads)


def avg_pool_torch(x, kernel_size: int, stride: int, padding: int = 0):
    """torch AvgPool2d with count_include_pad=True (inception default)."""
    pads = ((padding, padding), (padding, padding))
    return nn.avg_pool(x, (kernel_size, kernel_size),
                       strides=(stride, stride), padding=pads,
                       count_include_pad=True)


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch ``_BatchNorm`` train semantics.

    Differences from ``flax.linen.BatchNorm`` that matter for parity with the
    reference's torchvision backbones (backbone/backbone.py:14-167):

      * the running-variance update uses the **unbiased** batch variance
        (torch multiplies by n/(n-1)) while normalisation uses the biased
        one;
      * statistics and normalisation are computed in float32 regardless of
        the (bf16) compute dtype, matching torch's fp32 buffers.

    Parameter/stat tree layout is identical to flax BatchNorm
    (params: scale/bias, batch_stats: mean/var) so checkpoints and the torch
    weight port are unaffected.  torch momentum 0.1 == ``momentum=0.9`` here.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(C, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(C, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.size // C
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        y = x.astype(jnp.float32) * mul + (bias - mean * mul)
        return y.astype(self.dtype or x.dtype)


class TorchLayerNorm(nn.Module):
    """torch nn.LayerNorm over the trailing ``ndims`` axes (affine)."""

    ndims: int = 1
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(-self.ndims, 0))
        return nn.LayerNorm(
            epsilon=self.epsilon,
            reduction_axes=axes,
            feature_axes=axes,
            dtype=self.dtype,
            name="ln",
        )(x)
