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
