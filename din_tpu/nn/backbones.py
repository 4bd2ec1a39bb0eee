"""CNN backbones in flax (NHWC, bf16-friendly), structurally identical to the
reference's torchvision wrappers (reference: backbone/backbone.py:10-167):

  InceptionV3Backbone — two-scale output [Mixed_5d (288ch), Mixed_6e (768ch)]
                        (backbone/backbone.py:35-85)
  VGG16Backbone / VGG19Backbone — single 512-ch map (backbone/backbone.py:88-112)
  ResNet18Backbone / ResNet50Backbone — layer4 output (backbone/backbone.py:115-154)
  AlexNetBackbone — alexnet features (backbone/backbone.py:156-167)

Each ``__call__(x, train=...)`` takes images in [-1, 1] NHWC and returns a
*list* of feature maps (multiscale), mirroring the reference's
``forward -> [feature_maps]`` contract.  Module/layer names follow the torch
module paths so the weight port (din_tpu/nn/torch_port.py) is mechanical.

BatchNorm: torch momentum 0.1 == flax momentum 0.9; resnet eps 1e-5,
inception eps 1e-3.  ``train`` toggles batch-stat updates; the engine's
``set_bn_eval`` (reference train_net.py:18-21) maps to train=False here.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from din_tpu.nn.layers import (TorchBatchNorm, avg_pool_torch,
                               fused_relu, max_pool_torch, torch_conv)
from din_tpu.nn.stem import folded_res_stem_conv, folded_stem

# Activations cheap enough to keep under rematerialisation (deep layers at
# reduced spatial resolution).  A remat policy of
# save_only_these_names(SAVEABLE_ACT) then recomputes only the memory-heavy
# early blocks in the backward pass.
SAVEABLE_ACT = "backbone_saveable_act"


# --------------------------------------------------------------------------
# VGG
# --------------------------------------------------------------------------

_VGG16_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
_VGG19_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


class _ConvParams(nn.Module):
    """Declares a conv's kernel/bias with nn.Conv's default init WITHOUT
    applying it, so folded execution paths (din_tpu/nn/stem.py) can consume
    the canonical parameters under the canonical checkpoint path."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       tuple(self.shape))
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


class _VGG(nn.Module):
    plan: Sequence
    dtype: Any = jnp.float32
    folded_stem: bool = True   # 1x2-fold the 64-ch stem on even-sized maps
    remat_early: bool = False  # remat ONLY conv1-conv2 (two-segment body)

    def _run_plan(self, x, plan, idx):
        for item in plan:
            if item == "M":
                x = max_pool_torch(x, 2, 2)
                # pool outputs are the cheapest stage boundaries to save;
                # <128ch ones would be lane-padded 2x in HBM, skip those
                if x.shape[-1] >= 128:
                    x = checkpoint_name(x, SAVEABLE_ACT)
                idx += 1
            else:
                x = torch_conv(item, 3, padding=1, dtype=self.dtype,
                               name=f"features_{idx}")(x)
                x = fused_relu(x)
                if item >= 256:      # quarter resolution and below
                    x = checkpoint_name(x, SAVEABLE_ACT)
                idx += 2
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # VGG has no BN / dropout in the feature extractor
        plan = list(self.plan)
        fold = (self.folded_stem and x.shape[-1] == 3
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and tuple(plan[:3]) == (64, 64, "M"))

        def early(mdl, x):
            p, i = plan[:cut], 0
            if fold:
                k0, b0 = _ConvParams((3, 3, 3, 64), name="features_0")()
                k2, b2 = _ConvParams((3, 3, 64, 64), name="features_2")()
                x = folded_stem(x, k0, b0, k2, b2, mdl.dtype)
                p, i = p[3:], 5
            return mdl._run_plan(x, p, i)

        if self.remat_early:
            # Two-segment rematerialisation: conv1-conv2 hold ~60% of the
            # activation bytes but only ~30% of the flops — recompute them,
            # store the deep (conv3+) activations.  Every deep conv's wgrad
            # input is then saved, so the backward runs zero deep recompute
            # (a save-names policy over a whole-backbone remat can't express
            # this: wgrads consume the UNSAVED inputs of each conv, so the
            # chain is recomputed regardless of what checkpoint_name marks).
            cut = [i for i, it in enumerate(plan) if it == "M"][1] + 1
            x = nn.remat(early)(self, x)
            idx = sum(1 if it == "M" else 2 for it in plan[:cut])
            x = self._run_plan(x, plan[cut:], idx)
        else:
            cut = len(plan)
            x = early(self, x)
        return [x]


class VGG16Backbone(_VGG):
    plan: Sequence = tuple(_VGG16_PLAN)


class VGG19Backbone(_VGG):
    plan: Sequence = tuple(_VGG19_PLAN)


# --------------------------------------------------------------------------
# ResNet
# --------------------------------------------------------------------------

class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: TorchBatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        identity = x
        out = torch_conv(self.features, 3, stride=self.stride, padding=1,
                         use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = bn("bn1")(out)
        out = fused_relu(out)
        out = torch_conv(self.features, 3, padding=1, use_bias=False,
                         dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        if self.downsample:
            identity = torch_conv(self.features, 1, stride=self.stride,
                                  use_bias=False, dtype=self.dtype,
                                  name="downsample_0")(x)
            identity = bn("downsample_1")(identity)
        return fused_relu(out + identity)


class _Bottleneck(nn.Module):
    features: int  # base width; output = features * 4
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: TorchBatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        identity = x
        out = torch_conv(self.features, 1, use_bias=False, dtype=self.dtype,
                         name="conv1")(x)
        out = fused_relu(bn("bn1")(out))
        out = torch_conv(self.features, 3, stride=self.stride, padding=1,
                         use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = fused_relu(bn("bn2")(out))
        out = torch_conv(self.features * 4, 1, use_bias=False,
                         dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = torch_conv(self.features * 4, 1, stride=self.stride,
                                  use_bias=False, dtype=self.dtype,
                                  name="downsample_0")(x)
            identity = bn("downsample_1")(identity)
        return fused_relu(out + identity)


class _ConvKernel(nn.Module):
    """Declares a bias-free conv kernel with nn.Conv's default init WITHOUT
    applying it (folded-path analogue of _ConvParams for resnet conv1)."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          tuple(self.shape))


class _ResNet(nn.Module):
    block: Any
    layers: Sequence[int]
    dtype: Any = jnp.float32
    stop_at: Any = None       # stage name ('stem'|'layer1'..): profiling aid
    folded_stem: bool = True  # 2x2 space-to-depth fold of the 7x7/s2 conv1

    @nn.compact
    def __call__(self, x, train: bool = False):
        fold = (self.folded_stem and x.shape[-1] == 3
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        if fold:
            # canonical param under the canonical checkpoint path; kernel
            # folded at apply time (din_tpu/nn/stem.py fold_kernel_s2)
            k = _ConvKernel((7, 7, 3, 64), name="conv1")()
            x = folded_res_stem_conv(x, k, self.dtype)
        else:
            x = torch_conv(64, 7, stride=2, padding=3, use_bias=False,
                           dtype=self.dtype, name="conv1")(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = fused_relu(x)
        x = max_pool_torch(x, 3, 2, padding=1)
        if self.stop_at == "stem":
            return [x]
        widths = (64, 128, 256, 512)
        expansion = 4 if self.block is _Bottleneck else 1
        in_ch = 64
        for li, (w, n) in enumerate(zip(widths, self.layers), start=1):
            for bi in range(n):
                stride = 2 if (li > 1 and bi == 0) else 1
                down = (bi == 0 and (stride != 1 or in_ch != w * expansion))
                x = self.block(features=w, stride=stride, downsample=down,
                               dtype=self.dtype,
                               name=f"layer{li}_{bi}")(x, train=train)
                in_ch = w * expansion
            if self.stop_at == f"layer{li}":
                return [x]
        return [x]


class ResNet18Backbone(_ResNet):
    block: Any = _BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)


class ResNet50Backbone(_ResNet):
    block: Any = _Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)


# --------------------------------------------------------------------------
# Inception v3 (cut at Mixed_6e, two-scale output)
# --------------------------------------------------------------------------

class _BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=1e-3) + relu (torchvision BasicConv2d)."""

    features: int
    kernel_size: Any
    stride: Any = 1
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = torch_conv(self.features, self.kernel_size, stride=self.stride,
                       padding=self.padding, use_bias=False, dtype=self.dtype,
                       name="conv")(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return fused_relu(x)


class _InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda f, k, p=0, name=None: _BasicConv2d(
            f, k, padding=p, dtype=self.dtype, name=name)
        b1 = c(64, 1, name="branch1x1")(x, train)
        b5 = c(48, 1, name="branch5x5_1")(x, train)
        b5 = c(64, 5, p=2, name="branch5x5_2")(b5, train)
        b3 = c(64, 1, name="branch3x3dbl_1")(x, train)
        b3 = c(96, 3, p=1, name="branch3x3dbl_2")(b3, train)
        b3 = c(96, 3, p=1, name="branch3x3dbl_3")(b3, train)
        bp = avg_pool_torch(x, 3, 1, padding=1)
        bp = c(self.pool_features, 1, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class _InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = _BasicConv2d(384, 3, stride=2, dtype=self.dtype,
                          name="branch3x3")(x, train)
        bd = _BasicConv2d(64, 1, dtype=self.dtype,
                          name="branch3x3dbl_1")(x, train)
        bd = _BasicConv2d(96, 3, padding=1, dtype=self.dtype,
                          name="branch3x3dbl_2")(bd, train)
        bd = _BasicConv2d(96, 3, stride=2, dtype=self.dtype,
                          name="branch3x3dbl_3")(bd, train)
        bp = max_pool_torch(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class _InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c7 = self.channels_7x7
        cc = lambda f, k, p, name: _BasicConv2d(
            f, k, padding=p, dtype=self.dtype, name=name)
        b1 = cc(192, 1, 0, "branch1x1")(x, train)
        b7 = cc(c7, 1, 0, "branch7x7_1")(x, train)
        b7 = cc(c7, (1, 7), (0, 3), "branch7x7_2")(b7, train)
        b7 = cc(192, (7, 1), (3, 0), "branch7x7_3")(b7, train)
        bd = cc(c7, 1, 0, "branch7x7dbl_1")(x, train)
        bd = cc(c7, (7, 1), (3, 0), "branch7x7dbl_2")(bd, train)
        bd = cc(c7, (1, 7), (0, 3), "branch7x7dbl_3")(bd, train)
        bd = cc(c7, (7, 1), (3, 0), "branch7x7dbl_4")(bd, train)
        bd = cc(192, (1, 7), (0, 3), "branch7x7dbl_5")(bd, train)
        bp = avg_pool_torch(x, 3, 1, padding=1)
        bp = cc(192, 1, 0, "branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionV3Backbone(nn.Module):
    """Inception v3 trunk up to Mixed_6e, returning the reference's
    two-scale list [Mixed_5d, Mixed_6e] (backbone/backbone.py:35-85)."""

    dtype: Any = jnp.float32
    stop_at: Any = None       # stage name ('stem'|'Mixed_5b'..): profiling

    @nn.compact
    def __call__(self, x, train: bool = False):
        bc = lambda f, k, s=1, p=0, name=None: _BasicConv2d(
            f, k, stride=s, padding=p, dtype=self.dtype, name=name)
        x = bc(32, 3, s=2, name="Conv2d_1a_3x3")(x, train)
        x = bc(32, 3, name="Conv2d_2a_3x3")(x, train)
        x = bc(64, 3, p=1, name="Conv2d_2b_3x3")(x, train)
        x = max_pool_torch(x, 3, 2)
        x = bc(80, 1, name="Conv2d_3b_1x1")(x, train)
        x = bc(192, 3, name="Conv2d_4a_3x3")(x, train)
        x = max_pool_torch(x, 3, 2)
        if self.stop_at == "stem":
            return [x]
        blocks = [("Mixed_5b", _InceptionA(32, dtype=self.dtype,
                                           name="Mixed_5b")),
                  ("Mixed_5c", _InceptionA(64, dtype=self.dtype,
                                           name="Mixed_5c")),
                  ("Mixed_5d", _InceptionA(64, dtype=self.dtype,
                                           name="Mixed_5d")),
                  ("Mixed_6a", _InceptionB(dtype=self.dtype,
                                           name="Mixed_6a")),
                  ("Mixed_6b", _InceptionC(128, dtype=self.dtype,
                                           name="Mixed_6b")),
                  ("Mixed_6c", _InceptionC(160, dtype=self.dtype,
                                           name="Mixed_6c")),
                  ("Mixed_6d", _InceptionC(160, dtype=self.dtype,
                                           name="Mixed_6d")),
                  ("Mixed_6e", _InceptionC(192, dtype=self.dtype,
                                           name="Mixed_6e"))]
        out5 = None
        for bname, blk in blocks:
            x = blk(x, train)
            if bname == "Mixed_5d":
                out5 = x
            if self.stop_at == bname:
                return [x] if out5 is None or bname == "Mixed_5d" \
                    else [out5, x]
        return [out5, x]


# --------------------------------------------------------------------------
# AlexNet
# --------------------------------------------------------------------------

class AlexNetBackbone(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        x = torch_conv(64, 11, stride=4, padding=2, dtype=self.dtype,
                       name="features_0")(x)
        x = fused_relu(x)
        x = max_pool_torch(x, 3, 2)
        x = torch_conv(192, 5, padding=2, dtype=self.dtype,
                       name="features_3")(x)
        x = fused_relu(x)
        x = max_pool_torch(x, 3, 2)
        x = torch_conv(384, 3, padding=1, dtype=self.dtype,
                       name="features_6")(x)
        x = fused_relu(x)
        x = torch_conv(256, 3, padding=1, dtype=self.dtype,
                       name="features_8")(x)
        x = fused_relu(x)
        x = torch_conv(256, 3, padding=1, dtype=self.dtype,
                       name="features_10")(x)
        x = fused_relu(x)
        x = max_pool_torch(x, 3, 2)
        return [x]


# --------------------------------------------------------------------------
# registry (reference: base_model.py:19-28 backbone dispatch)
# --------------------------------------------------------------------------

BACKBONES = {
    "inv3": InceptionV3Backbone,
    "vgg16": VGG16Backbone,
    "vgg19": VGG19Backbone,
    "res18": ResNet18Backbone,
    "res50": ResNet50Backbone,
    "alex": AlexNetBackbone,
}

# Whether the trunk carries live BatchNorm statistics in train mode —
# consumers that regroup frames across batch positions (the shard-local
# chunk packing in models/trunk.py) must not change numerics for these.
# Matches torchvision: plain vgg16/vgg19 and alexnet have no BN
# (ref backbone/backbone.py: MyVGG16/MyVGG19/MyAlex use the BN-free
# torchvision variants).
BACKBONE_HAS_BN = {
    "inv3": True,
    "vgg16": False,
    "vgg19": False,
    "res18": True,
    "res50": True,
    "alex": False,
}


def build_backbone(name: str, dtype=jnp.float32, **kwargs) -> nn.Module:
    """kwargs: backbone-specific knobs (e.g. ``folded_stem`` for VGG);
    unknown knobs are ignored so callers can pass cfg-level defaults."""
    if name not in BACKBONES:
        raise ValueError(f"unknown backbone '{name}' "
                         f"(choose from {sorted(BACKBONES)})")
    cls = BACKBONES[name]
    kwargs = {k: v for k, v in kwargs.items()
              if k in cls.__dataclass_fields__}
    return cls(dtype=dtype, **kwargs)
