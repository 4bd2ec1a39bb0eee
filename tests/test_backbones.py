"""Backbone geometry + torch numerical parity via the weight port.

torchvision is unavailable, so the torch replicas below rebuild the exact
torchvision layer structure (same state_dict key names) with random weights;
the converter then has to reproduce torch outputs bit-close in flax.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from din_tpu.nn.backbones import (AlexNetBackbone, InceptionV3Backbone,
                                  ResNet18Backbone, VGG16Backbone,
                                  build_backbone)
from din_tpu.nn.torch_port import convert_backbone_state, graft_variables

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


def _to_numpy_state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _run_flax(backbone, variables, x_nchw, train=False):
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    # full f32 convs for parity comparison (prod path runs bf16 by choice)
    with jax.default_matmul_precision("highest"):
        outs = backbone.apply(variables, x, train=train)
    return [np.asarray(o).transpose(0, 3, 1, 2) for o in outs]


# ---- VGG16 ---------------------------------------------------------------

def _torch_vgg16_features():
    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for item in plan:
        if item == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, item, 3, padding=1))
            layers.append(tnn.ReLU(inplace=True))
            in_ch = item
    return tnn.Sequential(*layers)


def test_vgg16_parity(rng):
    tmodel = tnn.Sequential()
    tmodel.add_module("features", _torch_vgg16_features())
    tmodel.eval()
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    bb = VGG16Backbone()
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    conv = convert_backbone_state(_to_numpy_state(tmodel), "vgg16")
    variables = graft_variables(variables, conv)
    out = _run_flax(bb, variables, x)[0]
    assert out.shape == ref.shape == (1, 512, 2, 3)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


# ---- ResNet18 ------------------------------------------------------------

class _TBasicBlock(tnn.Module):
    def __init__(self, inp, out, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, out, 3, stride=stride, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(out, out, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, out, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(out))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class _TResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, padding=1)
        self.layer1 = tnn.Sequential(_TBasicBlock(64, 64), _TBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(_TBasicBlock(64, 128, 2), _TBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(_TBasicBlock(128, 256, 2), _TBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(_TBasicBlock(256, 512, 2), _TBasicBlock(512, 512))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def test_resnet18_parity(rng):
    tmodel = _TResNet18()
    # randomize running stats so eval-mode BN is non-trivial
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
    tmodel.eval()
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    bb = ResNet18Backbone()
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    conv = convert_backbone_state(_to_numpy_state(tmodel), "res18")
    variables = graft_variables(variables, conv)
    out = _run_flax(bb, variables, x)[0]
    assert out.shape == ref.shape == (1, 512, 2, 3)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_res18_reference_sequential_keys(rng):
    """The reference saves res18 under an anonymous Sequential
    (backbone/backbone.py:119-128): features.{0,1,4..7}."""
    tmodel = _TResNet18()
    tmodel.eval()
    state = _to_numpy_state(tmodel)
    remap = {"conv1": "features.0", "bn1": "features.1",
             "layer1": "features.4", "layer2": "features.5",
             "layer3": "features.6", "layer4": "features.7"}
    seq_state = {}
    for k, v in state.items():
        head = k.split(".")[0]
        seq_state[remap[head] + k[len(head):]] = v
    a = convert_backbone_state(state, "res18")
    b = convert_backbone_state(seq_state, "res18")
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(x, y)


# ---- AlexNet -------------------------------------------------------------

def test_alexnet_parity(rng):
    feats = tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(True),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(True),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(True),
        tnn.MaxPool2d(3, 2),
    )
    tmodel = tnn.Sequential()
    tmodel.add_module("features", feats)
    tmodel.eval()
    x = rng.randn(1, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    bb = AlexNetBackbone()
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    variables = graft_variables(
        variables, convert_backbone_state(_to_numpy_state(tmodel), "alex"))
    out = _run_flax(bb, variables, x)[0]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


# ---- Inception v3: geometry + BasicConv2d parity --------------------------

def test_inception_two_scale_geometry():
    bb = InceptionV3Backbone()
    x = jnp.zeros((1, 160, 160, 3))
    variables = bb.init(jax.random.PRNGKey(0), x)
    outs = bb.apply(variables, x)
    assert len(outs) == 2
    assert outs[0].shape == (1, 17, 17, 288)   # Mixed_5d
    assert outs[1].shape == (1, 8, 8, 768)     # Mixed_6e


def test_registry():
    for name in ("inv3", "vgg16", "vgg19", "res18", "res50", "alex"):
        assert build_backbone(name) is not None
    with pytest.raises(ValueError):
        build_backbone("nope")


class _TBasicConv2d(tnn.Module):
    """torchvision BasicConv2d replica (conv bias=False + BN eps=1e-3)."""

    def __init__(self, inp, out, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(inp, out, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(out, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class _TInceptionA(tnn.Module):
    """torchvision InceptionA replica (same attribute names)."""

    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = _TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = _TBasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = _TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _TBasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        import torch.nn.functional as F
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, b3, bp], 1)


def test_inception_a_block_parity(rng):
    """InceptionA through the weight port matches the torch replica —
    validates the inception branch naming + BN eps in the converter."""
    from din_tpu.nn.backbones import _InceptionA
    tmodel = _TInceptionA(32, 16)
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
    tmodel.eval()
    x = rng.randn(1, 32, 9, 11).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    blk = _InceptionA(pool_features=16)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = blk.init(jax.random.PRNGKey(0), xj)
    conv = convert_backbone_state(_to_numpy_state(tmodel), "inv3")
    variables = graft_variables(variables, conv)
    with jax.default_matmul_precision("highest"):
        out = blk.apply(variables, xj)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)
