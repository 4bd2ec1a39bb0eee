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


class _TInceptionB(tnn.Module):
    """torchvision InceptionB replica (same attribute names)."""

    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = _TBasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        import torch.nn.functional as F
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class _TInceptionC(tnn.Module):
    """torchvision InceptionC replica (same attribute names)."""

    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = _TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = _TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = _TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7_3 = _TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7dbl_1 = _TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = _TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                            padding=(3, 0))
        self.branch7x7dbl_3 = _TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                            padding=(0, 3))
        self.branch7x7dbl_4 = _TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                            padding=(3, 0))
        self.branch7x7dbl_5 = _TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                            padding=(0, 3))
        self.branch_pool = _TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        import torch.nn.functional as F
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class _TMyInceptionV3(tnn.Module):
    """Replica of the reference trunk-to-Mixed_6e
    (/root/reference/backbone/backbone.py:10-85; torchvision layer names)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = _TInceptionA(192, 32)
        self.Mixed_5c = _TInceptionA(256, 64)
        self.Mixed_5d = _TInceptionA(288, 64)
        self.Mixed_6a = _TInceptionB(288)
        self.Mixed_6b = _TInceptionC(768, 128)
        self.Mixed_6c = _TInceptionC(768, 160)
        self.Mixed_6d = _TInceptionC(768, 160)
        self.Mixed_6e = _TInceptionC(768, 192)

    def forward(self, x):
        import torch.nn.functional as F
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        out5 = self.Mixed_5d(x)
        x = self.Mixed_6a(out5)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        return [out5, x]


def _randomize_bn_stats(tmodel, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data = torch.randn(m.running_mean.shape,
                                              generator=g) * 0.1
            m.running_var.data = torch.rand(m.running_var.shape,
                                            generator=g) + 0.5


def test_inception_full_trunk_parity(rng):
    """Full inv3 trunk through the weight port at reference geometry:
    both scales + the align-corners resize to (87, 157) and 1056-ch concat
    (/root/reference/backbone/backbone.py:35-85, infer_model.py:161-176)."""
    from din_tpu.ops.image import resize_bilinear_align_corners
    tmodel = _TMyInceptionV3()
    _randomize_bn_stats(tmodel)
    tmodel.eval()
    x = rng.randn(1, 3, 720, 1280).astype(np.float32) * 0.5
    with torch.no_grad():
        ref5, ref6 = [o.numpy() for o in tmodel(torch.from_numpy(x))]
        cat = torch.cat(
            [torch.nn.functional.interpolate(torch.from_numpy(o), (87, 157),
                                             mode="bilinear",
                                             align_corners=True)
             for o in (ref5, ref6)], dim=1).numpy()

    bb = InceptionV3Backbone()
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    variables = graft_variables(
        variables, convert_backbone_state(_to_numpy_state(tmodel), "inv3"))
    out5, out6 = _run_flax(bb, variables, x)
    assert out5.shape == ref5.shape and out6.shape == ref6.shape
    np.testing.assert_allclose(out5, ref5, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(out6, ref6, rtol=1e-3, atol=1e-3)

    with jax.default_matmul_precision("highest"):
        got_cat = jnp.concatenate(
            [resize_bilinear_align_corners(
                jnp.asarray(o.transpose(0, 2, 3, 1)), (87, 157))
             for o in (out5, out6)], axis=-1)
    got_cat = np.asarray(got_cat).transpose(0, 3, 1, 2)
    assert got_cat.shape == cat.shape == (1, 288 + 768, 87, 157)
    np.testing.assert_allclose(got_cat, cat, rtol=1e-3, atol=1e-3)
