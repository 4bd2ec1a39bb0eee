"""Folded VGG stem == canonical stem (values and parameter gradients).

The folded path (din_tpu/nn/stem.py) must be a pure execution-layout change:
same math, same parameters, same checkpoint paths.  Reference semantics:
torchvision VGG features[0:5] (reference: backbone/backbone.py:88-112),
already pinned against torch in tests/test_backbones.py which runs through
this path by default.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from din_tpu.nn.backbones import VGG16Backbone
from din_tpu.nn.layers import max_pool_torch
from din_tpu.nn.stem import fold_kernel, folded_stem, max_pool_2x2


def _canonical_stem(x, k0, b0, k2, b2):
    y = jax.lax.conv_general_dilated(
        x, k0, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b0
    y = jnp.maximum(y, 0)
    y = jax.lax.conv_general_dilated(
        y, k2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
    y = jnp.maximum(y, 0)
    return max_pool_torch(y, 2, 2)


@pytest.fixture(scope="module")
def stem_params():
    rng = np.random.RandomState(0)
    k0 = jnp.asarray(rng.randn(3, 3, 3, 64) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    x = jnp.asarray(rng.rand(2, 16, 24, 3) * 2 - 1, jnp.float32)
    return x, k0, b0, k2, b2


def test_fold_kernel_identity(stem_params):
    """The folded conv reproduces the canonical conv exactly."""
    x, k0, b0, k2, b2 = stem_params
    F, H, W, C = x.shape
    xf = x.reshape(F, H, W // 2, 2 * C)
    yf = jax.lax.conv_general_dilated(
        xf, fold_kernel(k0), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, k0, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # folded channel b*64+o at col j == canonical channel o at col 2j+b
    yf_unfold = yf.reshape(F, H, W // 2, 2, 64).transpose(0, 1, 2, 3, 4)
    yf_unfold = yf_unfold.reshape(F, H, W, 64)
    np.testing.assert_allclose(np.asarray(yf_unfold), np.asarray(y),
                               rtol=0, atol=1e-5)


def test_folded_stem_values(stem_params):
    x, k0, b0, k2, b2 = stem_params
    got = folded_stem(x, k0, b0, k2, b2, jnp.float32)
    want = _canonical_stem(x, k0, b0, k2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)


def test_folded_stem_param_grads(stem_params):
    x, k0, b0, k2, b2 = stem_params

    def loss_folded(k0, b0, k2, b2):
        y = folded_stem(x, k0, b0, k2, b2, jnp.float32)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    def loss_canon(k0, b0, k2, b2):
        y = _canonical_stem(x, k0, b0, k2, b2)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    gf = jax.grad(loss_folded, argnums=(0, 1, 2, 3))(k0, b0, k2, b2)
    gc = jax.grad(loss_canon, argnums=(0, 1, 2, 3))(k0, b0, k2, b2)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_max_pool_2x2_matches_windowed():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 8, 12, 5), jnp.float32)
    np.testing.assert_array_equal(np.asarray(max_pool_2x2(x)),
                                  np.asarray(max_pool_torch(x, 2, 2)))


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5),
                                        (jnp.bfloat16, 0.05)])
def test_vgg16_folded_equals_canonical(dtype, atol):
    """Full VGG16 forward: folded stem on vs off, same params."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 32, 48, 3) * 2 - 1, dtype)
    folded = VGG16Backbone(dtype=dtype)
    canon = VGG16Backbone(dtype=dtype, folded_stem=False)
    params = canon.init(jax.random.PRNGKey(0), x)
    # identical param trees (paths + shapes) regardless of the stem mode
    pf = folded.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(pf)
            == jax.tree_util.tree_structure(params))
    yf = folded.apply(params, x)[0].astype(jnp.float32)
    yc = canon.apply(params, x)[0].astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yc),
                               rtol=0, atol=atol)


def test_folded_skipped_on_odd_maps():
    """Odd widths fall back to the canonical stem (same params)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 30, 45, 3), jnp.float32)
    folded = VGG16Backbone(dtype=jnp.float32)
    params = folded.init(jax.random.PRNGKey(0), x)
    canon = VGG16Backbone(dtype=jnp.float32, folded_stem=False)
    y1 = folded.apply(params, x)[0]
    y2 = canon.apply(params, x)[0]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_cfg_folded_stem_knob_reaches_backbone():
    """cfg.folded_stem plumbs Config -> model -> Trunk -> _BackboneStep ->
    _VGG: same outputs either way, and the folded program is structurally
    different (its stem convs run on W/2 x 128-lane tensors)."""
    from din_tpu.config import Config
    from din_tpu.models.registry import build_model

    base = Config(dataset_name="volleyball", training_stage=2,
                  inference_module_name="dynamic_volleyball",
                  backbone="vgg16", image_size=(16, 24), out_size=(4, 6),
                  crop_size=(2, 2), num_boxes=3, num_frames=2, batch_size=1,
                  num_features_boxes=16, num_features_relation=8,
                  num_features_gcn=16, lite_dim=8,
                  train_backbone=False)
    rng = np.random.RandomState(5)
    images = (rng.rand(1, 2, 16, 24, 3) * 255).astype(np.uint8)
    boxes = np.zeros((1, 2, 3, 4), np.float32)
    boxes[..., 2:] = [5.0, 3.0]
    outs = {}
    for folded in (True, False):
        cfg = base.replace(folded_stem=folded)
        model = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images),
                               jnp.asarray(boxes))
        y = model.apply(variables, jnp.asarray(images), jnp.asarray(boxes))
        outs[folded] = jax.tree_util.tree_map(np.asarray, y)
        if folded:
            jaxpr = str(jax.make_jaxpr(
                lambda v, im, bx: model.apply(v, im, bx))(
                    variables, jnp.asarray(images), jnp.asarray(boxes)))
            # folded conv signature: 6-channel input (2x3 phase-fold)
            assert "3,3,6,128" in jaxpr.replace(" ", ""), \
                "folded stem not present in the traced program"
    for a, b in zip(jax.tree_util.tree_leaves(outs[True]),
                    jax.tree_util.tree_leaves(outs[False])):
        np.testing.assert_allclose(a.astype(np.float32),
                                   b.astype(np.float32), rtol=0, atol=0.1)


def test_fold_pool_tie_routing_matches_torch():
    """Exact ties across rows AND phases: gradients must route to the
    row-major FIRST argmax of the unfolded 2x2 window (torch MaxPool2d),
    in both the Pallas kernel and the XLA fallback."""
    import torch

    from din_tpu.ops.pool import fold_pool_2x2

    rng = np.random.RandomState(7)
    # small integers -> plenty of exact ties, exactly representable
    unfolded = rng.randint(0, 3, (2, 4, 8, 3)).astype(np.float32)
    F, H, W, C = unfolded.shape
    # folded layout is phase-major in channels: chan b*C+o == col 2j+b
    folded = jnp.asarray(
        unfolded.reshape(F, H, W // 2, 2, C).reshape(F, H, W // 2, 2 * C))
    cot = rng.randn(F, H // 2, W // 2, C).astype(np.float32)

    tin = torch.tensor(unfolded.transpose(0, 3, 1, 2), requires_grad=True)
    tout = torch.nn.functional.max_pool2d(tin, 2, 2)
    tout.backward(torch.tensor(cot.transpose(0, 3, 1, 2)))
    want = tin.grad.numpy().transpose(0, 2, 3, 1)

    for impl in ("pallas_interpret", "xla"):
        def loss(x):
            return (fold_pool_2x2(x, impl=impl) * cot).sum()
        g = np.asarray(jax.grad(loss)(folded))
        # unfold the gradient back: chan b*C+o at col j -> col 2j+b
        g_unf = g.reshape(F, H, W // 2, 2, C).reshape(F, H, W, C)
        np.testing.assert_array_equal(g_unf, want, err_msg=impl)


@pytest.mark.parametrize("F,H,W,R", [(2, 16, 48, 4), (1, 24, 16, 2),
                                     (3, 18, 96, 3)])
def test_fused_stem_kernel_matches_unfused(F, H, W, R):
    """The fully-fused Pallas stem (din_tpu/ops/stem_kernel.py, interpret
    mode) == the unfused folded stem, including the frame-border zero
    padding of conv1_2's input and the indicator-channel bias."""
    from din_tpu.ops.stem_kernel import fused_stem_fwd

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(F, H, W, 3) * 2 - 1, jnp.float32)
    k0 = jnp.asarray(rng.randn(3, 3, 3, 64) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    want = folded_stem(x, k0, b0, k2, b2, jnp.float32)
    got = fused_stem_fwd(x.reshape(F, H, W // 2, 6), fold_kernel(k0),
                         jnp.tile(b0, 2), fold_kernel(k2), jnp.tile(b2, 2),
                         rows_per_tile=R, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)


def test_fold_pool_impls_agree():
    """Pallas (interpret) == XLA composition == unfolded windowed pool."""
    from din_tpu.ops.pool import fold_pool_2x2

    rng = np.random.RandomState(4)
    yf = jnp.asarray(rng.randn(2, 8, 16, 128), jnp.float32)

    def loss(x, impl):
        return (fold_pool_2x2(x, impl=impl) * jnp.cos(
            jnp.arange(x.size // 4).reshape(
                x.shape[0], x.shape[1] // 2, x.shape[2], x.shape[3] // 2)
        )).sum()

    o_x = fold_pool_2x2(yf, impl="xla")
    o_p = fold_pool_2x2(yf, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(o_x), np.asarray(o_p))
    # against the unfolded ground truth
    unfolded = yf.reshape(2, 8, 32, 64)
    want = max_pool_torch(unfolded, 2, 2)
    np.testing.assert_array_equal(np.asarray(o_x), np.asarray(want))
    g_x = jax.grad(loss)(yf, "xla")
    g_p = jax.grad(loss)(yf, "pallas_interpret")
    np.testing.assert_array_equal(np.asarray(g_x), np.asarray(g_p))


# ---- res18 stem space-to-depth fold ---------------------------------------

def test_res18_stem_fold_matches_canonical():
    """folded_res_stem_conv == the canonical 7x7/s2/p3 conv (values and
    parameter gradients): a pure execution-layout change of resnet conv1
    (reference backbone/backbone.py:115-134 via torchvision resnet18)."""
    from din_tpu.nn.stem import fold_kernel_s2, folded_res_stem_conv

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 20, 28, 3) * 2 - 1, jnp.float32)
    k = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.float32)

    def canonical(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    want = canonical(x, k)
    got = folded_res_stem_conv(x, k, jnp.float32)
    assert got.shape == want.shape == (2, 10, 14, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)

    # every canonical tap appears exactly once in the folded kernel
    assert float(jnp.abs(fold_kernel_s2(k)).sum()) == pytest.approx(
        float(jnp.abs(k).sum()), rel=1e-6)

    def loss(k, fold):
        y = folded_res_stem_conv(x, k, jnp.float32) if fold \
            else canonical(x, k)
        return (y * jnp.cos(jnp.arange(y.size).reshape(y.shape))).sum()

    g_c = jax.grad(loss)(k, False)
    g_f = jax.grad(loss)(k, True)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_c),
                               rtol=1e-5, atol=1e-5)


def test_res18_backbone_fold_knob_parity():
    """ResNet18Backbone(folded_stem=True) == (folded_stem=False) on the
    same params — the knob changes execution layout only."""
    from din_tpu.nn.backbones import ResNet18Backbone

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.rand(1, 32, 48, 3) * 2 - 1, jnp.float32)
    folded = ResNet18Backbone(folded_stem=True)
    canon = ResNet18Backbone(folded_stem=False)
    variables = folded.init(jax.random.PRNGKey(0), x)
    out_f = folded.apply(variables, x)[0]
    out_c = canon.apply(variables, x)[0]
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                               rtol=1e-4, atol=1e-4)
