"""Full-model end-to-end oracles.

The head and backbone oracles pin each piece; these tests pin the COMPLETE
reference models as one function — reshape -> prep_images -> backbone ->
multiscale concat -> RoIAlign -> fc_emb/LN -> head -> readout
(/root/reference/infer_model.py:141-234, base_model.py:65-142,
infer_model.py:1226-1319) — against the din_tpu flax models with every
weight ported.

Two reference dependencies are unavailable and replaced by functional
stand-ins (stubs carry no reference logic):

  * the ``roi_align`` CUDA extension -> a ~35-line torch crop_and_resize
    shim implementing the longcw/TF semantics that din_tpu's RoIAlign is
    pinned to (tests/test_roi_align.py; din_tpu/ops/roi_align.py docstring);
  * ``torchvision.models`` factories -> the torch replicas from
    test_backbones (identical state_dict layout, random weights).
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_backbones import (_TResNet18, _randomize_bn_stats,  # noqa: E402
                            _torch_vgg16_features)
from test_reference_oracle import (_att_block_port, _din_port,  # noqa: E402
                                   _np, _stub, graft, lin, lnorm, lstm)

from din_tpu.config import Config  # noqa: E402
from din_tpu.models.registry import build_model  # noqa: E402
from din_tpu.nn.torch_port import (convert_backbone_state,  # noqa: E402
                                   convert_fc_emb, graft_variables)

_REF = "/root/reference"


class _RoIAlignShim(tnn.Module):
    """Forward-only torch crop_and_resize with the longcw/TF semantics the
    framework is pinned to (din_tpu/ops/roi_align.py:45-71: bin-centre
    sample grid, bilinear corners, whole-sample zero when the centre leaves
    [0, H-1] x [0, W-1])."""

    def __init__(self, crop_h, crop_w):
        super().__init__()
        self.crop = (crop_h, crop_w)

    def forward(self, feats, boxes, box_idx):
        BT, D, H, W = feats.shape
        KH, KW = self.crop
        x1, y1, x2, y2 = boxes.unbind(1)
        iy = torch.arange(KH, dtype=boxes.dtype)
        ix = torch.arange(KW, dtype=boxes.dtype)
        ys = y1[:, None] + (iy + 0.5) * ((y2 - y1) / KH)[:, None] - 0.5
        xs = x1[:, None] + (ix + 0.5) * ((x2 - x1) / KW)[:, None] - 0.5

        def corners(c, limit):
            ok = (c >= 0) & (c <= limit - 1)
            c = c.clamp(0, limit - 1)
            lo = c.floor()
            return lo.long(), c.ceil().long(), c - lo, ok

        ylo, yhi, wy, oky = corners(ys, H)
        xlo, xhi, wx, okx = corners(xs, W)
        f = feats[box_idx.long()].reshape(-1, D, H * W)
        K = f.shape[0]

        def take(yy, xx):
            idx = (yy[:, :, None] * W + xx[:, None, :]).reshape(K, 1, -1)
            return f.gather(2, idx.expand(-1, D, -1)).reshape(K, D, KH, KW)

        wy, wx = wy[:, None, :, None], wx[:, None, None, :]
        out = (take(ylo, xlo) * (1 - wy) * (1 - wx)
               + take(ylo, xhi) * (1 - wy) * wx
               + take(yhi, xlo) * wy * (1 - wx)
               + take(yhi, xhi) * wy * wx)
        return out * (oky[:, :, None] & okx[:, None, :]).unsqueeze(1)


class _Unpack0(tnn.Module):
    """Dynamic_collective calls ``self.DPI(...)`` as if it returned a single
    tensor, but DIN returns a (features, MAD) tuple — a stale call site in
    the reference (infer_model.py:1294 vs dynamic_infer_module.py:151).
    Unwrapping element 0 restores the intended semantics."""

    def __init__(self, inner):
        super().__init__()
        self.inner = inner

    def forward(self, x):
        return self.inner(x)[0]


@pytest.fixture(scope="module")
def ref_models():
    """Import the reference full models with functional stand-ins installed
    for roi_align (shim above) and torchvision.models (replica factories)."""
    _stub("thop", profile=lambda *a, **k: (0, 0),
          clever_format=lambda x, f: x)
    tv_models = _stub("torchvision.models")
    tv_models.vgg16 = lambda pretrained=False, **kw: types.SimpleNamespace(
        features=_torch_vgg16_features())
    tv_models.resnet18 = lambda pretrained=False, **kw: _TResNet18()
    tv_tf = _stub("torchvision.transforms", Normalize=object)
    _stub("torchvision", models=tv_models, transforms=tv_tf)
    fv_nn = _stub("fvcore.nn", activation_count=None, flop_count=None,
                  parameter_count=None, parameter_count_table=None)
    _stub("fvcore", nn=fv_nn)
    ra = _stub("roi_align.roi_align")
    ra.RoIAlign = _RoIAlignShim
    _stub("roi_align", roi_align=ra)
    _stub("cv2", resize=None)

    sys.path.insert(0, _REF)
    try:
        mods = {name: importlib.import_module(name)
                for name in ("base_model", "infer_model")}
    finally:
        sys.path.remove(_REF)
    return types.SimpleNamespace(**mods)


def _ref_cfg(**kw):
    """Reference-style attribute-bag config at tiny geometry."""
    d = dict(image_size=(96, 160), out_size=(3, 5), crop_size=(5, 5),
             num_boxes=12, num_frames=10, emb_features=512,
             num_features_boxes=64, num_features_relation=32,
             num_features_gcn=64, num_graph=4, backbone="vgg16",
             train_backbone=True, num_actions=9, num_activities=8,
             train_dropout_prob=0.3, log_path=None, lite_dim=32,
             hierarchical_inference=False, stride=1,
             ST_kernel_size=[(3, 3), (1, 3)], dynamic_sampling=True,
             sampling_ratio=[1], group=1, scale_factor=True,
             beta_factor=True, parallel_inference=False, num_DIM=2)
    d.update(kw)
    return types.SimpleNamespace(**d)


def _our_cfg(ref_cfg, **kw):
    base = dict(
        dataset_name="volleyball", training_stage=2,
        inference_module_name="dynamic_volleyball",
        image_size=ref_cfg.image_size, out_size=ref_cfg.out_size,
        crop_size=ref_cfg.crop_size, num_boxes=ref_cfg.num_boxes,
        num_frames=ref_cfg.num_frames, emb_features=ref_cfg.emb_features,
        num_features_boxes=ref_cfg.num_features_boxes,
        num_features_gcn=ref_cfg.num_features_gcn,
        num_features_relation=ref_cfg.num_features_relation,
        num_graph=ref_cfg.num_graph,
        gcn_layers=getattr(ref_cfg, "gcn_layers", 1),
        pos_threshold=getattr(ref_cfg, "pos_threshold", 0.2),
        backbone=ref_cfg.backbone, train_backbone=ref_cfg.train_backbone,
        num_actions=ref_cfg.num_actions,
        num_activities=ref_cfg.num_activities,
        lite_dim=ref_cfg.lite_dim,
        # raw reference form; Config.kernel_sizes normalises list vs tuple
        ST_kernel_size=ref_cfg.ST_kernel_size,
        sampling_ratio=tuple(ref_cfg.sampling_ratio),
        dynamic_sampling=ref_cfg.dynamic_sampling,
        scale_factor=ref_cfg.scale_factor, beta_factor=ref_cfg.beta_factor,
        hierarchical_inference=ref_cfg.hierarchical_inference,
        num_DIM=ref_cfg.num_DIM, compute_dtype="float32",
        roi_align_impl="onehot", folded_stem=False, frame_chunk=None,
    )
    base.update(kw)
    base = {k: v for k, v in base.items() if v is not None or k == "lite_dim"}
    ds = base.pop("dataset_name")
    return Config(dataset_name=ds).replace(**base)


def _make_inputs(rng, cfg, B=2):
    H, W = cfg.image_size
    OH, OW = cfg.out_size
    T, N = cfg.num_frames, cfg.num_boxes
    images = rng.randint(0, 255, (B, T, H, W, 3)).astype(np.float32)
    x1 = rng.uniform(0, OW - 1.5, (B, T, N)).astype(np.float32)
    y1 = rng.uniform(0, OH - 1.5, (B, T, N)).astype(np.float32)
    w = rng.uniform(0.8, 2.5, (B, T, N)).astype(np.float32)
    h = rng.uniform(0.8, 2.5, (B, T, N)).astype(np.float32)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], axis=-1)
    return images, boxes


def _torch_inputs(images, boxes):
    # boxes MUST be copied: the reference GCN_Module mutates boxes_in_flat
    # in place (gcn_model.py:50-51), and torch.from_numpy shares memory
    # with the numpy array — which jnp.asarray may ALSO alias zero-copy on
    # the CPU backend when the buffer is 64-byte aligned, letting the torch
    # forward corrupt the jax input (flaky, alignment-dependent).
    return (torch.from_numpy(images.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(boxes.copy()))


def _jax_inputs(images, boxes):
    return jnp.asarray(images.astype(np.uint8)), jnp.asarray(boxes)


def _backbone_graft(variables, tm_backbone, backbone_name):
    conv = convert_backbone_state(
        {k: _np(v) for k, v in tm_backbone.state_dict().items()},
        backbone_name)
    nested = {col: {"trunk": {"frames_scan": {"backbone": tree}}}
              for col, tree in conv.items()}
    return graft_variables(variables, nested)


def _embed_port(fc_emb, K, D, nl_emb=None):
    w, b = convert_fc_emb(_np(fc_emb.weight), _np(fc_emb.bias), K, D)
    port = {"fc_emb_1": {"kernel": w, "bias": b}}
    if nl_emb is not None:
        port["nl_emb_1"] = lnorm(nl_emb)
    return port


def _point_port(tm):
    return {
        "point_conv": {"kernel": _np(tm.point_conv.weight)[:, :, 0, 0].T,
                       "bias": _np(tm.point_conv.bias)},
        "point_ln": {"ln": lnorm(tm.point_ln)},
    }


def _randomize_din(dpi, seed):
    """The reference zero-inits DIN's offset/affinity convs
    (dynamic_infer_module.py:56-68); randomise them so the dynamic-walk path
    is exercised non-vacuously."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in dpi.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)


def test_dynamic_volleyball_full_oracle(ref_models, rng):
    """The flagship stage-2 model (vgg16 + lite_dim + Multi-DIN) end-to-end
    (infer_model.py:15-234)."""
    rcfg = _ref_cfg()
    torch.manual_seed(0)
    tm = ref_models.infer_model.Dynamic_volleyball(rcfg)
    _randomize_din(tm.DPI, seed=1)
    tm.eval()

    images, boxes = _make_inputs(rng, rcfg)
    images = np.round(images)  # uint8-exact so both sides see identical pixels
    with torch.no_grad():
        want = tm(_torch_inputs(images, boxes))["activities"].numpy()

    cfg = _our_cfg(rcfg)
    model = build_model(cfg)
    ij, bj = _jax_inputs(images, boxes)
    variables = model.init(jax.random.PRNGKey(0), ij, bj, train=False)
    variables = _backbone_graft(variables, tm.backbone, "vgg16")
    ported = {
        "embed": _embed_port(tm.fc_emb_1, rcfg.crop_size[0],
                             rcfg.emb_features, tm.nl_emb_1),
        **_point_port(tm),
        "DPI": {f"DIM_{i}": _din_port(tm.DPI.DIMlist[i],
                                      rcfg.sampling_ratio, beta=True)
                for i in range(rcfg.num_DIM)},
        "dpi_nl": {"ln": lnorm(tm.dpi_nl)},
        "fc_activities": lin(tm.fc_activities),
    }
    variables = dict(variables,
                     params=graft(variables["params"], ported))
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    got = np.asarray(out["activities"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_basenet_volleyball_full_oracle(ref_models, rng):
    """Stage-1 base model end-to-end (base_model.py:6-142)."""
    rcfg = _ref_cfg(num_frames=3, num_features_boxes=32, lite_dim=None)
    torch.manual_seed(0)
    tm = ref_models.base_model.Basenet_volleyball(rcfg)
    tm.eval()

    images, boxes = _make_inputs(rng, rcfg)
    images = np.round(images)
    with torch.no_grad():
        want_actions, want_acts = tm(_torch_inputs(images, boxes))

    cfg = _our_cfg(rcfg, training_stage=1, lite_dim=None)
    model = build_model(cfg)
    ij, bj = _jax_inputs(images, boxes)
    variables = model.init(jax.random.PRNGKey(0), ij, bj, train=False)
    variables = _backbone_graft(variables, tm.backbone, "vgg16")
    ported = {
        "embed": _embed_port(tm.fc_emb, rcfg.crop_size[0],
                             rcfg.emb_features),
        "fc_actions": lin(tm.fc_actions),
        "fc_activities": lin(tm.fc_activities),
    }
    variables = dict(variables, params=graft(variables["params"], ported))
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    np.testing.assert_allclose(np.asarray(out["actions"]),
                               want_actions.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["activities"]),
                               want_acts.numpy(), rtol=2e-3, atol=2e-3)


def test_train_trajectory_oracle(ref_models, rng):
    """Mini-train trajectory oracle: 5 Adam steps of the reference stage-2
    trainer (torch Adam + F.cross_entropy on frame-0 labels,
    train_net_dynamic.py:94-98,190-216) vs din_tpu's compiled train step
    (train/engine.py make_train_step) from identical ported weights on
    identical batches.  Pins optimizer + loss + BN-train-mode semantics
    jointly — the closest proxy to accuracy parity while the dataset is
    unavailable.  res18 exercises live BatchNorm and the res18 LN ordering.
    """
    import torch.nn.functional as F

    from din_tpu.train.engine import TrainState, make_train_step
    from din_tpu.train.optim import make_optimizer

    lr, n_steps, B = 1e-3, 5, 2
    rcfg = _ref_cfg(backbone="res18", train_dropout_prob=0.0,
                    ST_kernel_size=[(3, 3)], num_DIM=1, lite_dim=32)
    torch.manual_seed(0)
    tm = ref_models.infer_model.Dynamic_volleyball(rcfg)
    _randomize_bn_stats(tm.backbone, seed=2)
    _randomize_din(tm.DPI, seed=1)

    batches = []
    for s in range(n_steps):
        images, boxes = _make_inputs(rng, rcfg, B=B)
        images = np.round(images)
        labels = rng.randint(0, rcfg.num_activities,
                             (B, rcfg.num_frames)).astype(np.int64)
        batches.append((images, boxes, labels))

    # ---- torch trajectory (BN train mode; dropout prob 0) ----
    tm.train()
    opt = torch.optim.Adam([p for p in tm.parameters() if p.requires_grad],
                           lr=lr)
    # port BEFORE the torch run mutates weights/BN stats
    cfg = _our_cfg(rcfg, train_dropout_prob=0.0, train_learning_rate=lr,
                   lr_plan={}, weight_decay=0.0, set_bn_eval=False)
    model = build_model(cfg)
    ij0, bj0 = _jax_inputs(batches[0][0], batches[0][1])
    variables = model.init(jax.random.PRNGKey(0), ij0, bj0, train=False)
    variables = _backbone_graft(variables, tm.backbone, "res18")
    ported = {
        "embed": _embed_port(tm.fc_emb_1, rcfg.crop_size[0],
                             rcfg.emb_features, tm.nl_emb_1),
        **_point_port(tm),
        "DPI": {"DIM_0": _din_port(tm.DPI.DIMlist[0], rcfg.sampling_ratio,
                                   beta=True)},
        "dpi_nl": {"ln": lnorm(tm.dpi_nl)},
        "fc_activities": lin(tm.fc_activities),
    }
    variables = dict(variables, params=graft(variables["params"], ported))
    # deep-copy: jnp.asarray on CPU may alias torch tensor memory, and the
    # torch Adam loop below updates parameters IN PLACE — without the copy
    # the grafted jax params silently track torch's training
    variables = jax.tree_util.tree_map(
        lambda x: jnp.array(np.array(x, copy=True)), variables)

    ref_losses = []
    for images, boxes, labels in batches:
        ti, tb = _torch_inputs(images, boxes)
        out = tm((ti, tb))
        loss = F.cross_entropy(out["activities"],
                               torch.from_numpy(labels[:, 0]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

    # ---- din_tpu trajectory ----
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       rng=jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, tx, frame0_labels=True, has_bn=True,
                           donate=False)
    got_losses = []
    with jax.default_matmul_precision("highest"):
        for images, boxes, labels in batches:
            ij, bj = _jax_inputs(images, boxes)
            batch = {"images": ij, "boxes": bj,
                     "activities": jnp.asarray(labels.astype(np.int32)),
                     "actions": jnp.zeros(
                         (B, rcfg.num_frames, rcfg.num_boxes), jnp.int32)}
            state, metrics = step(state, batch)
            got_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(got_losses, ref_losses, rtol=5e-3, atol=5e-3)


def test_dynamic_collective_full_oracle(ref_models, rng):
    """Dynamic_collective end-to-end (infer_model.py:1135-1319): res18 trunk
    + per-sample true-N loop in torch vs masked MAX_N batching in flax."""
    # Dynamic_collective passes ST_kernel_size straight to a single
    # Dynamic_Person_Inference (infer_model.py:1174-1185), so it is the bare
    # tuple form used by scripts/train_collective_stage2_dynamic.py:47
    rcfg = _ref_cfg(backbone="res18", num_boxes=13, num_frames=4,
                    num_activities=4, num_actions=5, lite_dim=None,
                    ST_kernel_size=(3, 3), num_DIM=1, beta_factor=False)
    torch.manual_seed(0)
    tm = ref_models.infer_model.Dynamic_collective(rcfg)
    _randomize_bn_stats(tm.backbone, seed=2)
    _randomize_din(tm.DPI, seed=3)
    tm.DPI = _Unpack0(tm.DPI)
    tm.eval()

    B = 2
    images, boxes = _make_inputs(rng, rcfg, B=B)
    images = np.round(images)
    counts = np.repeat(rng.randint(5, rcfg.num_boxes + 1, (B, 1)),
                       rcfg.num_frames, axis=1).astype(np.int64)
    # zero out padded boxes like the collective loader (collective.py:199-203)
    n_idx = np.arange(rcfg.num_boxes)[None, None]
    boxes = np.where((n_idx < counts[:, :, None])[..., None], boxes, 0.0)
    ti, tb = _torch_inputs(images, boxes)
    with torch.no_grad():
        want = tm((ti, tb, torch.from_numpy(counts)))["activities"].numpy()

    cfg = _our_cfg(rcfg, dataset_name="collective",
                   inference_module_name="dynamic_collective", lite_dim=None)
    model = build_model(cfg)
    ij, bj = _jax_inputs(images, boxes)
    cj = jnp.asarray(counts.astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), ij, bj, bboxes_num=cj,
                           train=False)
    variables = _backbone_graft(variables, tm.backbone, "res18")
    inner = tm.DPI.inner
    ported = {
        "embed": _embed_port(tm.fc_emb_1, rcfg.crop_size[0],
                             rcfg.emb_features, tm.nl_emb_1),
        "DPI": {"DIM_0": _din_port(inner, rcfg.sampling_ratio)},
        "dpi_nl": {"ln": lnorm(tm.dpi_nl)},
        "fc_activities": lin(tm.fc_activities),
    }
    variables = dict(variables, params=graft(variables["params"], ported))
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, bboxes_num=cj, train=False)
    got = np.asarray(out["activities"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


# ---- remaining stage-2 baselines end-to-end --------------------------------

def _stage2_common(ref_models, rng, rcfg, model_name, tm, B=2):
    """Shared trunk+embed graft for the vgg16 stage-2 baselines."""
    cfg = _our_cfg(rcfg, inference_module_name=model_name)
    model = build_model(cfg)
    images, boxes = _make_inputs(rng, rcfg, B=B)
    images = np.round(images)
    ij, bj = _jax_inputs(images, boxes)
    variables = model.init(jax.random.PRNGKey(0), ij, bj, train=False)
    variables = _backbone_graft(variables, tm.backbone, rcfg.backbone)
    ported = {"embed": _embed_port(tm.fc_emb_1, rcfg.crop_size[0],
                                   rcfg.emb_features, tm.nl_emb_1)}
    return cfg, model, images, boxes, ij, bj, variables, ported


def test_at_volleyball_full_oracle(ref_models, rng):
    """AT_volleyball end-to-end (infer_model.py:736-867): trunk + box PE +
    actor transformer + readout."""
    rcfg = _ref_cfg(num_frames=3, lite_dim=None, temporal_pooled_first=False)
    torch.manual_seed(0)
    tm = ref_models.infer_model.AT_volleyball(rcfg)
    tm.eval()
    cfg, model, images, boxes, ij, bj, variables, ported = _stage2_common(
        ref_models, rng, rcfg, "at_volleyball", tm)
    with torch.no_grad():
        want = tm(_torch_inputs(images, boxes))["activities"].numpy()
    ported["AT"] = {
        "Q_W": lin(tm.AT.Q_W), "K_W": lin(tm.AT.K_W), "V_W": lin(tm.AT.V_W),
        "layernorm1": lnorm(tm.AT.layernorm1),
        "layernorm2": lnorm(tm.AT.layernorm2),
        "FFN_linear1": lin(tm.AT.FFN_linear1),
        "FFN_linear2": lin(tm.AT.FFN_linear2),
    }
    ported["fc_activities"] = lin(tm.fc_activities)
    variables = dict(variables, params=graft(variables["params"], ported))
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    np.testing.assert_allclose(np.asarray(out["activities"]), want,
                               rtol=2e-3, atol=2e-3)


def test_arg_volleyball_full_oracle(ref_models, rng):
    """ARG_volleyball end-to-end incl. the eval-time 3-crop averaging
    (infer_model.py:870-1023): T=9 input -> 3 crops of cfg.num_frames=3."""
    rcfg = _ref_cfg(num_frames=3, lite_dim=None, num_graph=4,
                    gcn_layers=1, pos_threshold=0.2, dataset_name="volleyball")
    torch.manual_seed(0)
    tm = ref_models.infer_model.ARG_volleyball(rcfg)
    tm.eval()

    cfg = _our_cfg(rcfg, inference_module_name="arg_volleyball")
    model = build_model(cfg)
    # dataset yields 9 frames at eval for ARG (volleyball.py:212-214)
    rcfg9 = _ref_cfg(num_frames=9)
    images, boxes = _make_inputs(rng, rcfg9, B=2)
    images = np.round(images)
    ij, bj = _jax_inputs(images, boxes)
    variables = model.init(jax.random.PRNGKey(0), ij, bj, train=False)
    variables = _backbone_graft(variables, tm.backbone, rcfg.backbone)
    ported = {"embed": _embed_port(tm.fc_emb_1, rcfg.crop_size[0],
                                   rcfg.emb_features, tm.nl_emb_1)}
    with torch.no_grad():
        want = tm(_torch_inputs(images, boxes))["activities"].numpy()

    g = tm.gcn_list[0]
    NG = rcfg.num_graph
    ported["gcn_0"] = {
        "theta_kernel": np.stack(
            [_np(g.fc_rn_theta_list[i].weight).T for i in range(NG)]),
        "theta_bias": np.stack(
            [_np(g.fc_rn_theta_list[i].bias) for i in range(NG)]),
        "phi_kernel": np.stack(
            [_np(g.fc_rn_phi_list[i].weight).T for i in range(NG)]),
        "phi_bias": np.stack(
            [_np(g.fc_rn_phi_list[i].bias) for i in range(NG)]),
        "gcn_kernel": np.stack(
            [_np(g.fc_gcn_list[i].weight).T for i in range(NG)]),
        "nl_gcn_scale": np.stack(
            [_np(g.nl_gcn_list[i].weight) for i in range(NG)]),
        "nl_gcn_bias": np.stack(
            [_np(g.nl_gcn_list[i].bias) for i in range(NG)]),
    }
    ported["fc_activities"] = lin(tm.fc_activities)
    variables = dict(variables, params=graft(variables["params"], ported))
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    np.testing.assert_allclose(np.asarray(out["activities"]), want,
                               rtol=2e-3, atol=2e-3)


def test_higcin_volleyball_full_oracle(ref_models, rng):
    """HiGCIN_volleyball end-to-end (infer_model.py:611-733): raw RoI
    features -> BIM (T x K^2 body grid) -> avg pool -> PIM (T x N)."""
    rcfg = _ref_cfg(backbone="res18", num_frames=3, lite_dim=None)
    torch.manual_seed(0)
    tm = ref_models.infer_model.HiGCIN_volleyball(rcfg)
    _randomize_bn_stats(tm, seed=4)      # backbone + CrossInferBlock BNs
    tm.eval()

    cfg = _our_cfg(rcfg, inference_module_name="higcin_volleyball")
    model = build_model(cfg)
    images, boxes = _make_inputs(rng, rcfg, B=2)
    images = np.round(images)
    ij, bj = _jax_inputs(images, boxes)
    variables = model.init(jax.random.PRNGKey(0), ij, bj, train=False)
    variables = _backbone_graft(variables, tm.backbone, "res18")
    with torch.no_grad():
        want = tm(_torch_inputs(images, boxes))["activities"].numpy()

    def cib(m):
        return {"theta": lin(m.theta), "phi": lin(m.phi),
                "fun_g": lin(m.fun_g), "W": lin(m.W),
                "bn": {"scale": _np(m.bn.weight), "bias": _np(m.bn.bias)}}

    def cib_stats(m):
        return {"bn": {"mean": _np(m.bn.running_mean),
                       "var": _np(m.bn.running_var)}}

    ported = {"BIM": cib(tm.BIM), "PIM": cib(tm.PIM),
              "fc_activities": lin(tm.fc_activities)}
    variables = dict(
        variables,
        params=graft(variables["params"], ported),
        # graft leaves the already-ported backbone stats untouched
        batch_stats=graft(variables["batch_stats"],
                          {"BIM": cib_stats(tm.BIM),
                           "PIM": cib_stats(tm.PIM)}))
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    np.testing.assert_allclose(np.asarray(out["activities"]), want,
                               rtol=2e-3, atol=2e-3)


def test_sacrf_biute_volleyball_full_oracle(ref_models, rng):
    """SACRF_BiUTE_volleyball end-to-end (infer_model.py:1026-1131):
    actions + activities + halting loss."""
    rcfg = _ref_cfg(num_frames=3, lite_dim=None, num_features_boxes=32)
    torch.manual_seed(0)
    tm = ref_models.infer_model.SACRF_BiUTE_volleyball(rcfg)
    tm.eval()
    cfg, model, images, boxes, ij, bj, variables, ported = _stage2_common(
        ref_models, rng, rcfg, "sacrf_biute_volleyball", tm)
    with torch.no_grad():
        want = tm(_torch_inputs(images, boxes))
    s = tm.SACRF
    ported["SACRF"] = {
        "f_u": lin(s.f_u),
        "spatial_att": dict(_att_block_port(s.spatial_att, 8),
                            w=_np(s.spatial_att.w)),
        "temporal_att": _att_block_port(s.temporal_att, 8),
        "f_spatil_att": lin(s.f_spatil_att),
        "f_temporal_att": lin(s.f_temporal_att),
        "compatible_trans_s": lin(s.compatible_trans_s),
        "compatible_trans_t": lin(s.compatible_trans_t),
        "halt_fc": lin(s.halt_fc),
    }
    ported["BiUTE"] = {"q": lin(tm.BiUTE.q)}
    ported["fc_activities"] = lin(tm.fc_activities)
    variables = dict(variables, params=graft(variables["params"], ported))
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    np.testing.assert_allclose(np.asarray(out["actions"]),
                               want["actions"].numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["activities"]),
                               want["activities"].numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(out["halting"]),
                               float(want["halting"]), rtol=1e-3)


def test_pctdm_volleyball_full_oracle(ref_models, rng):
    """PCTDM_volleyball end-to-end (infer_model.py:472-608).  The reference
    PCTDM hardcodes input_size=1024, so NFB=1024 here."""
    rcfg = _ref_cfg(num_frames=2, lite_dim=None, num_features_boxes=1024)
    torch.manual_seed(0)
    tm = ref_models.infer_model.PCTDM_volleyball(rcfg)
    tm.eval()
    cfg, model, images, boxes, ij, bj, variables, ported = _stage2_common(
        ref_models, rng, rcfg, "pctdm_volleyball", tm, B=1)
    with torch.no_grad():
        want = tm(_torch_inputs(images, boxes))["activities"].numpy()
    ported["pctdm"] = {
        "Bi_Lstm": {"fwd": lstm(tm.pctdm.Bi_Lstm),
                    "bwd": lstm(tm.pctdm.Bi_Lstm, "_reverse")},
        "att_source_weights": lin(tm.pctdm.att_source_weights[0]),
        "att_context_weights": lin(tm.pctdm.att_context_weights[0]),
        "att_extra_weights": lin(tm.pctdm.att_extra_weights[0]),
        "Intra_Group_LSTM": lstm(tm.pctdm.Intra_Group_LSTM),
    }
    ported["pctdm_nl"] = {"ln": lnorm(tm.pctdm_nl)}
    ported["fc_activities"] = lin(tm.fc_activities)
    variables = dict(variables, params=graft(variables["params"], ported))
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    np.testing.assert_allclose(np.asarray(out["activities"]), want,
                               rtol=2e-3, atol=2e-3)


def _gcn_port(g, NG):
    return {
        "theta_kernel": np.stack(
            [_np(g.fc_rn_theta_list[i].weight).T for i in range(NG)]),
        "theta_bias": np.stack(
            [_np(g.fc_rn_theta_list[i].bias) for i in range(NG)]),
        "phi_kernel": np.stack(
            [_np(g.fc_rn_phi_list[i].weight).T for i in range(NG)]),
        "phi_bias": np.stack(
            [_np(g.fc_rn_phi_list[i].bias) for i in range(NG)]),
        "gcn_kernel": np.stack(
            [_np(g.fc_gcn_list[i].weight).T for i in range(NG)]),
        "nl_gcn_scale": np.stack(
            [_np(g.nl_gcn_list[i].weight) for i in range(NG)]),
        "nl_gcn_bias": np.stack(
            [_np(g.nl_gcn_list[i].bias) for i in range(NG)]),
    }


def test_dynamic_tce_volleyball_full_oracle(ref_models, rng):
    """Dynamic_TCE_volleyball end-to-end (infer_model.py:237-468): trunk +
    512-ch context sine PE + 4-head TCE cross-attention concat + Multi-DIN +
    vgg16 readout.  person_mat_shape is hardcoded (10, 12) -> T=10, N=12."""
    from test_reference_oracle import _tce_port
    rcfg = _ref_cfg(lite_dim=None, ST_kernel_size=[(3, 3)], num_DIM=1)
    torch.manual_seed(0)
    tm = ref_models.infer_model.Dynamic_TCE_volleyball(rcfg)
    _randomize_din(tm.DPI, seed=5)
    tm.eval()
    cfg, model, images, boxes, ij, bj, variables, ported = _stage2_common(
        ref_models, rng, rcfg, "dynamic_tce_volleyball", tm, B=1)
    with torch.no_grad():
        want = tm(_torch_inputs(images, boxes))["activities"].numpy()
    mh = tm.multilayer_head_embfeature_context_encoding
    ported["tce"] = {f"CET_0_{j}": _tce_port(mh.CET[j], 1) for j in range(4)}
    ported["DPI"] = {"DIM_0": _din_port(tm.DPI.DIMlist[0],
                                        rcfg.sampling_ratio, beta=True)}
    ported["dpi_nl"] = {"ln": lnorm(tm.dpi_nl)}
    ported["fc_activities"] = lin(tm.fc_activities)
    variables = dict(variables, params=graft(variables["params"], ported))
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    np.testing.assert_allclose(np.asarray(out["activities"]), want,
                               rtol=2e-3, atol=2e-3)


def test_gcnnet_volleyball_full_oracle(ref_models, rng):
    """Legacy GCNnet_volleyball end-to-end (gcn_model.py:89-253): actions +
    activities heads, GCN residual, eval-time 3-crop averaging."""
    sys.path.insert(0, _REF)
    try:
        gcn_model = importlib.import_module("gcn_model")
    finally:
        sys.path.remove(_REF)
    rcfg = _ref_cfg(num_frames=3, lite_dim=None, num_graph=4, gcn_layers=1,
                    pos_threshold=0.2, dataset_name="volleyball")
    torch.manual_seed(0)
    tm = gcn_model.GCNnet_volleyball(rcfg)
    tm.eval()

    cfg = _our_cfg(rcfg, inference_module_name="gcnnet_volleyball")
    model = build_model(cfg)
    rcfg9 = _ref_cfg(num_frames=9)
    images, boxes = _make_inputs(rng, rcfg9, B=2)
    images = np.round(images)
    ij, bj = _jax_inputs(images, boxes)
    variables = model.init(jax.random.PRNGKey(0), ij, bj, train=False)
    variables = _backbone_graft(variables, tm.backbone, rcfg.backbone)
    ported = {
        "embed": _embed_port(tm.fc_emb_1, rcfg.crop_size[0],
                             rcfg.emb_features, tm.nl_emb_1),
        "gcn_0": _gcn_port(tm.gcn_list[0], rcfg.num_graph),
        "fc_actions": lin(tm.fc_actions),
        "fc_activities": lin(tm.fc_activities),
    }
    with torch.no_grad():
        want_actions, want_acts = tm(_torch_inputs(images, boxes))
    variables = dict(variables, params=graft(variables["params"], ported))
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, ij, bj, train=False)
    np.testing.assert_allclose(np.asarray(out["actions"]),
                               want_actions.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["activities"]),
                               want_acts.numpy(), rtol=2e-3, atol=2e-3)
