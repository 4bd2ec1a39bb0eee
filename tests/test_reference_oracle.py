"""Import-oracle tests: pin every reasoning head to the reference torch
implementation.

The reference's infer modules are pure PyTorch (torch is installed); they are
imported from /root/reference (read-only, never copied), their randomly
initialised weights are ported into the din_tpu flax modules, and outputs are
asserted bit-close.  This turns "re-derived from the paper" into "provably
the same function" for:

  * Actor_Transformer            (AT_infer_module.py:100-144)
  * BiUTE                        (SACRF_BiUTE_infer_module.py:340-414)
  * SACRF                        (SACRF_BiUTE_infer_module.py:261-337)
  * PCTDM                        (pctdm_infer_module.py:9-133)
  * STBilinearMessagingPassing   (TCE_STBiP_module.py:12-103)
  * EmbfeatureContextEncoding    (TCE_STBiP_module.py:224-312)
  * Dynamic_Person_Inference     (dynamic_infer_module.py:14-404) incl. the
    dynamic, plain and parallel paths and Multi_Dynamic_Inference

The reference modules import unavailable packages (thop, fvcore,
torchvision, roi_align CUDA ext); those are stubbed in sys.modules before
import — only module objects, no reference code is replaced.
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_REF = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref():
    """Import the reference infer modules with their heavy deps stubbed."""
    _stub("thop", profile=lambda *a, **k: (0, 0),
          clever_format=lambda x, f: x)
    tv_models = _stub("torchvision.models")
    tv_tf = _stub("torchvision.transforms", Normalize=object)
    _stub("torchvision", models=tv_models, transforms=tv_tf)
    fv_nn = _stub("fvcore.nn", activation_count=None, flop_count=None,
                  parameter_count=None, parameter_count_table=None)
    _stub("fvcore", nn=fv_nn)
    ra = _stub("roi_align.roi_align", RoIAlign=object)
    _stub("roi_align", roi_align=ra)
    _stub("cv2", resize=None)
    sk_io = _stub("skimage.io", imread=None)
    sk_tf = _stub("skimage.transform", resize=None)
    _stub("skimage", io=sk_io, transform=sk_tf)

    sys.path.insert(0, _REF)
    try:
        mods = {}
        for name in ("dynamic_infer_module", "SACRF_BiUTE_infer_module",
                     "pctdm_infer_module", "AT_infer_module",
                     "TCE_STBiP_module", "higcin_infer_module"):
            mods[name] = importlib.import_module(f"infer_module.{name}")
        mods["volleyball"] = importlib.import_module("volleyball")
    finally:
        sys.path.remove(_REF)
    return types.SimpleNamespace(**mods)


# ---- weight-port helpers ---------------------------------------------------

def _np(t):
    return t.detach().cpu().numpy()


def lin(m):
    """torch nn.Linear -> flax Dense param dict."""
    d = {"kernel": _np(m.weight).T}
    if m.bias is not None:
        d["bias"] = _np(m.bias)
    return d


def lnorm(m):
    """torch nn.LayerNorm -> flax LayerNorm param dict."""
    return {"scale": _np(m.weight), "bias": _np(m.bias)}


def conv2d(m):
    """torch nn.Conv2d [O,I,kh,kw] -> flax Conv kernel [kh,kw,I,O]."""
    d = {"kernel": _np(m.weight).transpose(2, 3, 1, 0)}
    if m.bias is not None:
        d["bias"] = _np(m.bias)
    return d


def lstm(torch_lstm, suffix=""):
    """torch nn.LSTM params (one direction) -> din_tpu TorchLSTM dict."""
    sd = torch_lstm.state_dict()
    return {
        "kernel_i": _np(sd[f"weight_ih_l0{suffix}"]).T,
        "kernel_h": _np(sd[f"weight_hh_l0{suffix}"]).T,
        "bias": _np(sd[f"bias_ih_l0{suffix}"] + sd[f"bias_hh_l0{suffix}"]),
    }


def graft(initialized, ported, path="params"):
    """Replace leaves of the initialized tree with ported values; every
    ported key must exist with the same shape (catches name/shape drift)."""
    out = {}
    extra = set(ported) - set(initialized)
    assert not extra, f"ported keys missing from module at {path}: {extra}"
    for k, v in initialized.items():
        if k not in ported:
            out[k] = v
        elif isinstance(v, dict):
            out[k] = graft(v, ported[k], f"{path}/{k}")
        else:
            pv = np.asarray(ported[k])
            assert tuple(v.shape) == pv.shape, \
                f"shape mismatch at {path}/{k}: {v.shape} vs {pv.shape}"
            out[k] = jnp.asarray(pv, dtype=v.dtype)
    return out


def _randomize(module, std=0.1, seed=0):
    """Randomise every parameter of a torch module (the reference zero-inits
    its offset convs — dynamic_infer_module.py:66-67,80-81 — which would make
    the parity test vacuous)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * std)


# ---- Actor Transformer -----------------------------------------------------

def test_at_oracle(ref, rng):
    from din_tpu.heads.at import ActorTransformer
    B, T, N, C = 2, 3, 12, 32
    x = rng.randn(B, T, N, C).astype(np.float32)
    tm = ref.AT_infer_module.Actor_Transformer(C, temporal_pooled_first=False)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    mod = ActorTransformer(in_dim=C)
    xr = jnp.asarray(x.reshape(B * T, N, C))
    v = mod.init(jax.random.PRNGKey(0), xr)
    ported = {
        "Q_W": lin(tm.Q_W), "K_W": lin(tm.K_W), "V_W": lin(tm.V_W),
        "layernorm1": lnorm(tm.layernorm1), "layernorm2": lnorm(tm.layernorm2),
        "FFN_linear1": lin(tm.FFN_linear1), "FFN_linear2": lin(tm.FFN_linear2),
    }
    out = mod.apply({"params": graft(v["params"], ported)}, xr,
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_at_temporal_pooled_oracle(ref, rng):
    from din_tpu.heads.at import ActorTransformer
    B, T, N, C = 2, 4, 6, 16
    x = rng.randn(B, T, N, C).astype(np.float32)
    tm = ref.AT_infer_module.Actor_Transformer(C, temporal_pooled_first=True)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    mod = ActorTransformer(in_dim=C)
    xr = jnp.asarray(x.mean(axis=1))  # caller pools T first (AT:125-126)
    v = mod.init(jax.random.PRNGKey(0), xr)
    ported = {
        "Q_W": lin(tm.Q_W), "K_W": lin(tm.K_W), "V_W": lin(tm.V_W),
        "layernorm1": lnorm(tm.layernorm1), "layernorm2": lnorm(tm.layernorm2),
        "FFN_linear1": lin(tm.FFN_linear1), "FFN_linear2": lin(tm.FFN_linear2),
    }
    out = mod.apply({"params": graft(v["params"], ported)}, xr,
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


# ---- BiUTE -----------------------------------------------------------------

def test_biute_oracle(ref, rng):
    from din_tpu.heads.sacrf_biute import BiUTE
    B, T, N, C = 2, 4, 12, 16
    x = rng.randn(B, T, N, C).astype(np.float32)
    tm = ref.SACRF_BiUTE_infer_module.BiUTE(C, N)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    mod = BiUTE(in_dim=C, num_boxes=N)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply({"params": graft(v["params"], {"q": lin(tm.q)})},
                    jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


# ---- STBilinear ------------------------------------------------------------

def _stbilinear_port(tm):
    return {
        "U": lin(tm.U), "V": lin(tm.V), "w_a": _np(tm.w_a),
        "W_e2": lin(tm.W_e2), "W_e1": lin(tm.W_e1),
        "layernorm": lnorm(tm.layernorm),
    }


def test_stbilinear_oracle(ref, rng):
    from din_tpu.heads.tce import STBilinearMessagePassing
    B, T, N, C, M = 2, 3, 6, 16, 12
    x = rng.randn(B * T, N, C).astype(np.float32)
    mask = rng.rand(B, T * N, T * N) < 0.3
    mask[:, :, 0] = False  # keep every softmax row finite
    tm = ref.TCE_STBiP_module.STBilinearMessagingPassing(C, M, T=T)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(mask)).numpy()
    mod = STBilinearMessagePassing(emb_dim=C, message_dim=M, T=T)
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    v = mod.init(jax.random.PRNGKey(0), xj, mj)
    out = mod.apply({"params": graft(v["params"], _stbilinear_port(tm))},
                    xj, mj)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("fusion,shortcut", [("sum", False), ("sum", True),
                                             ("cat", False)])
def test_multihead_stbilinear_oracle(ref, rng, fusion, shortcut):
    from din_tpu.heads.tce import MultiHeadSTBilinear
    B, T, N, C, M, H = 1, 3, 4, 8, 8, 2
    x = rng.randn(B * T, N, C).astype(np.float32)
    mask = rng.rand(B, T * N, T * N) < 0.3
    mask[:, :, 0] = False
    tm = ref.TCE_STBiP_module.multiheadSTBilinearMessagingPassing(C, M, H, T=T)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(mask), fusion,
                  shortcut_connection=shortcut).numpy()
    mod = MultiHeadSTBilinear(emb_dim=C, message_dim=M, num_heads=H, T=T)
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    v = mod.init(jax.random.PRNGKey(0), xj, mj)
    ported = {f"bilinear_{i}": _stbilinear_port(tm.bilinear_list[i])
              for i in range(H)}
    out = mod.apply({"params": graft(v["params"], ported)}, xj, mj,
                    fusion_method=fusion, shortcut_connection=shortcut)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_spatial_mask_oracle(ref, rng):
    from din_tpu.heads.tce import generate_spatial_mask
    BT, N, OH = 6, 12, 45
    boxes = rng.uniform(0, 80, (BT * N, 4)).astype(np.float32)
    want = ref.TCE_STBiP_module.generate_spatial_mask(
        torch.from_numpy(boxes), 0.3, BT, N, OH).numpy()
    got = generate_spatial_mask(jnp.asarray(boxes.reshape(BT, N, 4)), 0.3, OH)
    np.testing.assert_array_equal(np.asarray(got), want)


# ---- PCTDM -----------------------------------------------------------------

def test_pctdm_oracle(ref, rng):
    from din_tpu.heads.pctdm import PCTDM
    B, T, N, NFB = 1, 2, 12, 1024
    x = rng.randn(B, T, N, NFB).astype(np.float32)
    cfg = types.SimpleNamespace(num_boxes=N, num_activities=8)
    tm = ref.pctdm_infer_module.PCTDM(cfg)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    mod = PCTDM(num_players=N, input_size=NFB, hidden=1000)
    xj = jnp.asarray(x)
    v = mod.init(jax.random.PRNGKey(0), xj)
    ported = {
        "Bi_Lstm": {"fwd": lstm(tm.Bi_Lstm),
                    "bwd": lstm(tm.Bi_Lstm, "_reverse")},
        "att_source_weights": lin(tm.att_source_weights[0]),
        "att_context_weights": lin(tm.att_context_weights[0]),
        "att_extra_weights": lin(tm.att_extra_weights[0]),
        "Intra_Group_LSTM": lstm(tm.Intra_Group_LSTM),
    }
    out = mod.apply({"params": graft(v["params"], ported)}, xj)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-4)


# ---- SACRF -----------------------------------------------------------------

def _selfatt_port(tm):
    return {"theta": lin(tm.theta), "phi": lin(tm.phi),
            "fun_g": lin(tm.fun_g)}


def _att_block_port(tm, num_att):
    d = {f"att_{i}": _selfatt_port(tm.attlist[i]) for i in range(num_att)}
    d.update({"W_out": lin(tm.W_out), "layernorm1": lnorm(tm.layernorm1),
              "FFN_linear1": lin(tm.FFN_linear1),
              "FFN_linear2": lin(tm.FFN_linear2)})
    return d


def test_sacrf_oracle(ref, rng):
    from din_tpu.heads.sacrf_biute import SACRF
    B, T, N, C, A = 1, 2, 12, 32, 9
    image_size, out_size = (720, 1280), (87, 157)
    x = rng.randn(B, T, N, C).astype(np.float32)
    boxes = rng.uniform(0, 80, (B, T, N, 4)).astype(np.float32)
    cfg = types.SimpleNamespace(image_size=image_size, out_size=out_size)
    tm = ref.SACRF_BiUTE_infer_module.SACRF(cfg, C, A)
    tm.eval()
    with torch.no_grad():
        q_ref, c_ref, loss_ref = tm(torch.from_numpy(x),
                                    torch.from_numpy(boxes.reshape(-1, 4)))

    mod = SACRF(in_dim=C, num_actions=A, image_size=image_size,
                out_size=out_size)
    xj, bj = jnp.asarray(x), jnp.asarray(boxes)
    v = mod.init(jax.random.PRNGKey(0), xj, bj)
    ported = {
        "f_u": lin(tm.f_u),
        "spatial_att": dict(_att_block_port(tm.spatial_att, 8),
                            w=_np(tm.spatial_att.w)),
        "temporal_att": _att_block_port(tm.temporal_att, 8),
        "f_spatil_att": lin(tm.f_spatil_att),
        "f_temporal_att": lin(tm.f_temporal_att),
        "compatible_trans_s": lin(tm.compatible_trans_s),
        "compatible_trans_t": lin(tm.compatible_trans_t),
        "halt_fc": lin(tm.halt_fc),
    }
    q, c_v, halt_loss = mod.apply({"params": graft(v["params"], ported)},
                                  xj, bj, deterministic=True)
    np.testing.assert_allclose(np.asarray(q), q_ref.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_v), c_ref.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(float(halt_loss), float(loss_ref), rtol=1e-4)


# ---- TCE (Embfeature context encoding) -------------------------------------

def _tce_port(tm, layer_id):
    d = {
        "downsample": conv2d(tm.downsample2 if layer_id == 1
                             else tm.downsample),
        "emb_roi": lin(tm.emb_roi),
        "layernorm1": lnorm(tm.layernorm1), "layernorm2": lnorm(tm.layernorm2),
        "FFN_1": lin(tm.FFN[0]), "FFN_2": lin(tm.FFN[3]),
    }
    # 1x1 conv [O,I,1,1] -> Dense kernel [I,O]
    d["downsample"] = {"kernel": d["downsample"]["kernel"][0, 0],
                       "bias": d["downsample"]["bias"]}
    return d


def test_tce_oracle(ref, rng):
    from din_tpu.heads.tce import MultiHeadTCE
    BT, N, NFB, NFC, OH, OW, D = 3, 12, 64, 32, 7, 9, 512
    heads, layers = 2, 2
    roi = rng.randn(BT * N, NFB).astype(np.float32)
    img = rng.randn(BT, D, OH, OW).astype(np.float32)
    tm = ref.TCE_STBiP_module.MultiHeadLayerEmbfeatureContextEncoding(
        heads, layers, NFC, NFB, 5, N)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(roi), torch.from_numpy(img)).numpy()

    mod = MultiHeadTCE(num_heads=heads, num_layers=layers,
                       num_features_context=NFC)
    rj = jnp.asarray(roi.reshape(BT, N, NFB))
    ij = jnp.asarray(img.transpose(0, 2, 3, 1))
    v = mod.init(jax.random.PRNGKey(0), rj, ij)
    ported = {}
    for i in range(layers):
        for j in range(heads):
            ported[f"CET_{i}_{j}"] = _tce_port(tm.CET[i * heads + j], i + 1)
    out = mod.apply({"params": graft(v["params"], ported)}, rj, ij,
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(out).reshape(want.shape), want,
                               rtol=1e-3, atol=1e-4)


def _conv1x1(m):
    """torch 1x1 Conv2d [O,I,1,1] -> flax Dense kernel [I,O]."""
    return {"kernel": _np(m.weight)[:, :, 0, 0].T, "bias": _np(m.bias)}


def _raw_tce_port(tm, layer_id, K, NFC):
    d = {
        "layernorm1": lnorm(tm.layernorm1), "layernorm2": lnorm(tm.layernorm2),
        "FFN_1": lin(tm.FFN[0]), "FFN_2": lin(tm.FFN[3]),
    }
    if layer_id == 1:
        d["downsample1"] = _conv1x1(tm.downsample1)
        d["downsample2"] = _conv1x1(tm.downsample2)
        # torch flattens the downsampled roi channel-major (c,i,j)
        # (TCE_STBiP_module.py:172); ours is position-major (i,j,c)
        w = _np(tm.emb_roi.weight)                        # [NFC, NFC*K*K]
        w = w.reshape(NFC, NFC, K, K).transpose(0, 2, 3, 1).reshape(NFC, -1)
        d["emb_roi"] = {"kernel": w.T, "bias": _np(tm.emb_roi.bias)}
    else:
        d["downsample"] = _conv1x1(tm.downsample)
        d["emb_roi"] = lin(tm.emb_roi)
    return d


def test_raw_roi_tce_oracle(ref, rng):
    """Raw-RoI MultiHeadLayerContextEncoding (TCE_STBiP_module.py:129-221):
    layer 1 consumes the raw RoIAlign crop, the context conv is hardcoded to
    768 input channels in the reference."""
    from din_tpu.heads.tce import MultiHeadLayerContextEncoding
    BT, N, D, K, NFC, OH, OW = 3, 12, 24, 5, 16, 7, 9
    heads, layers = 2, 2
    roi = rng.randn(BT * N, D, K, K).astype(np.float32)
    img = rng.randn(BT, 768, OH, OW).astype(np.float32)
    tm = ref.TCE_STBiP_module.MultiHeadLayerContextEncoding(
        heads, layers, NFC, D, K, N)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(roi), torch.from_numpy(img)).numpy()

    mod = MultiHeadLayerContextEncoding(num_heads=heads, num_layers=layers,
                                        num_features_context=NFC)
    rj = jnp.asarray(roi.reshape(BT, N, D, K, K).transpose(0, 1, 3, 4, 2))
    ij = jnp.asarray(img.transpose(0, 2, 3, 1))
    v = mod.init(jax.random.PRNGKey(0), rj, ij)
    ported = {}
    for i in range(layers):
        for j in range(heads):
            ported[f"CET_{i}_{j}"] = _raw_tce_port(
                tm.CET[i * heads + j], i + 1, K, NFC)
    out = mod.apply({"params": graft(v["params"], ported)}, rj, ij,
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(out).reshape(want.shape), want,
                               rtol=1e-3, atol=1e-4)


def test_volley_random_frames_oracle(ref):
    """volley_random_frames (reference volleyball.py:83-88): exact draw
    parity against the reference under a seeded global numpy RNG."""
    from din_tpu.data.volleyball import volley_random_frames
    data = {1: {10: None, 20: None, 30: None},
            4: {11: None}, 9: {5: None, 6: None}}
    np.random.seed(123)
    want = ref.volleyball.volley_random_frames(data, 7)
    np.random.seed(123)
    got = volley_random_frames(data, 7)
    assert [(int(s), int(f)) for s, f in want] == got
    for sid, fid in got:
        assert fid in data[sid]


# ---- DIN (Dynamic Person Inference) ----------------------------------------

def _din_port(tm, ratios, beta=False):
    d = {"hidden_weight": lin(tm.hidden_weight)}
    for r in ratios:
        if hasattr(tm, "p_conv") and str(r) in tm.p_conv:
            d[f"p_conv_{r}"] = conv2d(tm.p_conv[str(r)])
        if hasattr(tm, "scale_conv") and str(r) in tm.scale_conv:
            d[f"scale_conv_{r}"] = conv2d(tm.scale_conv[str(r)])
    if beta:
        d["beta"] = _np(tm.beta)
    return d


@pytest.mark.parametrize("ks,ratios", [((3, 3), (1,)), ((1, 3), (1, 2)),
                                       ((3, 1), (1,))])
def test_din_dynamic_oracle(ref, rng, ks, ratios):
    """Dynamic walk + affinity + beta mixing + MAD tensor
    (dynamic_infer_module.py:121-282)."""
    from din_tpu.heads.din import DynamicPersonInference
    B, T, N, C = 2, 5, 6, 16
    x = rng.randn(B, T, N, C).astype(np.float32)
    tm = ref.dynamic_infer_module.Dynamic_Person_Inference(
        in_dim=C, person_mat_shape=(T, N), kernel_size=ks,
        dynamic_sampling=True, sampling_ratio=list(ratios),
        scale_factor=True, beta_factor=True)
    _randomize(tm, std=0.2, seed=3)
    tm.eval()
    with torch.no_grad():
        want, want_mad = tm(torch.from_numpy(x))

    mod = DynamicPersonInference(
        in_dim=C, kernel_size=ks, dynamic_sampling=True,
        sampling_ratio=ratios, scale_factor=True, beta_factor=True)
    xj = jnp.asarray(x)
    v = mod.init(jax.random.PRNGKey(0), xj)
    vp = {"params": graft(v["params"], _din_port(tm, ratios, beta=True))}
    out, mad = mod.apply(vp, xj, return_mad=True)
    np.testing.assert_allclose(np.asarray(out), want.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(mad), want_mad.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_din_plain_oracle(ref, rng):
    """Plain (non-dynamic) path (dynamic_infer_module.py:154-181).  The
    reference forward raises NameError on this path (ft_infer_MAD unbound,
    dynamic_infer_module.py:151), so plain_infer_ratio + the forward's
    mixing (lines 142-149) are driven directly."""
    from din_tpu.heads.din import DynamicPersonInference
    B, T, N, C = 2, 4, 6, 12
    ratios = (1, 2)
    x = rng.randn(B, T, N, C).astype(np.float32)
    tm = ref.dynamic_infer_module.Dynamic_Person_Inference(
        in_dim=C, person_mat_shape=(T, N), kernel_size=(3, 3),
        dynamic_sampling=False, sampling_ratio=list(ratios),
        scale_factor=True, beta_factor=False)
    _randomize(tm, std=0.2, seed=4)
    tm.eval()
    with torch.no_grad():
        pf = torch.from_numpy(x).permute(0, 3, 1, 2)
        fts = [tm.plain_infer_ratio(pf, r) for r in ratios]
        want = tm.hidden_weight(torch.stack(fts, dim=4).mean(dim=4)).numpy()

    mod = DynamicPersonInference(
        in_dim=C, kernel_size=(3, 3), dynamic_sampling=False,
        sampling_ratio=ratios, scale_factor=True, beta_factor=False)
    xj = jnp.asarray(x)
    v = mod.init(jax.random.PRNGKey(0), xj)
    vp = {"params": graft(v["params"], _din_port(tm, ratios))}
    out, _ = mod.apply(vp, xj)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-4)


def test_din_parallel_oracle(ref, rng):
    """Parallel inference path (dynamic_infer_module.py:285-341); like the
    plain path, the reference forward's MAD return is unbound here, so
    parallel_infer + the mixing (lines 142-149) are driven directly."""
    from din_tpu.heads.din import DynamicPersonInference
    B, T, N, C = 2, 5, 6, 16
    ratios = (1,)
    x = rng.randn(B, T, N, C).astype(np.float32)
    tm = ref.dynamic_infer_module.Dynamic_Person_Inference(
        in_dim=C, person_mat_shape=(T, N), kernel_size=(3, 3),
        dynamic_sampling=True, sampling_ratio=list(ratios),
        scale_factor=True, beta_factor=True, parallel_inference=True)
    _randomize(tm, std=0.2, seed=5)
    tm.eval()
    with torch.no_grad():
        pf = torch.from_numpy(x).permute(0, 3, 1, 2)
        fts = [tm.parallel_infer(pf, r) for r in ratios]
        stacked = torch.stack(fts, dim=4)
        want = tm.hidden_weight((tm.beta * stacked).sum(dim=-1)).numpy()

    mod = DynamicPersonInference(
        in_dim=C, kernel_size=(3, 3), dynamic_sampling=True,
        sampling_ratio=ratios, scale_factor=True, beta_factor=True,
        parallel_inference=True)
    xj = jnp.asarray(x)
    v = mod.init(jax.random.PRNGKey(0), xj)
    vp = {"params": graft(v["params"], _din_port(tm, ratios, beta=True))}
    out, _ = mod.apply(vp, xj)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-4)


def test_multi_din_oracle(ref, rng):
    from din_tpu.heads.din import MultiDynamicInference
    B, T, N, C = 1, 4, 6, 12
    ks = [(3, 3), (1, 3)]
    x = rng.randn(B, T, N, C).astype(np.float32)
    tm = ref.dynamic_infer_module.Multi_Dynamic_Inference(
        in_dim=C, person_mat_shape=(T, N), kernel_size=ks,
        dynamic_sampling=True, sampling_ratio=[1], scale_factor=True,
        beta_factor=False, num_DIM=2)
    _randomize(tm, std=0.2, seed=6)
    tm.eval()
    with torch.no_grad():
        want, want_mad = tm(torch.from_numpy(x))

    mod = MultiDynamicInference(
        in_dim=C, kernel_sizes=tuple(tuple(k) for k in ks),
        dynamic_sampling=True, sampling_ratio=(1,), scale_factor=True,
        beta_factor=False)
    xj = jnp.asarray(x)
    v = mod.init(jax.random.PRNGKey(0), xj)
    ported = {f"DIM_{i}": _din_port(tm.DIMlist[i], (1,)) for i in range(2)}
    out, mad = mod.apply({"params": graft(v["params"], ported)}, xj,
                         return_mad=True)
    np.testing.assert_allclose(np.asarray(out), want.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(mad), want_mad.numpy(), rtol=1e-3,
                               atol=1e-4)


# ---- HiGCIN CrossInferBlock ------------------------------------------------

def test_higcin_cross_infer_oracle(ref, rng):
    from din_tpu.heads.higcin import CrossInferBlock
    B, T, N, C = 1, 3, 4, 8
    x = rng.randn(B, T, N, C).astype(np.float32)
    tm = ref.higcin_infer_module.CrossInferBlock(in_dim=C, Temporal=T,
                                                 Spatial=N)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    mod = CrossInferBlock(in_dim=C)
    xj = jnp.asarray(x)
    v = mod.init(jax.random.PRNGKey(0), xj)
    ported = {
        "theta": lin(tm.theta), "phi": lin(tm.phi), "fun_g": lin(tm.fun_g),
        "W": lin(tm.W),
        "bn": {"scale": _np(tm.bn.weight), "bias": _np(tm.bn.bias)},
    }
    variables = {"params": graft(v["params"], ported)}
    if "batch_stats" in v:
        bs = {"bn": {"mean": _np(tm.bn.running_mean),
                     "var": _np(tm.bn.running_var)}}
        variables["batch_stats"] = graft(v["batch_stats"], bs)
    out = mod.apply(variables, xj)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-4)
