"""Import torch checkpoints saved BY THE REFERENCE FRAMEWORK into din_tpu.

Two on-disk formats exist there:

  * **stage-1 component files** (base_model.py:46-54 ``savemodel``):
    ``{'backbone_state_dict', 'fc_emb_state_dict', 'fc_actions_state_dict',
    'fc_activities_state_dict'}`` — what ``loadmodel``
    (infer_model.py:122-126) consumes for stage-2 init;
  * **full-model files** (train_net.py:120-127): ``{'epoch', 'state_dict',
    'optimizer'}`` with flat ``model.state_dict()`` keys — what
    ``loadpart``/resume consume.

``load_reference_checkpoint`` detects the format and grafts every
recognised tensor into a din_tpu variables tree (converted to NHWC/flax
layouts via nn/torch_port.py), so models trained with the reference can be
evaluated or fine-tuned here directly.  The state-dict converter covers
the trunk surface shared by all models (backbone / fc_emb_1 / nl_emb_1)
plus every head family: DIN (plain/Multi, infer_model.py:20-140), AT
(:736-867), ARG / legacy GCNnet (:870-1023, gcn_model.py:89-253), HiGCIN
(:611-733), SACRF+BiUTE (:1026-1131), PCTDM (:472-608) and TCE
(:237-468); unrecognised keys are returned in the report rather than
failing, mirroring the reference's tolerant ``loadpart``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from din_tpu.nn.torch_port import (convert_backbone_state, convert_fc_emb,
                                   graft_variables)


def _lin(w, b=None):
    d = {"kernel": np.asarray(w).T}
    if b is not None:
        d["bias"] = np.asarray(b)
    return d


def _ln(w, b):
    return {"scale": np.asarray(w), "bias": np.asarray(b)}


def _conv_hwio(w, b=None):
    d = {"kernel": np.asarray(w).transpose(2, 3, 1, 0)}
    if b is not None:
        d["bias"] = np.asarray(b)
    return d


def _group(flat: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in flat.items()
            if k.startswith(prefix)}


def _convert_din(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Keys relative to ONE Dynamic_Person_Inference module
    (dynamic_infer_module.py:40-82: hidden_weight is bias-free, p_conv /
    scale_conv are ModuleDicts keyed by str(ratio), beta a Parameter)."""
    out: Dict[str, Any] = {}
    if "hidden_weight.weight" in flat:
        out["hidden_weight"] = _lin(flat["hidden_weight.weight"])
    if "beta" in flat:
        out["beta"] = np.asarray(flat["beta"])
    for name in ("p_conv", "scale_conv"):
        for k, v in flat.items():
            if k.startswith(name + ".") and k.endswith(".weight"):
                ratio = k.split(".")[1]
                out[f"{name}_{ratio}"] = _conv_hwio(
                    v, flat.get(f"{name}.{ratio}.bias"))
    return out


def _lin_g(g, name):
    return _lin(g[f"{name}.weight"], g.get(f"{name}.bias"))


def _ln_g(g, name):
    return _ln(g[f"{name}.weight"], g[f"{name}.bias"])


def _lstm_g(g, prefix, suffix=""):
    """torch nn.LSTM flat keys (one direction) -> TorchLSTM dict."""
    return {
        "kernel_i": np.asarray(g[f"{prefix}.weight_ih_l0{suffix}"]).T,
        "kernel_h": np.asarray(g[f"{prefix}.weight_hh_l0{suffix}"]).T,
        "bias": np.asarray(g[f"{prefix}.bias_ih_l0{suffix}"])
        + np.asarray(g[f"{prefix}.bias_hh_l0{suffix}"]),
    }


def _convert_att_block(g):
    """SACRF attention block (SACRF_BiUTE_infer_module.py:178-258):
    attlist ModuleList of {theta, phi, fun_g} + W_out/LN/FFN."""
    n_att = 1 + max(int(k.split(".")[1]) for k in g
                    if k.startswith("attlist."))
    out = {f"att_{i}": {"theta": _lin_g(g, f"attlist.{i}.theta"),
                        "phi": _lin_g(g, f"attlist.{i}.phi"),
                        "fun_g": _lin_g(g, f"attlist.{i}.fun_g")}
           for i in range(n_att)}
    out.update({"W_out": _lin_g(g, "W_out"),
                "layernorm1": _ln_g(g, "layernorm1"),
                "FFN_linear1": _lin_g(g, "FFN_linear1"),
                "FFN_linear2": _lin_g(g, "FFN_linear2")})
    if "w" in g:                        # spatial_att position kernel
        out["w"] = np.asarray(g["w"])
    return out


def _convert_gcn_layer(g):
    """One ARG GCN_Module (gcn_model.py:12-86): per-graph ModuleLists ->
    the stacked [NG, ...] arrays our masked-batch head consumes."""
    ng = 1 + max(int(k.split(".")[1]) for k in g
                 if k.startswith("fc_rn_theta_list."))
    stack = lambda fmt: np.stack([np.asarray(g[fmt.format(i)])
                                  for i in range(ng)])
    return {
        "theta_kernel": stack("fc_rn_theta_list.{}.weight").transpose(0, 2, 1),
        "theta_bias": stack("fc_rn_theta_list.{}.bias"),
        "phi_kernel": stack("fc_rn_phi_list.{}.weight").transpose(0, 2, 1),
        "phi_bias": stack("fc_rn_phi_list.{}.bias"),
        "gcn_kernel": stack("fc_gcn_list.{}.weight").transpose(0, 2, 1),
        "nl_gcn_scale": stack("nl_gcn_list.{}.weight"),
        "nl_gcn_bias": stack("nl_gcn_list.{}.bias"),
    }


def _convert_cib(g):
    """HiGCIN CrossInferBlock (higcin_infer_module.py): params + bn stats."""
    params = {"theta": _lin_g(g, "theta"), "phi": _lin_g(g, "phi"),
              "fun_g": _lin_g(g, "fun_g"), "W": _lin_g(g, "W"),
              "bn": {"scale": np.asarray(g["bn.weight"]),
                     "bias": np.asarray(g["bn.bias"])}}
    stats = {"bn": {"mean": np.asarray(g["bn.running_mean"]),
                    "var": np.asarray(g["bn.running_var"])}}
    return params, stats


def _convert_tce(g, num_heads=4):
    """MultiHeadLayerEmbfeatureContextEncoding (TCE_STBiP_module.py:224-312):
    CET ModuleList of layers*heads encoders; CET[i*heads+j] -> CET_{i}_{j},
    layer 0 uses ``downsample2`` (1x1 conv as Dense), deeper ``downsample``."""
    n = 1 + max(int(k.split(".")[1]) for k in g if k.startswith("CET."))
    out = {}
    for k in range(n):
        c = _group(g, f"CET.{k}.")
        i, j = divmod(k, num_heads)
        ds = "downsample2" if i == 0 else "downsample"
        out[f"CET_{i}_{j}"] = {
            "downsample": {
                "kernel": np.asarray(c[f"{ds}.weight"])[:, :, 0, 0].T,
                "bias": np.asarray(c[f"{ds}.bias"])},
            "emb_roi": _lin_g(c, "emb_roi"),
            "layernorm1": _ln_g(c, "layernorm1"),
            "layernorm2": _ln_g(c, "layernorm2"),
            "FFN_1": _lin_g(c, "FFN.0"), "FFN_2": _lin_g(c, "FFN.3"),
        }
    return out


def convert_model_state(flat: Dict[str, np.ndarray], cfg
                        ) -> Tuple[Dict[str, Any], List[str]]:
    """Flat reference ``model.state_dict()`` -> nested din_tpu variables
    {'params': ..., 'batch_stats': ...} + the list of unconverted keys."""
    flat = {k: np.asarray(v) for k, v in flat.items()}
    used = set()
    params: Dict[str, Any] = {}
    K = cfg.crop_size[0]
    D = cfg.emb_features

    bb = _group(flat, "backbone.")
    conv = convert_backbone_state(bb, cfg.backbone) if bb else {}
    used |= {"backbone." + k for k in bb}

    if "fc_emb_1.weight" in flat:
        w, b = convert_fc_emb(flat["fc_emb_1.weight"],
                              flat.get("fc_emb_1.bias"), K, D)
        params.setdefault("embed", {})["fc_emb_1"] = \
            {"kernel": w, "bias": b}
        used |= {"fc_emb_1.weight", "fc_emb_1.bias"} & set(flat)
    if "nl_emb_1.weight" in flat:
        params.setdefault("embed", {})["nl_emb_1"] = \
            _ln(flat["nl_emb_1.weight"], flat["nl_emb_1.bias"])
        used |= {"nl_emb_1.weight", "nl_emb_1.bias"}

    # DIN heads come in three on-disk layouts (dynamic_infer_module.py):
    #   Multi        DPI.DIMlist.{i}.*   (volleyball, infer_model.py:75-87)
    #   hierarchical DPI.DPI_{1,2}.* + DPI.hier_LN.*  (:446-498)
    #   plain        DPI.*               (collective, infer_model.py:1174)
    # Our models express plain as a single-kernel MultiDynamicInference, so
    # the plain layout nests under DIM_0 (heads/din.py:229-259).
    dpi = _group(flat, "DPI.")
    if dpi:
        dims = sorted({k.split(".")[1] for k in dpi
                       if k.startswith("DIMlist.")})
        if dims:
            params["DPI"] = {
                f"DIM_{i}": _convert_din(_group(dpi, f"DIMlist.{i}."))
                for i in dims}
        elif any(k.startswith("DPI_1.") for k in dpi):
            params["DPI"] = {
                "DPI_1": _convert_din(_group(dpi, "DPI_1.")),
                "DPI_2": _convert_din(_group(dpi, "DPI_2."))}
            if "hier_LN.weight" in dpi:
                params["DPI"]["hier_LN"] = _ln(dpi["hier_LN.weight"],
                                               dpi["hier_LN.bias"])
        else:
            params["DPI"] = {"DIM_0": _convert_din(dpi)}
        used |= {"DPI." + k for k in dpi}

    for tln in ("dpi_nl", "point_ln", "pctdm_nl"):  # 3-axis TorchLayerNorm
        if f"{tln}.weight" in flat:
            params[tln] = {"ln": _ln(flat[f"{tln}.weight"],
                                     flat[f"{tln}.bias"])}
            used |= {f"{tln}.weight", f"{tln}.bias"}

    head_stats: Dict[str, Any] = {}

    at = _group(flat, "AT.")                    # Actor Transformer
    if at:
        params["AT"] = {
            "Q_W": _lin_g(at, "Q_W"), "K_W": _lin_g(at, "K_W"),
            "V_W": _lin_g(at, "V_W"),
            "layernorm1": _ln_g(at, "layernorm1"),
            "layernorm2": _ln_g(at, "layernorm2"),
            "FFN_linear1": _lin_g(at, "FFN_linear1"),
            "FFN_linear2": _lin_g(at, "FFN_linear2")}
        used |= {"AT." + k for k in at}

    sacrf = _group(flat, "SACRF.")
    if sacrf:
        params["SACRF"] = {
            "f_u": _lin_g(sacrf, "f_u"),
            "spatial_att": _convert_att_block(_group(sacrf, "spatial_att.")),
            "temporal_att": _convert_att_block(
                _group(sacrf, "temporal_att.")),
            "f_spatil_att": _lin_g(sacrf, "f_spatil_att"),
            "f_temporal_att": _lin_g(sacrf, "f_temporal_att"),
            "compatible_trans_s": _lin_g(sacrf, "compatible_trans_s"),
            "compatible_trans_t": _lin_g(sacrf, "compatible_trans_t"),
            "halt_fc": _lin_g(sacrf, "halt_fc")}
        used |= {"SACRF." + k for k in sacrf}
    biute = _group(flat, "BiUTE.")
    if biute:
        params["BiUTE"] = {"q": _lin_g(biute, "q")}
        used |= {"BiUTE." + k for k in biute}

    pctdm = _group(flat, "pctdm.")
    if pctdm:
        params["pctdm"] = {
            "Bi_Lstm": {"fwd": _lstm_g(pctdm, "Bi_Lstm"),
                        "bwd": _lstm_g(pctdm, "Bi_Lstm", "_reverse")},
            "att_source_weights": _lin_g(pctdm, "att_source_weights.0"),
            "att_context_weights": _lin_g(pctdm, "att_context_weights.0"),
            "att_extra_weights": _lin_g(pctdm, "att_extra_weights.0"),
            "Intra_Group_LSTM": _lstm_g(pctdm, "Intra_Group_LSTM")}
        used |= {"pctdm." + k for k in pctdm}

    for cib_name in ("BIM", "PIM"):             # HiGCIN cross-infer blocks
        g = _group(flat, cib_name + ".")
        if g:
            params[cib_name], head_stats[cib_name] = _convert_cib(g)
            used |= {cib_name + "." + k for k in g}

    gl = _group(flat, "gcn_list.")              # ARG / legacy GCNnet
    if gl:
        layers = sorted({int(k.split(".")[0]) for k in gl})
        for layer in layers:
            params[f"gcn_{layer}"] = _convert_gcn_layer(
                _group(gl, f"{layer}."))
        used |= {"gcn_list." + k for k in gl}

    tce = _group(flat, "multilayer_head_embfeature_context_encoding.")
    if tce:
        params["tce"] = _convert_tce(tce)
        used |= {"multilayer_head_embfeature_context_encoding." + k
                 for k in tce}
    if "point_conv.weight" in flat:             # 1x1 conv as Dense
        params["point_conv"] = {
            "kernel": flat["point_conv.weight"][:, :, 0, 0].T,
            "bias": flat["point_conv.bias"]}
        used |= {"point_conv.weight", "point_conv.bias"}
    for head in ("fc_actions", "fc_activities"):
        if f"{head}.weight" in flat:
            params[head] = _lin(flat[f"{head}.weight"],
                                flat.get(f"{head}.bias"))
            used |= {f"{head}.weight", f"{head}.bias"} & set(flat)

    out = {"params": params}
    if conv:
        trunk_wrap = {col: {"trunk": {"frames_scan": {"backbone": tree}}}
                      for col, tree in conv.items()}
        out["params"].update(trunk_wrap.get("params", {}))
        if "batch_stats" in trunk_wrap:
            out["batch_stats"] = trunk_wrap["batch_stats"]
    if head_stats:                       # HiGCIN CrossInferBlock BN stats
        out.setdefault("batch_stats", {}).update(head_stats)
    return out, sorted(set(flat) - used)


_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def load_reference_optimizer(opt_state, path_or_state, cfg):
    """Resume torch-Adam training exactly from a reference full checkpoint.

    The reference SAVES ``optimizer.state_dict()`` (train_net.py:121-125)
    but never restores it; here the saved ``exp_avg``/``exp_avg_sq``/
    ``step`` are converted through the same per-tensor layout transforms as
    the weights (Adam is elementwise, so any weight permutation applies to
    its moments unchanged) and grafted into optax's scale_by_adam state.

    torch Adam state is keyed by parameter INDEX over
    ``filter(requires_grad, model.parameters())`` (train_net.py:86) —
    reconstructed from the checkpoint's state_dict key order minus BN
    buffers, minus ``backbone.*`` when the run froze it.  The one
    non-elementwise converter quirk: torch nn.LSTM keeps two bias vectors
    whose gradients (hence moments) are identical; the import sums biases,
    so LSTM-bias moments are pre-halved to keep the sum exact.

    Returns ``(opt_state, epoch)``; opt_state is unchanged when the file
    carries no optimizer state.
    """
    state = path_or_state
    if isinstance(state, str):
        import torch                      # local: only for .pth reading
        state = torch.load(state, map_location="cpu", weights_only=False)
    epoch = int(state.get("epoch", 0))
    opt_sd = state.get("optimizer") or {}
    if not opt_sd.get("state"):
        return opt_state, epoch

    model_flat = _to_numpy_state(state["state_dict"])
    names = [k for k in model_flat if not k.endswith(_BUFFER_SUFFIXES)]
    if not cfg.train_backbone:
        names = [k for k in names if not k.startswith("backbone.")]
    ids = [pid for g in opt_sd["param_groups"] for pid in g["params"]]
    if len(ids) != len(names):
        raise ValueError(
            f"optimizer has {len(ids)} params but the checkpoint implies "
            f"{len(names)} trainable tensors — was train_backbone "
            f"({cfg.train_backbone}) different in the reference run?")
    id2name = dict(zip(ids, names))

    # running stats ride along so convert_backbone_state can tell BN scale
    # moments apart from conv/linear weight moments (rank-1 'weight' keys)
    stats = {k: v for k, v in model_flat.items()
             if k.endswith(("running_mean", "running_var"))}
    mu_flat, nu_flat, steps = dict(stats), dict(stats), [0]
    for pid, pstate in opt_sd["state"].items():
        name = id2name[int(pid)]
        scale = 0.5 if (".bias_ih_l0" in name or ".bias_hh_l0" in name) \
            else 1.0
        mu_flat[name] = np.asarray(_leaf_np(pstate["exp_avg"])) * scale
        nu_flat[name] = np.asarray(_leaf_np(pstate["exp_avg_sq"])) * scale
        steps.append(int(_leaf_np(pstate["step"])))

    from din_tpu.train.optim import adopt_adam_moments, set_learning_rate
    mu_tree, _ = convert_model_state(mu_flat, cfg)
    nu_tree, _ = convert_model_state(nu_flat, cfg)
    opt_state = adopt_adam_moments(opt_state, mu_tree["params"],
                                   nu_tree["params"], max(steps))
    lr = opt_sd["param_groups"][0].get("lr")
    if lr is not None:
        opt_state = set_learning_rate(opt_state, float(lr))
    return opt_state, epoch


def _leaf_np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _unapplied_leaves(dst: Dict[str, Any], src: Dict[str, Any],
                      path: str = "") -> List[str]:
    """Paths in ``src`` that graft_variables would silently skip because
    the destination tree has no matching node (torch_port._tree_merge walks
    dst keys only)."""
    out: List[str] = []
    for k, v in src.items():
        p = f"{path}/{k}" if path else k
        if not isinstance(dst, dict) or k not in dst:
            out.append(p)
        elif isinstance(v, dict):
            out.extend(_unapplied_leaves(dst[k], v, p))
    return out


def _to_numpy_state(obj) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach")
            else np.asarray(v) for k, v in obj.items()}


def load_reference_checkpoint(variables: Dict[str, Any], path_or_state,
                              cfg, verbose: bool = True):
    """Graft a reference .pth checkpoint (either format) into ``variables``.

    Returns ``(variables, skipped_keys)``.  Like the reference's
    ``loadpart`` (infer_model.py:128-138), unknown keys are reported, not
    fatal; recognised keys must match shapes (torch_port._tree_merge
    raises on drift).
    """
    state = path_or_state
    if isinstance(state, str):
        import torch                      # local: only for .pth reading
        state = torch.load(state, map_location="cpu", weights_only=False)

    if "backbone_state_dict" in state:    # stage-1 component format
        flat = {}
        for comp, prefix in (("backbone_state_dict", "backbone."),
                             ("fc_emb_state_dict", "fc_emb_1."),
                             ("fc_actions_state_dict", "fc_actions."),
                             ("fc_activities_state_dict", "fc_activities.")):
            for k, v in _to_numpy_state(state.get(comp, {})).items():
                flat[prefix + k] = v
        # base_model saves fc_emb (no nl) — same Linear, different attr name
    else:                                 # full-model format
        flat = _to_numpy_state(state.get("state_dict", state))

    converted, skipped = convert_model_state(flat, cfg)
    unapplied = _unapplied_leaves(variables, converted)
    if unapplied:
        skipped = sorted(set(skipped)
                         | {f"(unapplied) {p}" for p in unapplied})
    grafted = graft_variables(variables, converted)
    if verbose:
        n = len(flat) - len(skipped)
        print(f"reference checkpoint: {n} tensors converted, "
              f"{len(skipped)} skipped" + (f" ({skipped[:6]}...)"
                                           if skipped else ""))
    return grafted, skipped
