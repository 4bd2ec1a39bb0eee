"""Export din_tpu checkpoints INTO the reference framework's .pth formats.

The inverse of nn/ref_import.py: models trained (or fine-tuned) here can be
handed back to the reference codebase for evaluation or further training —
two-way migration.  Both reference on-disk formats are produced:

  * **stage-1 component files** (base_model.py:46-54 ``savemodel``):
    ``{'backbone_state_dict', 'fc_emb_state_dict', 'fc_actions_state_dict',
    'fc_activities_state_dict'}``;
  * **full-model files** (train_net.py:120-127): ``{'epoch', 'state_dict',
    'optimizer'}`` with flat ``model.state_dict()`` keys.  ``optimizer`` is
    saved empty — optax state has no torch.optim.Adam equivalent layout.

Layout notes:
  * conv kernels go back HWIO -> OIHW, linear kernels [I,O] -> [O,I], BN
    scale/bias -> weight/bias with ``num_batches_tracked = 0`` added so
    ``load_state_dict(strict=True)`` succeeds;
  * ``fc_emb_1`` is re-permuted from our position-major (i, j, d) RoI
    flatten back to torch's channel-major (d, i, j) (base_model.py:115);
  * torch nn.LSTM holds two bias vectors that are summed in the cell; the
    import folded them into one, so the export emits ``bias_ih_l0 = bias``
    and ``bias_hh_l0 = 0`` — numerically identical in torch;
  * the DIN head is written in the reference layout the target model
    expects: ``DPI.DIMlist.{i}.*`` (Multi, infer_model.py:75-87), plain
    ``DPI.*`` (Dynamic_collective, :1174-1185) or ``DPI.DPI_{1,2}.*``
    (hierarchical, dynamic_infer_module.py:446-498).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

_RES_SEQ_INV = {"conv1": "features.0", "bn1": "features.1",
                "layer1": "features.4", "layer2": "features.5",
                "layer3": "features.6", "layer4": "features.7"}


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _torch_module_path(path, backbone: str) -> str:
    """Invert torch_port._flax_path: flax module names -> torch key prefix.

    Digit-merge ('layer1_0' <- 'layer1.0') only ever happened for numeric
    torch children (VGG/Alex ``features.N``, resnet blocks/downsample);
    inception/vgg leaf module names keep their literal underscores
    (``Mixed_5b``, ``branch7x7dbl_5`` are real torchvision names).
    """
    segs = []
    for comp in path:
        if backbone in ("vgg16", "vgg19", "alex", "res18", "res50"):
            parts = comp.split("_")
            comp = parts[0]
            for p in parts[1:]:
                comp += ("." + p) if p.isdigit() else ("_" + p)
        segs.append(comp)
    key = ".".join(segs)
    if backbone in ("res18", "res50"):
        head = key.split(".", 1)
        root = _RES_SEQ_INV.get(head[0])
        if root:
            key = root + ("." + head[1] if len(head) > 1 else "")
    return key


def export_backbone_state(params: Dict[str, Any],
                          batch_stats: Dict[str, Any],
                          backbone: str) -> Dict[str, np.ndarray]:
    """Inverse of torch_port.convert_backbone_state: flax trees -> flat
    torch ``backbone.state_dict()`` layout (numpy values)."""
    flat: Dict[str, np.ndarray] = {}

    def walk_params(tree, path):
        for k, v in sorted(tree.items()):
            if isinstance(v, dict):
                walk_params(v, path + (k,))
                continue
            mod = _torch_module_path(path, backbone)
            v = _np(v)
            if k == "kernel":
                w = v.transpose(3, 2, 0, 1) if v.ndim == 4 \
                    else v.transpose(1, 0)
                flat[f"{mod}.weight"] = w
            elif k == "scale":
                flat[f"{mod}.weight"] = v
            else:                      # bias (conv/linear/BN) or raw leaf
                flat[f"{mod}.{k}"] = v

    def walk_stats(tree, path):
        for k, v in sorted(tree.items()):
            if isinstance(v, dict):
                walk_stats(v, path + (k,))
                continue
            mod = _torch_module_path(path, backbone)
            flat[f"{mod}.running_{'mean' if k == 'mean' else 'var'}"] = _np(v)
            flat.setdefault(f"{mod}.num_batches_tracked",
                            np.asarray(0, dtype=np.int64))

    walk_params(params, ())
    walk_stats(batch_stats or {}, ())
    return flat


# ---- leaf inverses ---------------------------------------------------------

def _lin_inv(d, key, out):
    out[f"{key}.weight"] = _np(d["kernel"]).T
    if "bias" in d:
        out[f"{key}.bias"] = _np(d["bias"])


def _ln_inv(d, key, out):
    out[f"{key}.weight"] = _np(d["scale"])
    out[f"{key}.bias"] = _np(d["bias"])


def _conv_inv(d, key, out):
    out[f"{key}.weight"] = _np(d["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in d:
        out[f"{key}.bias"] = _np(d["bias"])


def _pointconv_inv(d, key, out):
    """Dense over channels -> torch 1x1 Conv2d."""
    out[f"{key}.weight"] = _np(d["kernel"]).T[:, :, None, None]
    out[f"{key}.bias"] = _np(d["bias"])


def _lstm_inv(d, key, out, suffix=""):
    out[f"{key}.weight_ih_l0{suffix}"] = _np(d["kernel_i"]).T
    out[f"{key}.weight_hh_l0{suffix}"] = _np(d["kernel_h"]).T
    out[f"{key}.bias_ih_l0{suffix}"] = _np(d["bias"])
    out[f"{key}.bias_hh_l0{suffix}"] = np.zeros_like(_np(d["bias"]))


def _din_inv(d, prefix, out):
    """One DynamicPersonInference param dict -> reference
    Dynamic_Person_Inference keys (dynamic_infer_module.py:40-82)."""
    if "hidden_weight" in d:
        out[f"{prefix}hidden_weight.weight"] = \
            _np(d["hidden_weight"]["kernel"]).T
    if "beta" in d:
        out[f"{prefix}beta"] = _np(d["beta"])
    for k, v in d.items():
        for name in ("p_conv", "scale_conv"):
            if k.startswith(name + "_"):
                ratio = k[len(name) + 1:]
                _conv_inv(v, f"{prefix}{name}.{ratio}", out)


def _att_block_inv(d, prefix, out):
    """Inverse of ref_import._convert_att_block (SACRF attention block)."""
    for k, v in d.items():
        if k.startswith("att_"):
            i = k[4:]
            _lin_inv(v["theta"], f"{prefix}attlist.{i}.theta", out)
            _lin_inv(v["phi"], f"{prefix}attlist.{i}.phi", out)
            _lin_inv(v["fun_g"], f"{prefix}attlist.{i}.fun_g", out)
    _lin_inv(d["W_out"], f"{prefix}W_out", out)
    _ln_inv(d["layernorm1"], f"{prefix}layernorm1", out)
    _lin_inv(d["FFN_linear1"], f"{prefix}FFN_linear1", out)
    _lin_inv(d["FFN_linear2"], f"{prefix}FFN_linear2", out)
    if "w" in d:
        out[f"{prefix}w"] = _np(d["w"])


def _gcn_inv(d, prefix, out):
    """Inverse of ref_import._convert_gcn_layer: stacked [NG, ...] arrays
    back to the per-graph ModuleList keys (gcn_model.py:12-86)."""
    ng = _np(d["theta_kernel"]).shape[0]
    for i in range(ng):
        out[f"{prefix}fc_rn_theta_list.{i}.weight"] = \
            _np(d["theta_kernel"])[i].T
        out[f"{prefix}fc_rn_theta_list.{i}.bias"] = _np(d["theta_bias"])[i]
        out[f"{prefix}fc_rn_phi_list.{i}.weight"] = _np(d["phi_kernel"])[i].T
        out[f"{prefix}fc_rn_phi_list.{i}.bias"] = _np(d["phi_bias"])[i]
        out[f"{prefix}fc_gcn_list.{i}.weight"] = _np(d["gcn_kernel"])[i].T
        out[f"{prefix}nl_gcn_list.{i}.weight"] = _np(d["nl_gcn_scale"])[i]
        out[f"{prefix}nl_gcn_list.{i}.bias"] = _np(d["nl_gcn_bias"])[i]


def _cib_inv(params, stats, prefix, out):
    """HiGCIN CrossInferBlock params + BN buffers."""
    for name in ("theta", "phi", "fun_g", "W"):
        _lin_inv(params[name], f"{prefix}{name}", out)
    out[f"{prefix}bn.weight"] = _np(params["bn"]["scale"])
    out[f"{prefix}bn.bias"] = _np(params["bn"]["bias"])
    out[f"{prefix}bn.running_mean"] = _np(stats["bn"]["mean"])
    out[f"{prefix}bn.running_var"] = _np(stats["bn"]["var"])
    out[f"{prefix}bn.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _tce_inv(d, prefix, out, num_heads=4):
    """Inverse of ref_import._convert_tce."""
    for k, v in d.items():
        i, j = (int(s) for s in k.split("_")[1:])
        ds = "downsample2" if i == 0 else "downsample"
        key = f"{prefix}CET.{i * num_heads + j}."
        out[f"{key}{ds}.weight"] = \
            _np(v["downsample"]["kernel"]).T[:, :, None, None]
        out[f"{key}{ds}.bias"] = _np(v["downsample"]["bias"])
        _lin_inv(v["emb_roi"], f"{key}emb_roi", out)
        _ln_inv(v["layernorm1"], f"{key}layernorm1", out)
        _ln_inv(v["layernorm2"], f"{key}layernorm2", out)
        _lin_inv(v["FFN_1"], f"{key}FFN.0", out)
        _lin_inv(v["FFN_2"], f"{key}FFN.3", out)


def _fc_emb_inv(d, K: int, D: int):
    """Inverse of torch_port.convert_fc_emb: our [K*K*D, NFB] position-major
    kernel -> torch [NFB, D*K*K] channel-major weight."""
    kernel = _np(d["kernel"])
    NFB = kernel.shape[1]
    w = kernel.T.reshape(NFB, K, K, D).transpose(0, 3, 1, 2).reshape(NFB, -1)
    return w, _np(d["bias"])


def export_model_state(variables: Dict[str, Any], cfg
                       ) -> Dict[str, np.ndarray]:
    """din_tpu variables -> flat reference ``model.state_dict()`` layout."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    K = cfg.crop_size[0]
    D = cfg.emb_features
    plain_din = "collective" in getattr(cfg, "inference_module_name", "")
    out: Dict[str, np.ndarray] = {}

    trunk = params.get("trunk", {}).get("frames_scan", {}).get("backbone")
    if trunk is not None:
        tstats = stats.get("trunk", {}).get("frames_scan", {}) \
            .get("backbone", {})
        for k, v in export_backbone_state(trunk, tstats,
                                          cfg.backbone).items():
            out[f"backbone.{k}"] = v

    embed = params.get("embed", {})
    if "fc_emb_1" in embed:
        w, b = _fc_emb_inv(embed["fc_emb_1"], K, D)
        out["fc_emb_1.weight"], out["fc_emb_1.bias"] = w, b
    if "nl_emb_1" in embed:
        _ln_inv(embed["nl_emb_1"], "nl_emb_1", out)

    dpi = params.get("DPI")
    if dpi:
        if "DPI_1" in dpi:                      # hierarchical layout
            _din_inv(dpi["DPI_1"], "DPI.DPI_1.", out)
            _din_inv(dpi["DPI_2"], "DPI.DPI_2.", out)
            if "hier_LN" in dpi:
                _ln_inv(dpi["hier_LN"], "DPI.hier_LN", out)
        elif plain_din:                         # Dynamic_collective layout
            _din_inv(dpi["DIM_0"], "DPI.", out)
        else:                                   # Multi_Dynamic_Inference
            for k, v in dpi.items():
                _din_inv(v, f"DPI.DIMlist.{k.split('_')[1]}.", out)

    for tln in ("dpi_nl", "point_ln", "pctdm_nl"):
        if tln in params:
            _ln_inv(params[tln]["ln"], tln, out)

    if "AT" in params:
        at = params["AT"]
        for name in ("Q_W", "K_W", "V_W", "FFN_linear1", "FFN_linear2"):
            _lin_inv(at[name], f"AT.{name}", out)
        for name in ("layernorm1", "layernorm2"):
            _ln_inv(at[name], f"AT.{name}", out)

    if "SACRF" in params:
        sacrf = params["SACRF"]
        for name in ("f_u", "f_spatil_att", "f_temporal_att",
                     "compatible_trans_s", "compatible_trans_t", "halt_fc"):
            _lin_inv(sacrf[name], f"SACRF.{name}", out)
        _att_block_inv(sacrf["spatial_att"], "SACRF.spatial_att.", out)
        _att_block_inv(sacrf["temporal_att"], "SACRF.temporal_att.", out)
    if "BiUTE" in params:
        _lin_inv(params["BiUTE"]["q"], "BiUTE.q", out)

    if "pctdm" in params:
        p = params["pctdm"]
        _lstm_inv(p["Bi_Lstm"]["fwd"], "pctdm.Bi_Lstm", out)
        _lstm_inv(p["Bi_Lstm"]["bwd"], "pctdm.Bi_Lstm", out, "_reverse")
        for name in ("att_source_weights", "att_context_weights",
                     "att_extra_weights"):
            _lin_inv(p[name], f"pctdm.{name}.0", out)
        _lstm_inv(p["Intra_Group_LSTM"], "pctdm.Intra_Group_LSTM", out)

    for cib in ("BIM", "PIM"):
        if cib in params:
            _cib_inv(params[cib], stats[cib], f"{cib}.", out)

    for k in sorted(params):
        if k.startswith("gcn_"):
            _gcn_inv(params[k], f"gcn_list.{k.split('_')[1]}.", out)

    if "tce" in params:
        _tce_inv(params["tce"], "multilayer_head_embfeature_"
                 "context_encoding.", out)
    if "point_conv" in params:
        _pointconv_inv(params["point_conv"], "point_conv", out)
    for head in ("fc_actions", "fc_activities"):
        if head in params:
            _lin_inv(params[head], head, out)
    return out


def save_reference_checkpoint(variables: Dict[str, Any], cfg, path: str,
                              fmt: str = "full", epoch: int = 0) -> None:
    """Write ``variables`` as a reference-framework .pth file.

    fmt='full'   -> train_net.py:120-127 ``{'epoch','state_dict','optimizer'}``
    fmt='stage1' -> base_model.py:46-54 component dicts (savemodel layout;
                    the Basenet attribute is ``fc_emb``, importer maps it
                    back to our ``fc_emb_1``).
    """
    import torch                        # local: only for .pth writing

    flat = export_model_state(variables, cfg)
    # copy=True: jax -> numpy leaves are read-only views, and torch tensors
    # must own writable memory
    tensors = {k: torch.from_numpy(np.array(v, copy=True))
               for k, v in flat.items()}
    if fmt == "full":
        torch.save({"epoch": epoch, "state_dict": tensors,
                    "optimizer": {}}, path)
    elif fmt == "stage1":
        comp = {"backbone_state_dict": {}, "fc_emb_state_dict": {},
                "fc_actions_state_dict": {}, "fc_activities_state_dict": {}}
        for k, v in tensors.items():
            for prefix, comp_key in (
                    ("backbone.", "backbone_state_dict"),
                    ("fc_emb_1.", "fc_emb_state_dict"),
                    ("fc_actions.", "fc_actions_state_dict"),
                    ("fc_activities.", "fc_activities_state_dict")):
                if k.startswith(prefix):
                    comp[comp_key][k[len(prefix):]] = v
        torch.save(comp, path)
    else:
        raise ValueError(f"unknown export format {fmt!r}")
