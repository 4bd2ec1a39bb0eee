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
plus the flagship DIN family heads (Dynamic_volleyball lite + plain,
Multi-DIN — infer_model.py:20-140); unrecognised keys are returned in the
report rather than failing, mirroring the reference's tolerant
``loadpart``.
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

    # DIN heads: Multi (DPI.DIMlist.{i}.*) or plain (DPI.*)
    dpi = _group(flat, "DPI.")
    if dpi:
        dims = sorted({k.split(".")[1] for k in dpi
                       if k.startswith("DIMlist.")})
        if dims:
            params["DPI"] = {
                f"DIM_{i}": _convert_din(_group(dpi, f"DIMlist.{i}."))
                for i in dims}
        else:
            params["DPI"] = _convert_din(dpi)
        used |= {"DPI." + k for k in dpi}

    for tln in ("dpi_nl", "point_ln"):          # 3-axis TorchLayerNorm
        if f"{tln}.weight" in flat:
            params[tln] = {"ln": _ln(flat[f"{tln}.weight"],
                                     flat[f"{tln}.bias"])}
            used |= {f"{tln}.weight", f"{tln}.bias"}
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
    return out, sorted(set(flat) - used)


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
    grafted = graft_variables(variables, converted)
    if verbose:
        n = len(flat) - len(skipped)
        print(f"reference checkpoint: {n} tensors converted, "
              f"{len(skipped)} skipped" + (f" ({skipped[:6]}...)"
                                           if skipped else ""))
    return grafted, skipped
