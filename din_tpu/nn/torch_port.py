"""Torch -> flax weight conversion for the backbones.

The reference relies on torchvision ``pretrained=True`` weights
(backbone/backbone.py:14,92,106,118,139,160) and on stage-1 checkpoints whose
``backbone_state_dict`` is saved from those wrappers (base_model.py:46-54).
This module converts either form into the flax variable tree of
``din_tpu.nn.backbones`` so pretrained semantics carry over.

Conversion rules (rank-based):
  conv weight [O,I,kh,kw] -> kernel [kh,kw,I,O]
  linear weight [O,I]     -> kernel [I,O]
  1-D 'weight'/'bias'     -> BatchNorm scale/bias (params)
  running_mean/var        -> BatchNorm mean/var (batch_stats)
  num_batches_tracked     -> dropped

Key-path rules: numeric path segments merge into their parent with '_'
('layer1.0.conv1' -> 'layer1_0'/'conv1'), matching the module names chosen in
backbones.py.  The reference's MyRes18/MyRes50 wrap the torchvision trunk in
an anonymous ``nn.Sequential`` (backbone/backbone.py:119-128), so
``features.{0,1,4,5,6,7}`` are first remapped to conv1/bn1/layer1..4.

No torch import is required unless reading a ``.pth`` file directly.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

_RES_SEQ_REMAP = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
                  "6": "layer3", "7": "layer4"}


def torch_file_to_numpy(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a flat {key: ndarray} dict."""
    import torch  # local import: only needed for .pth reading

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in state.items()}


def _flax_path(key: str, backbone: str) -> Tuple[Tuple[str, ...], str]:
    segs = key.split(".")
    leaf = segs[-1]
    segs = segs[:-1]
    if backbone in ("res18", "res50") and segs and segs[0] == "features":
        # reference Sequential wrapper (backbone/backbone.py:119-128)
        if len(segs) >= 2 and segs[1] in _RES_SEQ_REMAP:
            segs = [_RES_SEQ_REMAP[segs[1]]] + segs[2:]
    path = []
    for s in segs:
        if s.isdigit() and path:
            path[-1] = path[-1] + "_" + s
        else:
            path.append(s)
    return tuple(path), leaf


def _set(tree: Dict, path: Tuple[str, ...], leaf: str, value: np.ndarray):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def convert_backbone_state(state: Mapping[str, np.ndarray],
                           backbone: str) -> Dict[str, Any]:
    """Convert a torch backbone state_dict into flax variables.

    Returns {'params': ..., 'batch_stats': ...} nested dicts matching
    ``din_tpu.nn.backbones.build_backbone(backbone)``.
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    # group keys by module path to disambiguate BN weight vs conv weight
    bn_modules = set()
    for key in state:
        if key.endswith("running_mean"):
            path, _ = _flax_path(key, backbone)
            bn_modules.add(path)

    for key, value in state.items():
        path, leaf = _flax_path(key, backbone)
        value = np.asarray(value)
        if leaf == "num_batches_tracked":
            continue
        if leaf == "running_mean":
            _set(batch_stats, path, "mean", value)
        elif leaf == "running_var":
            _set(batch_stats, path, "var", value)
        elif leaf == "weight":
            if value.ndim == 4:
                _set(params, path, "kernel", value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:
                _set(params, path, "kernel", value.transpose(1, 0))
            elif value.ndim == 1 and path in bn_modules:
                _set(params, path, "scale", value)
            else:
                _set(params, path, "weight", value)
        elif leaf == "bias":
            _set(params, path, "bias", value)
        else:
            _set(params, path, leaf, value)
    out: Dict[str, Any] = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def convert_fc_emb(weight: np.ndarray, bias: np.ndarray, K: int, D: int):
    """Convert a torch fc_emb weight [NFB, D*K*K] to the flax kernel
    [K*K*D, NFB].

    The torch trunk flattens RoI features channel-major (d, i, j)
    (base_model.py:115); our trunk flattens position-major (i, j, d), so the
    input axis is permuted accordingly.
    """
    NFB = weight.shape[0]
    w = weight.reshape(NFB, D, K, K).transpose(0, 2, 3, 1).reshape(NFB, -1)
    return w.transpose(1, 0), np.asarray(bias)


def _tree_merge(dst, src, path=""):
    """Graft src leaves into dst (must exist with matching shapes)."""
    import jax.numpy as jnp
    merged = {}
    for k, v in dst.items():
        if k in src:
            if isinstance(v, dict):
                merged[k] = _tree_merge(v, src[k], f"{path}/{k}")
            else:
                sv = np.asarray(src[k])
                if tuple(v.shape) != tuple(sv.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{tuple(v.shape)} vs {tuple(sv.shape)}")
                merged[k] = jnp.asarray(sv, dtype=v.dtype)
        else:
            merged[k] = v
    return merged


def graft_variables(variables: Dict[str, Any],
                    converted: Dict[str, Any]) -> Dict[str, Any]:
    """Return ``variables`` with every leaf present in ``converted`` replaced.

    Used for pretrained-backbone load and for the stage-1 -> stage-2 weight
    surgery (reference infer_model.py:122-126 ``loadmodel`` semantics).
    """
    out = dict(variables)
    for col, tree in converted.items():
        if col in out:
            out[col] = _tree_merge(out[col], tree, col)
    return out
