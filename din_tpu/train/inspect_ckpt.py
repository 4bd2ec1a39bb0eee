"""Checkpoint inspection CLI (beyond reference parity — the reference
offers no way to look inside its .pth dumps short of a python REPL).

    python -m din_tpu.train.inspect_ckpt result/<exp>/stage2_*.ckpt
    python -m din_tpu.train.inspect_ckpt --full ckpt_dir_or_file
    python -m din_tpu.train.inspect_ckpt reference_model.pth   # torch dumps

Prints the payload structure (epoch/step/keys), per-subtree parameter
counts and bytes, and (with --full) every leaf path with shape/dtype —
works on din_tpu msgpack files, orbax directories, and reference-framework
.pth files (both on-disk formats, for migration debugging).
"""

from __future__ import annotations

import argparse

import numpy as np


def _walk(tree, prefix=""):
    """(path, leaf) pairs for dict-pytrees as stored in checkpoints."""
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _walk(tree[k], f"{prefix}/{k}" if prefix else str(k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk(v, f"{prefix}[{i}]")
    else:
        yield prefix, tree


def _leaf_stats(leaf):
    if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        return n, n * np.dtype(leaf.dtype).itemsize, \
            f"{tuple(leaf.shape)} {leaf.dtype}"
    return 0, 0, repr(leaf)


def _load(path: str):
    if path.endswith((".pth", ".pt")):
        import torch
        obj = torch.load(path, map_location="cpu", weights_only=False)

        def to_np(x):
            if isinstance(x, torch.Tensor):
                return x.detach().numpy()
            if isinstance(x, dict):
                return {k: to_np(v) for k, v in x.items()}
            if isinstance(x, (list, tuple)):
                return type(x)(to_np(v) for v in x)
            return x
        return to_np(obj), "torch"
    from din_tpu.train.checkpoint import load_checkpoint
    return load_checkpoint(path), "din_tpu"


def describe(path: str, full: bool = False, out=print) -> dict:
    payload, kind = _load(path)
    out(f"{path}  ({kind})")
    if not isinstance(payload, dict):
        out(f"  <non-dict payload: {type(payload).__name__}>")
        return {"kind": kind}
    def _as_scalar(v):
        # msgpack round-trips python scalars as 0-d ndarrays
        if isinstance(v, (int, float, str, bool, np.integer, np.floating)):
            return v.item() if hasattr(v, "item") else v
        if hasattr(v, "shape") and v.shape == ():
            return np.asarray(v).item()
        return None

    scalars = {k: s for k, v in payload.items()
               if (s := _as_scalar(v)) is not None}
    for k, v in sorted(scalars.items()):
        out(f"  {k}: {v}")
    totals = {}
    for top in sorted(payload):
        if top in scalars:
            continue
        n = b = leaves = 0
        for _, leaf in _walk(payload[top]):
            ln, lb, _ = _leaf_stats(leaf)
            n += ln
            b += lb
            leaves += 1
        totals[top] = (leaves, n, b)
        out(f"  {top}: {leaves} leaves, {n:,} elements, "
            f"{b / 1e6:.1f} MB")
    if full:
        for top in sorted(payload):
            if top in scalars:
                continue
            for p, leaf in _walk(payload[top], top):
                out(f"    {p}: {_leaf_stats(leaf)[2]}")
    return {"kind": kind, "scalars": scalars,
            "subtrees": {k: {"leaves": v[0], "elements": v[1], "bytes": v[2]}
                         for k, v in totals.items()}}


def main(argv=None):
    p = argparse.ArgumentParser(description="inspect a checkpoint")
    p.add_argument("path")
    p.add_argument("--full", action="store_true",
                   help="print every leaf with shape/dtype")
    args = p.parse_args(argv)
    describe(args.path, full=args.full)


if __name__ == "__main__":
    main()
