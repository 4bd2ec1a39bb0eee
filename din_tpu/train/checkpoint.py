"""Checkpointing and stage-1 -> stage-2 weight surgery.

reference: stage-1 saves component state dicts on best accuracy
(base_model.py:46-54, train_net.py:129-135); stage-2 saves
{'epoch','state_dict','optimizer'} every eval with the accuracy embedded in
the filename (train_net.py:120-128); stage-2 init pulls backbone + fc_emb
from the stage-1 file (infer_model.py:122-126) or resumes a full stage-2
checkpoint (train_net_dynamic.py:84-89).

Here checkpoints are msgpack-serialised pytrees (flax.serialization) by
default; ``backend="orbax"`` (cfg.checkpoint_backend) writes an orbax
directory instead — multi-host-safe sharded saves for pod training, where
every process must participate in the write (the reference is single-host
torch.save).  On a multi-process mesh the msgpack backend gathers
cross-process-sharded leaves (ZeRO-sharded Adam moments,
cfg.shard_opt_state) collectively — every process must call save — and
every process then writes its own result dir (identical bytes; safe for
both shared and per-host dirs); prefer orbax on pods for distributed
writes.  ``load_checkpoint`` auto-detects the format (orbax
checkpoints are directories).  The reference saves optimizer state but
never restores it and hardcodes start_epoch=1 (train_net.py:99,121-125) —
fixed by intent: ``load_state`` restores epoch and optimizer too.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

from din_tpu.nn.torch_port import graft_variables


def _to_host(tree):
    def to_np(x):
        # On a multi-process mesh, data-sharded leaves (ZeRO-1 Adam moments
        # under cfg.shard_opt_state) are not fully addressable and
        # np.asarray would raise; gather them across processes first so the
        # msgpack backend stays usable there (orbax writes them distributed
        # and needs no gather).  Fully-REPLICATED leaves (params,
        # batch_stats, rng on a pod) are also not fully addressable, but
        # np.asarray reads them from the local replica — gathering those
        # would turn a host-local copy into one collective per param leaf.
        if isinstance(x, jax.Array) and not x.is_fully_addressable \
                and not x.is_fully_replicated:
            from jax.experimental import multihost_utils
            x = multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(x)
    return jax.tree_util.tree_map(to_np, tree)


def save_checkpoint(path: str, payload: Dict[str, Any],
                    backend: str = "msgpack") -> None:
    if backend == "orbax":
        import orbax.checkpoint as ocp
        from jax.sharding import NamedSharding, SingleDeviceSharding

        def orbax_safe(x):
            # jax.Array leaves keep their sharding so model-sharded params
            # on a pod are written distributed — but orbax can only
            # serialize Named/SingleDevice shardings.  jit outputs under an
            # ambient mesh carry GSPMDSharding (the engine's jitted
            # optimizer init, e.g.), which orbax silently OMITS from the
            # _sharding file and then fails to restore; pull those to host
            # when fully addressable (single-host: always).
            if isinstance(x, jax.Array) and x.is_fully_addressable and \
                    not isinstance(x.sharding,
                                   (NamedSharding, SingleDeviceSharding)):
                return np.asarray(x)
            return x

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path),
                   jax.tree_util.tree_map(orbax_safe, payload), force=True)
        ckptr.wait_until_finished()
        return
    # _to_host may run cross-process gathers — EVERY process must reach it
    # (the engine calls save on all processes).  Every process then writes
    # its own copy: identical bytes, so on a shared result dir the atomic
    # os.replace makes the last writer win harmlessly, and on per-host
    # result dirs every host still has a checkpoint for auto_resume (a
    # process-0-only write would desync resume across hosts).  The tmp
    # name is process-suffixed so concurrent writers on a shared dir never
    # interleave within one file.
    data = serialization.msgpack_serialize(_to_host(payload))
    tmp = f"{path}.tmp.{jax.process_index()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    if os.path.isdir(path):                 # orbax checkpoint directory
        import orbax.checkpoint as ocp
        return ocp.StandardCheckpointer().restore(os.path.abspath(path))
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_stage1_components(path: str, variables: Dict[str, Any],
                           backend: str = "msgpack") -> None:
    """Component-wise stage-1 save (base_model.py:46-54): backbone (trunk),
    fc_emb (embed), fc_actions, fc_activities — plus batch stats."""
    params = variables["params"]
    payload = {
        "trunk": params.get("trunk", {}),
        "embed": params.get("embed", {}),
        "fc_actions": params.get("fc_actions", {}),
        "fc_activities": params.get("fc_activities", {}),
        "batch_stats": variables.get("batch_stats", {}),
    }
    save_checkpoint(path, payload, backend=backend)


def load_backbone_stage2(variables: Dict[str, Any],
                         stage1_path: str) -> Dict[str, Any]:
    """Stage-2 init from a stage-1 file: graft backbone (trunk) + fc_emb
    (embed) subtrees (infer_model.py:122-126 ``loadmodel``)."""
    comp = load_checkpoint(stage1_path)
    grafts: Dict[str, Any] = {"params": {}}
    for key in ("trunk", "embed"):
        if comp.get(key):
            grafts["params"][key] = comp[key]
    if comp.get("batch_stats"):
        grafts["batch_stats"] = comp["batch_stats"]
    return graft_variables(variables, grafts)


def load_partial(params: Dict[str, Any], saved_flat: Dict[str, np.ndarray],
                 prefix: str = "") -> Dict[str, Any]:
    """Prefix-stripped partial load (reference ``loadpart``,
    infer_model.py:128-138): graft every saved entry whose prefix-stripped
    path exists in ``params``; report the count."""
    grafts: Dict[str, Any] = {}
    num = 0
    for key, value in saved_flat.items():
        stripped = key[len(prefix):] if prefix and key.startswith(prefix) \
            else key.replace(prefix, "")
        path = [p for p in stripped.split("/") if p]
        node = params
        ok = True
        for p in path[:-1]:
            if isinstance(node, dict) and p in node:
                node = node[p]
            else:
                ok = False
                break
        if not ok or not (isinstance(node, dict) and path and
                          path[-1] in node):
            continue
        dst = grafts
        for p in path[:-1]:
            dst = dst.setdefault(p, {})
        dst[path[-1]] = value
        num += 1
    print(f"{num} parameters loaded for '{prefix}'")
    return graft_variables({"params": params}, {"params": grafts})["params"]


def load_stage2_model(variables: Dict[str, Any], path: str):
    """Full stage-2 resume (train_net_dynamic.py:84-89): restores variables
    by template; returns (variables, epoch, opt_state_raw or None, extras).
    ``extras`` carries the mid-epoch resume fields the preemption save
    writes (train/preempt.py): ``step`` (completed steps of the
    interrupted epoch) and ``rng`` (the step PRNG key) — absent/default
    for regular per-eval checkpoints."""
    ckpt = load_checkpoint(path)
    restored = serialization.from_state_dict(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats", {})})
    out = dict(variables)
    out["params"] = restored["params"]
    if "batch_stats" in variables:
        out["batch_stats"] = restored["batch_stats"]
    extras = {"step": int(ckpt.get("step", 0)), "rng": ckpt.get("rng")}
    return out, int(ckpt.get("epoch", 0)), ckpt.get("opt_state"), extras


def prune_checkpoints(result_path: str, stage: int, keep: int):
    """Keep only the newest ``keep`` regular checkpoints of ``stage`` (plus
    the highest-accuracy one and every _preempt emergency save).  The
    reference keeps every per-eval file (train_net.py:120-128), which fills
    a disk on long runs; ``cfg.keep_checkpoints=0`` (default) preserves
    that behaviour.  Returns the removed filenames."""
    import re
    import shutil

    pat = re.compile(r"^stage%d_epoch(\d+)_([0-9.]+)%%\.ckpt$" % stage)
    entries = []
    for f in os.listdir(result_path):
        m = pat.match(f)
        if m:
            entries.append((int(m.group(1)), float(m.group(2)), f))
    if keep <= 0 or len(entries) <= keep:
        return []
    entries.sort()                                  # by epoch
    protected = {max(entries, key=lambda e: (e[1], e[0]))[2]}
    protected.update(f for _, _, f in entries[-keep:])
    removed = []
    for _, _, f in entries:
        if f not in protected:
            path = os.path.join(result_path, f)
            if os.path.isfile(path):
                os.remove(path)
            else:
                shutil.rmtree(path)                 # orbax saves are dirs
            removed.append(f)
    return removed
