"""Multi-chip scaling analysis from compiled sharded programs.

The reference's parallelism is opaque: ``nn.DataParallel`` hides its
scatter/gather traffic entirely (train_net.py:77-78).  Here parallelism is
declarative (parallel/mesh.py) and the SPMD partitioner inserts explicit
ICI collectives — so the communication cost of any mesh layout can be read
directly off the compiled HLO.  This tool compiles the REAL training step
over an n-device mesh (the same construction as __graft_entry__.py's
dryrun) and reports:

- per-device HLO flops,
- every collective in the optimized program (op, shapes, bytes, group size),
- ring-model ICI traffic per chip and an analytic step-time decomposition
  at v5e rates (labeled estimates, not measurements).

Runs on the virtual host-CPU mesh — no TPU pod required:

    PYTHONPATH=<repo> JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m din_tpu.parallel.scaling --devices 8 --mode dp

(Under the axon shim this module relaunches itself into that environment,
same as dryrun_multichip.)
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

# v5e datasheet-level constants for the ANALYTIC model (clearly estimates:
# the measured numbers live in PERF.md).  Peak bf16 MXU rate; ICI modeled
# as one ring axis at ~90 GB/s bidirectional (2 x 45 GB/s links).
V5E_PEAK_BF16_FLOPS = 197e12
V5E_ICI_RING_BYTES_PER_S = 90e9
# measured flagship MFU (PERF.md headline) for the "at observed efficiency"
# compute-time column
MEASURED_FLAGSHIP_MFU = 0.66

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_COLLECTIVE_RE = re.compile(
    r"=\s*(?P<outs>\(?[a-z0-9]+\[[0-9,]*\][^=]*?)\s*"
    r"(?P<op>all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)(?:-start)?\(")
_SHAPE_RE = re.compile(r"([a-z]+[0-9]+|pred)\[([0-9,]*)\]")
_GROUPS_BRACE_RE = re.compile(r"replica_groups=\{\{([0-9,]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def parse_collectives(hlo_text: str) -> List[Dict[str, Any]]:
    """Every collective instruction in optimized HLO: op, output shapes,
    output bytes, and the participant-group size if parseable."""
    out = []
    for line in hlo_text.splitlines():
        # variadic collectives carry /*index=N*/ comments inside the output
        # tuple — strip them before matching (the '=' breaks the regex)
        line = re.sub(r"/\*.*?\*/", "", line)
        m = _COLLECTIVE_RE.search(line)
        if not m:
            continue
        shapes = _SHAPE_RE.findall(m.group("outs"))
        if "-start(" in line and len(shapes) > 1 and len(shapes) % 2 == 0:
            # async start ops return (operands..., results...) — count only
            # the result half, or the operand aliases double the bytes
            shapes = shapes[len(shapes) // 2:]
        total = sum(_shape_bytes(dt, dims) for dt, dims in shapes)
        group = None
        gb = _GROUPS_BRACE_RE.search(line)
        if gb:
            group = len(gb.group(1).split(","))
        else:
            gi = _GROUPS_IOTA_RE.search(line)
            if gi:
                group = int(gi.group(2))
        out.append({
            "op": m.group("op"),
            "shapes": ["%s[%s]" % s for s in shapes],
            "bytes": total,
            "group_size": group,
        })
    return out


def ring_bytes_per_chip(op: str, out_bytes: int, group: int) -> float:
    """ICI bytes each chip moves for one collective under the standard
    ring algorithms (the scaling model XLA's collectives follow on a
    torus axis)."""
    n = max(group or 1, 1)
    if n == 1:
        return 0.0
    frac = (n - 1) / n
    if op == "all-reduce":
        return 2.0 * frac * out_bytes          # reduce-scatter + all-gather
    if op == "reduce-scatter":
        # HLO output is the per-device SHARD: each chip moves (n-1) shards
        return (n - 1.0) * out_bytes
    if op in ("all-gather", "all-to-all"):
        # HLO output is the full result; each chip moves (n-1)/n of it
        return frac * out_bytes
    if op == "collective-permute":
        return float(out_bytes)
    return float(out_bytes)


def analyze_step(cfg, n_devices: int, frame_parallel: bool = False,
                 devices=None) -> Dict[str, Any]:
    """Compile the full sharded training step (dryrun construction) and
    extract flops + collectives from the optimized HLO.

    Everything is lowered from abstract values (eval_shape +
    ShapeDtypeStruct-with-sharding), so no tensor is ever materialised and
    the FULL flagship geometry analyses in compile time only — even on the
    virtual host-CPU mesh."""
    import jax

    from din_tpu.data.synthetic import make_synthetic_batch
    from din_tpu.models.registry import build_model
    from din_tpu.parallel.mesh import (batch_sharding, frame_batch_sharding,
                                       make_mesh, param_sharding,
                                       replicated_sharding)
    from din_tpu.train.engine import TrainState, init_model, make_train_step
    from din_tpu.train.optim import make_optimizer

    devices = devices if devices is not None else jax.devices()[:n_devices]
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)} — run on the "
        f"virtual CPU mesh (module docstring)")
    mesh = make_mesh(cfg, devices=devices[:n_devices])

    if frame_parallel:
        cfg = cfg.replace(frame_parallel=True)
    model = build_model(cfg)
    batch = make_synthetic_batch(cfg, batch_size=cfg.batch_size)
    batch_abs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch)
    variables = jax.eval_shape(lambda b: init_model(cfg, model, b),
                               batch_abs)
    tx = make_optimizer(cfg, variables["params"])
    opt_abs = jax.eval_shape(tx.init, variables["params"])
    rng_abs = jax.eval_shape(lambda: jax.random.PRNGKey(0))

    rep = replicated_sharding(mesh)
    p_shard = param_sharding(mesh, variables["params"]) if not frame_parallel \
        else jax.tree_util.tree_map(lambda _: rep, variables["params"])

    def with_sharding(tree, sharding_tree):
        return jax.tree_util.tree_map(
            lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
            tree, sharding_tree)

    def rep_tree(tree):
        return with_sharding(tree,
                             jax.tree_util.tree_map(lambda _: rep, tree))

    state = TrainState(
        params=with_sharding(variables["params"], p_shard),
        batch_stats=rep_tree(variables.get("batch_stats", {})),
        opt_state=rep_tree(opt_abs),
        rng=jax.ShapeDtypeStruct(rng_abs.shape, rng_abs.dtype, sharding=rep))
    shard_fn = frame_batch_sharding(mesh) if frame_parallel \
        else batch_sharding(mesh)
    batch_shardings = shard_fn(batch_abs) if callable(shard_fn) else \
        jax.tree_util.tree_map(lambda _: shard_fn, batch_abs)
    sharded_batch = with_sharding(batch_abs, batch_shardings)

    step = make_train_step(model, cfg, tx, frame0_labels=True,
                           has_bn=bool(variables.get("batch_stats")),
                           donate=False)
    # ambient mesh exactly as the engine installs it (mesh.size > 1):
    # required for the trunk's frame-sharding constraints in BOTH modes
    with jax.set_mesh(mesh):
        compiled = step.lower(state, sharded_batch).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    analysis = dict(analysis or {})
    collectives = parse_collectives(compiled.as_text())

    param_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(variables["params"]))
    ici_per_chip = sum(
        ring_bytes_per_chip(c["op"], c["bytes"],
                            c["group_size"] or n_devices)
        for c in collectives)
    return {
        "mesh": dict(mesh.shape),
        "frame_parallel": frame_parallel,
        "flops_per_device": float(analysis.get("flops", float("nan"))),
        "param_bytes": param_bytes,
        "collectives": collectives,
        "ici_bytes_per_chip": ici_per_chip,
    }


def format_report(r: Dict[str, Any]) -> str:
    """Human-readable scaling report with the analytic v5e step-time
    decomposition (estimates labeled as such)."""
    lines = []
    mode = "frame-parallel" if r["frame_parallel"] else "data-parallel(+tp)"
    lines.append(f"mesh={r['mesh']}  mode={mode}")
    lines.append(f"per-device HLO flops: {r['flops_per_device']/1e12:.3f} "
                 f"TFLOP/step")
    by_op: Dict[str, Dict[str, float]] = {}
    for c in r["collectives"]:
        d = by_op.setdefault(c["op"], {"count": 0, "bytes": 0})
        d["count"] += 1
        d["bytes"] += c["bytes"]
    for op, d in sorted(by_op.items()):
        lines.append(f"  {op:<20} x{int(d['count']):<4} "
                     f"{d['bytes']/1e6:.3f} MB output")
    if not by_op:
        lines.append("  (no collectives — single-device program)")
    lines.append(f"ring-model ICI traffic: "
                 f"{r['ici_bytes_per_chip']/1e6:.3f} MB/chip/step")
    comp_ideal = r["flops_per_device"] / V5E_PEAK_BF16_FLOPS
    comp_meas = comp_ideal / MEASURED_FLAGSHIP_MFU
    ici = r["ici_bytes_per_chip"] / V5E_ICI_RING_BYTES_PER_S
    lines.append(
        f"analytic v5e step time: compute {comp_meas*1e3:.1f} ms "
        f"(at measured MFU {MEASURED_FLAGSHIP_MFU}), "
        f"ICI {ici*1e3:.2f} ms — comm/compute = {ici/max(comp_meas,1e-12):.4f}"
        f" (serial lower bound; XLA overlaps in practice)")
    return "\n".join(lines)


def _relaunch_on_cpu_mesh(n_devices: int, argv) -> int:
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    return subprocess.call(
        [sys.executable, "-m", "din_tpu.parallel.scaling"] + argv,
        env=env, cwd=repo)


def main(argv: Optional[list] = None):
    import argparse
    import os
    import sys

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", default=None,
                        help="experiment preset (default: the tiny dryrun "
                             "geometry)")
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--model-axis", type=int, default=1)
    parser.add_argument("--mode", choices=["dp", "frame_parallel"],
                        default="dp")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--shard-local", choices=["auto", "on", "off"],
                        default=None,
                        help="override cfg.shard_local_chunks for A/B of "
                             "the shard-local chunk packing")
    args = parser.parse_args(argv)

    import jax
    if len(jax.devices()) < args.devices and \
            "axon" in os.environ.get("PYTHONPATH", ""):
        sys.exit(_relaunch_on_cpu_mesh(
            args.devices, argv if argv is not None else sys.argv[1:]))

    from __graft_entry__ import _flagship_cfg
    from din_tpu.experiments.presets import PRESETS
    cfg = PRESETS[args.preset]() if args.preset else _flagship_cfg(tiny=True)
    data_axis = args.devices // args.model_axis
    cfg = cfg.replace(
        mesh_shape={"data": data_axis, "model": args.model_axis},
        batch_size=args.batch_size or max(cfg.batch_size, data_axis))
    if args.shard_local:
        cfg = cfg.replace(shard_local_chunks=args.shard_local)
    r = analyze_step(cfg, args.devices,
                     frame_parallel=args.mode == "frame_parallel")
    print(format_report(r))


if __name__ == "__main__":
    main()
