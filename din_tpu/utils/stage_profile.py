"""Per-stage wall-time/MFU attribution for backbones (prefix differencing).

jax.profiler traces cannot be captured over this environment's remote
device tunnel, so per-op attribution is done by compiling successive plan
prefixes of the backbone and differencing adjacent wall times and
compiled-HLO flop counts.  This is the tool that located the v5e stem
bottlenecks (64-lane convs, pool layouts) behind ROADMAP item 2.

CLI:  python -m din_tpu.utils.stage_profile [--canonical] [--chunk 8]
          [--size 720x1280] [--backbone vgg16|inv3|res18|res50]

Non-VGG backbones use their ``stop_at`` attribute (block-granularity
prefixes) instead of plan truncation.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12


def _flops_of(f, *args) -> float:
    a = f.lower(*args).compile().cost_analysis()
    if isinstance(a, list):
        a = a[0]
    return float(dict(a or {}).get("flops", float("nan")))


def profile_vgg(chunk: int = 8, size=(720, 1280), folded: bool = True,
                iters: int = 6, peak: float = V5E_BF16_PEAK):
    """Yields (stage_name, delta_ms, delta_tflop, stage_mfu, cum_ms)."""
    from din_tpu.nn.backbones import _VGG, _VGG16_PLAN

    rng = np.random.RandomState(0)
    H, W = size
    x = jnp.asarray(rng.rand(chunk, H, W, 3), jnp.bfloat16)
    names, idx = [], 0
    for item in _VGG16_PLAN:
        names.append(f"pool{idx}" if item == "M" else f"conv{idx}_{item}")
        idx += 1
    prev_t = prev_f = 0.0
    start = 3 if folded else 1           # the folded stem is indivisible
    for n in range(start, len(_VGG16_PLAN) + 1):
        mod = _VGG(plan=tuple(_VGG16_PLAN[:n]), dtype=jnp.bfloat16,
                   folded_stem=folded)
        params = mod.init(jax.random.PRNGKey(0), x)
        g = jax.jit(jax.grad(
            lambda p, xx: mod.apply(p, xx)[0].astype(jnp.float32).sum()))
        try:
            fl = _flops_of(g, params, x)
        except Exception:
            fl = float("nan")
        o = g(params, x)
        _ = float(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            o = g(params, x)
        _ = float(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).sum())
        t = (time.perf_counter() - t0) / iters
        dt, df = t - prev_t, fl - prev_f
        label = "stem(0-2)" if (folded and n == 3) else names[n - 1]
        yield (label, dt * 1e3, df / 1e12,
               df / dt / peak if dt > 0 else float("nan"), t * 1e3)
        prev_t, prev_f = t, fl


_STAGES = {
    "inv3": ["stem", "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
             "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"],
    "res18": ["stem", "layer1", "layer2", "layer3", "layer4"],
    "res50": ["stem", "layer1", "layer2", "layer3", "layer4"],
}


def profile_stop_at(backbone: str, chunk: int = 8, size=(720, 1280),
                    iters: int = 6, peak: float = V5E_BF16_PEAK,
                    train_bn: bool = False):
    """Prefix-difference a stop_at-capable backbone (inv3/res18/res50):
    yields (stage, delta_ms, delta_tflop, stage_mfu, cum_ms) for fwd+bwd
    (grad wrt params; BN in running-average mode unless train_bn)."""
    from din_tpu.nn.backbones import build_backbone

    rng = np.random.RandomState(0)
    H, W = size
    x = jnp.asarray(rng.rand(chunk, H, W, 3) * 2 - 1, jnp.bfloat16)
    full = build_backbone(backbone, dtype=jnp.bfloat16)
    variables = full.init(jax.random.PRNGKey(0), x, False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    prev_t = prev_f = 0.0
    for stage in _STAGES[backbone]:
        mod = build_backbone(backbone, dtype=jnp.bfloat16, stop_at=stage)

        def loss(p, xx, mod=mod):
            variables = {"params": p, "batch_stats": stats}
            if train_bn:
                outs, _ = mod.apply(variables, xx, True,
                                    mutable=["batch_stats"])
            else:
                outs = mod.apply(variables, xx, False)
            return sum(o.astype(jnp.float32).sum() for o in outs)

        g = jax.jit(jax.grad(loss))
        try:
            fl = _flops_of(g, params, x)
        except Exception:
            fl = float("nan")
        o = g(params, x)
        _ = float(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            o = g(params, x)
        _ = float(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).sum())
        t = (time.perf_counter() - t0) / iters
        dt, df = t - prev_t, fl - prev_f
        yield (stage, dt * 1e3, df / 1e12,
               df / dt / peak if dt > 0 else float("nan"), t * 1e3)
        prev_t, prev_f = t, fl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--canonical", action="store_true",
                    help="profile with the folded stem disabled")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--size", default="720x1280")
    ap.add_argument("--backbone", default="vgg16")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))
    print(f"{'prefix':>14} {'d_ms':>8} {'d_tflop':>9} {'stageMFU':>9} "
          f"{'cum_ms':>8}")
    if args.backbone in _STAGES:
        rows = profile_stop_at(args.backbone, chunk=args.chunk, size=(H, W))
    else:
        rows = profile_vgg(chunk=args.chunk, size=(H, W),
                           folded=not args.canonical)
    for row in rows:
        print(f"{row[0]:>14} {row[1]:8.2f} {row[2]:9.3f} {row[3]:9.3f} "
              f"{row[4]:8.1f}", flush=True)


if __name__ == "__main__":
    main()
