"""Benchmark: training throughput of the flagship recipe on one TPU chip.

Measures steady-state clips/sec of the full compiled training step
(backbone fwd+bwd + RoIAlign + DIN + loss + Adam) for the reference's
headline config — stage-2 DIN volleyball, VGG-16, T=10 frames, N=12 actors,
720x1280 input, lite_dim=128 (scripts/train_volleyball_stage2_dynamic.py) —
on synthetic device-resident batches (input pipeline excluded; it is
overlapped via host prefetch in real training).

``vs_baseline``: the reference publishes no throughput (BASELINE.md). The
comparison point is an analytic TITAN-RTX estimate for the same recipe:
VGG-16 at 720x1280 is ~285 GFLOP/frame forward, x3 for fwd+bwd, x10 frames
= ~8.6 TFLOP/clip; TITAN RTX fp32 peak 16.3 TFLOPS at ~50% utilisation
gives ~1.0 clip/sec.  vs_baseline = measured / 1.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

TITAN_RTX_CLIPS_PER_SEC_EST = 1.0


def main():
    from __graft_entry__ import _flagship_cfg, _make_batch
    from din_tpu.models.registry import build_model
    from din_tpu.train.engine import TrainState, init_model, make_train_step
    from din_tpu.train.optim import make_optimizer

    # throughput config: batch 4 clips (40 frames), 8-frame backbone
    # micro-batches (sublane-aligned, fits HBM with remat); saturates the
    # chip — bs8 gives the same clips/sec
    cfg = _flagship_cfg(tiny=False).replace(batch_size=4, frame_chunk=8)
    batch_size = cfg.batch_size
    model = build_model(cfg)
    batch = _make_batch(cfg, batch_size=batch_size)
    variables = init_model(cfg, model, batch)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       rng=jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, tx, frame0_labels=True,
                           has_bn=bool(variables.get("batch_stats")),
                           donate=True)

    dbatch = jax.device_put(batch)
    t0 = time.perf_counter()
    state, metrics = step(state, dbatch)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.perf_counter() - t0

    # NOTE: device->host transfer (float()) is the sync point; the remote
    # device tunnel used in this environment does not honour
    # block_until_ready reliably.
    warmup, iters = 3, 10
    for _ in range(warmup):
        state, metrics = step(state, dbatch)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, dbatch)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    clips_per_sec = batch_size / dt
    result = {
        "metric": "train_clips_per_sec_din_vgg16_t10_bs%d" % batch_size,
        "value": round(clips_per_sec, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / TITAN_RTX_CLIPS_PER_SEC_EST, 3),
    }
    print(json.dumps(result))
    import sys
    print(f"# step {dt*1e3:.1f} ms  compile {compile_s:.1f}s  "
          f"loss {float(metrics['loss']):.4f}  device {jax.devices()[0]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
