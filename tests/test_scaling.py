"""Multi-chip scaling analysis (din_tpu/parallel/scaling.py): the compiled
sharded step's collective traffic is inspectable and matches what the
layouts promise — grads all-reduced once (DataParallel parity, SURVEY.md
§2.7), frame-parallel resharding local (no SPMD replicate-then-repartition
fallback, PERF.md)."""

import jax
import numpy as np

from __graft_entry__ import _flagship_cfg
from din_tpu.parallel.scaling import (analyze_step, parse_collectives,
                                      ring_bytes_per_chip)


def test_parse_collectives_variadic_and_groups():
    """Parser handles scalar and variadic (tuple + /*index*/ comments)
    collectives and both replica_groups grammars."""
    hlo = """
  %all-reduce.1 = f32[64]{0} all-reduce(%x), replica_groups={{0,1,2,3},{4,5,6,7}}, to_apply=%add
  %all-reduce.2 = (f32[3,3,64,64]{3,2,1,0}, f32[64]{0}, /*index=2*/bf16[128]{0}) all-reduce(%a, %b, %c), channel_id=7, replica_groups=[1,8]<=[8], use_global_device_ids=true, to_apply=%add
  %ag = f32[16,32]{1,0} all-gather(%y), replica_groups={{0,1}}, dimensions={0}
  %gte = f32[64]{0} get-tuple-element(%all-reduce.1), index=0
"""
    cs = parse_collectives(hlo)
    assert [c["op"] for c in cs] == ["all-reduce", "all-reduce",
                                     "all-gather"]
    assert cs[0]["bytes"] == 64 * 4 and cs[0]["group_size"] == 4
    assert cs[1]["bytes"] == 3 * 3 * 64 * 64 * 4 + 64 * 4 + 128 * 2
    assert cs[1]["group_size"] == 8
    assert cs[2]["bytes"] == 16 * 32 * 4 and cs[2]["group_size"] == 2


def test_parse_collectives_async_start_counts_results_only():
    """Async collectives (all-gather-start etc.) return a tuple of
    (operands..., results...) — only the result half is traffic; counting
    the operand aliases would double the bytes."""
    hlo = """
  %ag = (f32[16,32]{1,0}, f32[32,32]{1,0}) all-gather-start(%y), replica_groups={{0,1}}, dimensions={0}
  %ar = (f32[64]{0}, f32[64]{0}) all-reduce-start(%x), replica_groups={{0,1,2,3}}, to_apply=%add
"""
    cs = parse_collectives(hlo)
    assert [c["op"] for c in cs] == ["all-gather", "all-reduce"]
    assert cs[0]["bytes"] == 32 * 32 * 4          # result half only
    assert cs[1]["bytes"] == 64 * 4


def test_ring_model():
    assert ring_bytes_per_chip("all-reduce", 100, 1) == 0
    assert np.isclose(ring_bytes_per_chip("all-reduce", 800, 8), 1400.0)
    assert np.isclose(ring_bytes_per_chip("all-gather", 800, 8), 700.0)
    # reduce-scatter's HLO output is the per-device SHARD — each chip
    # moves (n-1) shard-sized messages around the ring
    assert np.isclose(ring_bytes_per_chip("reduce-scatter", 100, 8), 700.0)


def test_dp_grad_allreduce_matches_param_bytes():
    """Data-parallel mesh: the program all-reduces the gradients exactly
    once — total all-reduce bytes = param bytes + small BN-stat/metric
    reductions (the declarative analogue of DataParallel's hidden
    gradient gather)."""
    cfg = _flagship_cfg(tiny=True).replace(
        mesh_shape={"data": 8, "model": 1}, batch_size=8)
    r = analyze_step(cfg, 8)
    ar_bytes = sum(c["bytes"] for c in r["collectives"]
                   if c["op"] == "all-reduce")
    assert r["param_bytes"] > 1e6
    ratio = ar_bytes / r["param_bytes"]
    assert 0.99 <= ratio <= 1.15, (ar_bytes, r["param_bytes"])
    # nothing else moves: no all-gathers/reduce-scatters in plain dp
    assert all(c["op"] == "all-reduce" for c in r["collectives"])


def test_frame_parallel_reshard_is_local():
    """Sequence(frame) parallelism: the trunk<->head resharding must be a
    local all-to-all / bounded gather, NOT SPMD's replicate-the-frame-
    tensor fallback (PERF.md 'Frame-parallel input reshape')."""
    cfg = _flagship_cfg(tiny=True).replace(
        mesh_shape={"data": 4, "model": 2}, batch_size=8,
        frame_chunk=8)
    r = analyze_step(cfg, 8, frame_parallel=True)
    ops = {c["op"] for c in r["collectives"]}
    assert "all-reduce" in ops     # grad sync still present
    ag_total = sum(c["bytes"] for c in r["collectives"]
                   if c["op"] == "all-gather")
    ag_max = max([c["bytes"] for c in r["collectives"]
                  if c["op"] == "all-gather"], default=0)
    # the fallback gathered the full frame tensor (and recompiled the
    # trunk per shard); the fixed path moves only head-boundary tensors
    assert ag_total < 6e6, ag_total
    assert ag_max < 4e6, ag_max
