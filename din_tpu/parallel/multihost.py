"""Multi-host (multi-process) initialisation.

The reference is strictly single-machine (nn.DataParallel,
train_net.py:77-78).  For TPU pods, each host process calls
``initialize_multihost()`` before any other JAX call; the mesh in
din_tpu.parallel.mesh then spans all pod chips (ICI within a slice) and the
BatchLoader shards the file list per process so each host feeds its local
chips (data parallel over DCN-free ICI collectives).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> dict:
    """Wraps jax.distributed.initialize; no-op on a single process (TPU
    pod environments auto-discover when args are None)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        # single-process / already initialised
        pass
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def shard_indices_for_process(n_items: int, process_index: Optional[int] = None,
                              process_count: Optional[int] = None):
    """Per-host slice of the dataset index space (host data sharding)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(range(pi, n_items, pc))
