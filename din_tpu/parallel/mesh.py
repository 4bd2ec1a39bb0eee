"""Device mesh + sharding layout.

The reference's entire parallelism story is single-process
``nn.DataParallel`` (train_net.py:77-78).  The TPU-native equivalent
(SURVEY.md §2.7): a ``jax.sharding.Mesh`` with a ``data`` axis over ICI,
batches sharded on it, parameters replicated; the SPMD partitioner inserts
the gradient all-reduce.  A ``model`` axis is reserved for tensor-parallel
sharding of wide layers (unused at reference parity, validated by the
multi-chip dry-run in __graft_entry__.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(cfg=None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = dict(getattr(cfg, "mesh_shape", None) or {})
    n = len(devices)
    data = shape.get("data", 0) or n // max(shape.get("model", 1), 1)
    model = shape.get("model", 1)
    data = max(1, min(data, n))
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def frame_axes(cfg):
    """Mesh axes the trunk shards the flattened B*T frame axis over — the
    backbone is embarrassingly parallel over frames.  With
    cfg.frame_parallel both mesh axes carry frames (scales the trunk even
    at batch sizes nn.DataParallel cannot split); otherwise frames ride
    the 'data' axis only.  The plain-dp constraint is NOT redundant: at
    full resolution the trunk scans over frame chunks, and the
    [B*T]->[chunks,chunk] packing crosses batch-shard boundaries — without
    an explicit constraint the SPMD partitioner REPLICATES the whole scan
    on every device (verified on the compiled flagship step:
    parallel/scaling.py showed while-body convs at full chunk size per
    partition, i.e. zero trunk speedup from dp).  The engine installs the
    mesh ambiently (jax.set_mesh) whenever it has >1 device; constraints
    no-op without one, so single-chip programs are unchanged."""
    return ("data", "model") if getattr(cfg, "frame_parallel", False) \
        else ("data",)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def frame_batch_sharding(mesh: Mesh):
    """Input layout for sequence(frame) parallelism: batch over 'data' AND
    the per-clip frame (T) axis over 'model', so the trunk's reshape to a
    (B*T)-over-('data','model') frame axis is a LOCAL resharding on the
    single-chunk path (dim merge with matching outer/inner shardings);
    plain batch_sharding makes SPMD fully replicate the full-resolution
    clip tensor first.  NOTE: the chunked scan path (frame_chunk < B*T)
    still reshards at the chunk-packing reshape when chunk boundaries
    don't align with shard boundaries — pick frame_chunk as a multiple
    of the device count there.  Arrays without a frame axis (sample_mask
    [B]) shard over 'data' only.  Returns a callable for
    prefetch_to_device's per-batch sharding hook."""
    n_model = mesh.shape["model"]

    def shard_for(batch):
        # device_put requires divisible dims: frame axes that don't divide
        # the model axis (e.g. T=10, model=4) fall back to batch-only
        # sharding — the trunk's internal constraint still spreads frames
        return {k: NamedSharding(mesh, P("data", "model"))
                if getattr(v, "ndim", 1) >= 2 and v.shape[1] % n_model == 0
                else NamedSharding(mesh, P("data"))
                for k, v in batch.items()}
    return shard_for


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def opt_state_sharding(mesh: Mesh, opt_state, axis: str = "data",
                       align_model: bool = False):
    """ZeRO-1 layout for the optimizer state (cfg.shard_opt_state).

    Replicated Adam moments cost 2x param bytes on EVERY chip — for a
    framework whose flagship recipe is HBM-bound (remat + frame chunking
    exist purely to fit memory, PERF.md) that is the cheapest memory to
    reclaim when scaling out.  Each array leaf is sharded over the
    ``axis`` mesh axis along its largest divisible dimension; scalars
    (step count, injected learning_rate) and indivisible leaves stay
    replicated.  Exact by construction: the Adam moment update is
    elementwise, so this is a pure layout annotation — the SPMD
    partitioner computes each moment shard from the (already all-reduced)
    gradient shard and only the param-sized update re-materialises
    replicated, which is the ZeRO-1 recipe (arXiv:1910.02054) expressed
    as shardings instead of hand-written reduce-scatter/all-gather.
    Per-chip optimizer memory: 2x params -> 2x/n.  Equivalence + layout
    asserted in tests/test_parallel.py.

    ``align_model=True`` (tensor-parallel runs): the last dim of each 2-D+
    leaf is pinned to 'model' first, mirroring ``param_sharding``, so
    model-sharded grads produce moment shards without any resharding; the
    ZeRO ``axis`` then takes the largest remaining divisible dim."""
    n = mesh.shape[axis]
    n_model = mesh.shape["model"] if align_model else 1

    def leaf_sharding(leaf):
        shape = getattr(leaf, "shape", ())
        spec = [None] * len(shape)
        if n_model > 1 and len(shape) >= 2 and shape[-1] % n_model == 0:
            spec[-1] = "model"                  # mirror param_sharding
        if n > 1 and shape:
            divisible = [(d, i) for i, d in enumerate(shape)
                         if d % n == 0 and spec[i] is None]
            if divisible:
                _, i = max(divisible)
                spec[i] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(leaf_sharding, opt_state)


def param_sharding(mesh: Mesh, params):
    """Tensor-parallel layout over the 'model' axis: 2-D+ kernels whose
    last (output-feature) dim divides the axis are sharded there, everything
    else replicated.  With model=1 this degenerates to replication."""
    n_model = mesh.shape["model"]

    def leaf_sharding(leaf):
        if (n_model > 1 and hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.shape[-1] % n_model == 0):
            spec = [None] * (leaf.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(leaf_sharding, params)
