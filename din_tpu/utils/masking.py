"""Masked-reduction helpers for variable actor counts.

The reference handles variable actor counts by per-sample python loops
slicing the true N (base_model.py:258-276, infer_model.py:1286-1314,
gcn_model.py:378-417) — shape-polymorphic control flow that cannot compile
to a single TPU program.  These helpers implement the masked-batching
equivalents (numerically identical: see tests/test_din.py
test_masked_equals_sliced and tests/test_models.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """max over `axis` counting only cells where mask (broadcastable) is
    True.  Falls back to the plain max when a slot has no valid cells."""
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    filled = jnp.where(mask, x, neg)
    out = jnp.max(filled, axis=axis)
    any_valid = jnp.any(mask, axis=axis)
    return jnp.where(any_valid, out, 0)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis) -> jnp.ndarray:
    num = jnp.sum(jnp.where(mask, x, 0), axis=axis)
    den = jnp.maximum(jnp.sum(mask.astype(x.dtype), axis=axis), 1)
    return num / den


def mask_actors(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero features of padded actors (mask broadcastable to x)."""
    return jnp.where(mask, x, 0)
