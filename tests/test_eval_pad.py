"""Padded-remainder eval batches + per-host data sharding.

Remainder eval batches are padded by cycling and masked via
``batch['sample_mask']`` (din_tpu/data/loader.py) so a single compiled eval
program covers every step; compute_losses must produce numbers identical to
the unpadded batch.  Multi-host: strided per-process shards of the shared
permutation must be disjoint and exhaustive.
"""

import numpy as np

import jax.numpy as jnp

from din_tpu.config import Config
from din_tpu.data.loader import BatchLoader
from din_tpu.train.losses import compute_losses


class _IdxDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.asarray(i, np.int64)}


def test_loader_pad_last_mask():
    ds = _IdxDataset(10)
    loader = BatchLoader(ds, 4, shuffle=False, num_workers=1,
                         drop_last=False, pad_last=True)
    batches = list(loader)
    assert len(batches) == 3
    assert all(b["idx"].shape == (4,) for b in batches)
    np.testing.assert_array_equal(batches[0]["sample_mask"], [1, 1, 1, 1])
    np.testing.assert_array_equal(batches[2]["sample_mask"], [1, 1, 0, 0])
    # padding cycles the short batch's own samples
    np.testing.assert_array_equal(batches[2]["idx"], [8, 9, 8, 9])


def test_loader_multihost_shards_disjoint_exhaustive():
    ds = _IdxDataset(11)
    seen = []
    for pi in range(3):
        loader = BatchLoader(ds, 2, shuffle=True, num_workers=1, seed=5,
                             drop_last=False, pad_last=True,
                             process_index=pi, process_count=3)
        for b in loader:
            mask = b["sample_mask"] > 0
            seen.extend(b["idx"][mask].tolist())
    assert sorted(seen) == list(range(11))   # disjoint + exhaustive


def test_loader_multihost_train_same_permutation_per_epoch():
    ds = _IdxDataset(8)
    a = BatchLoader(ds, 2, shuffle=True, num_workers=1, seed=3,
                    process_index=0, process_count=2)
    b = BatchLoader(ds, 2, shuffle=True, num_workers=1, seed=3,
                    process_index=1, process_count=2)
    ia = [int(x) for batch in a for x in batch["idx"]]
    ib = [int(x) for batch in b for x in batch["idx"]]
    assert not set(ia) & set(ib)
    assert sorted(ia + ib) == list(range(8))


def _fake_batch(rng, B, T, N, A, C):
    return {
        "activities": rng.randint(0, A, (B, T)).astype(np.int32),
        "actions": rng.randint(0, C, (B, T, N)).astype(np.int32),
    }


def test_compute_losses_sample_mask_equals_unpadded(rng):
    B, T, N, A, C = 3, 4, 5, 6, 7
    cfg = Config("volleyball").replace(num_activities=A, num_actions=C)
    batch = _fake_batch(rng, B, T, N, A, C)
    outputs = {
        "activities": jnp.asarray(rng.randn(B, A).astype(np.float32)),
        "actions": jnp.asarray(rng.randn(B * N, C).astype(np.float32)),
    }
    want = compute_losses(outputs, batch, cfg, frame0_labels=True)

    # pad to B+2 by cycling the first two clips, masked out
    pad = 2
    pad_batch = {k: np.concatenate([v, v[:pad]]) for k, v in batch.items()}
    pad_batch["sample_mask"] = np.asarray([1.0] * B + [0.0] * pad, np.float32)
    pad_outputs = {
        "activities": jnp.concatenate(
            [outputs["activities"], outputs["activities"][:pad]]),
        "actions": jnp.concatenate(
            [outputs["actions"], outputs["actions"][:pad * N]]),
    }
    got = compute_losses(pad_outputs, pad_batch, cfg, frame0_labels=True)

    np.testing.assert_allclose(float(got["loss"]), float(want["loss"]),
                               rtol=1e-6)
    assert int(got["activities_correct"]) == int(want["activities_correct"])
    assert int(got["activities_total"]) == int(want["activities_total"])
    assert int(got["actions_correct"]) == int(want["actions_correct"])
    assert int(got["actions_total"]) == int(want["actions_total"])
    np.testing.assert_array_equal(np.asarray(got["activities_conf"]),
                                  np.asarray(want["activities_conf"]))


def test_compute_losses_sample_mask_per_frame_labels(rng):
    """Stage-1 per-frame labels: mask expands over T (and T*N actions)."""
    B, T, N, A, C = 2, 3, 4, 5, 6
    cfg = Config("collective").replace(num_activities=A, num_actions=C)
    batch = _fake_batch(rng, B, T, N, A, C)
    outputs = {
        "activities": jnp.asarray(rng.randn(B * T, A).astype(np.float32)),
        "actions": jnp.asarray(rng.randn(B * T * N, C).astype(np.float32)),
    }
    want = compute_losses(outputs, batch, cfg, frame0_labels=False)

    pad = 1
    pad_batch = {k: np.concatenate([v, v[:pad]]) for k, v in batch.items()}
    pad_batch["sample_mask"] = np.asarray([1.0] * B + [0.0] * pad, np.float32)
    pad_outputs = {
        "activities": jnp.concatenate(
            [outputs["activities"], outputs["activities"][:pad * T]]),
        "actions": jnp.concatenate(
            [outputs["actions"], outputs["actions"][:pad * T * N]]),
    }
    got = compute_losses(pad_outputs, pad_batch, cfg, frame0_labels=False)
    np.testing.assert_allclose(float(got["loss"]), float(want["loss"]),
                               rtol=1e-6)
    assert int(got["activities_correct"]) == int(want["activities_correct"])
    assert int(got["activities_total"]) == int(want["activities_total"])


def test_loader_decode_ahead_order_and_content():
    """The decode-ahead ring buffer must preserve batch order/content."""
    ds = _IdxDataset(12)
    loader = BatchLoader(ds, 3, shuffle=False, num_workers=3, decode_ahead=3)
    got = [b["idx"].tolist() for b in loader]
    assert got == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]
