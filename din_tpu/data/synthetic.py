"""Synthetic fixture dataset: deterministic random clips with plausible
tracks, for CI / benchmarking without the real videos (SURVEY.md §4)."""

from __future__ import annotations

import numpy as np


class SyntheticDataset:
    """Emits batches with the same schema as the real datasets."""

    def __init__(self, cfg, size=64, is_training=True, seed=0):
        self.cfg = cfg
        self.size = size
        self.is_training = is_training
        self.seed = seed
        self.T = 1 if (cfg.training_stage == 1 and is_training) else \
            cfg.num_frames
        if cfg.training_stage == 1 and not is_training:
            self.T = cfg.num_frames

    def __len__(self):
        return self.size

    def __getitem__(self, index):
        cfg = self.cfg
        rng = np.random.RandomState(self.seed * 100003 + index)
        H, W = cfg.image_size
        OH, OW = cfg.out_size
        N = cfg.num_boxes
        T = self.T
        images = rng.randint(0, 255, (T, H, W, 3)).astype(np.uint8)
        x1 = rng.uniform(0, max(OW - 2, 1), (T, N))
        y1 = rng.uniform(0, max(OH - 2, 1), (T, N))
        w = rng.uniform(0.5, 2.0, (T, N))
        h = rng.uniform(0.5, 2.0, (T, N))
        boxes = np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)
        actions = rng.randint(0, cfg.num_actions, (T, N)).astype(np.int32)
        activities = np.full((T,), rng.randint(cfg.num_activities),
                             np.int32)
        sample = {"images": images, "boxes": boxes, "actions": actions,
                  "activities": activities}
        if cfg.dataset_name == "collective":
            n_valid = rng.randint(2, N + 1)
            counts = np.full((T,), n_valid, np.int32)
            boxes[:, n_valid:] = 0.0
            actions[:, n_valid:] = -1
            sample["bboxes_num"] = counts
        return sample


def make_synthetic_batch(cfg, batch_size, rng=None):
    """One stacked synthetic batch at cfg geometry (images/boxes/labels,
    plus collective bboxes_num) — init shapes for serving/export, bench
    fixtures, and the driver entry points (__graft_entry__ delegates
    here so library modules never import the repo-root harness)."""
    rng = rng or np.random.RandomState(0)
    H, W = cfg.image_size
    T, N = cfg.num_frames, cfg.num_boxes
    OH, OW = cfg.out_size
    images = rng.randint(0, 255, (batch_size, T, H, W, 3)).astype(np.uint8)
    x1 = rng.uniform(0, max(OW - 2, 1), (batch_size, T, N))
    y1 = rng.uniform(0, max(OH - 2, 1), (batch_size, T, N))
    boxes = np.stack([x1, y1, x1 + 1.5, y1 + 1.5], -1).astype(np.float32)
    actions = rng.randint(0, cfg.num_actions,
                          (batch_size, T, N)).astype(np.int32)
    activities = rng.randint(0, cfg.num_activities,
                             (batch_size, T)).astype(np.int32)
    batch = {"images": images, "boxes": boxes, "actions": actions,
             "activities": activities}
    if cfg.dataset_name == "collective":
        # variable true actor counts + -1-padded actions (data/collective.py);
        # the count is constant within a clip (loader contract: the model
        # reads bboxes_num[:, 0], models/dynamic.py)
        bn = np.repeat(rng.randint(1, N + 1, (batch_size, 1)), T,
                       axis=1).astype(np.int32)
        mask = np.arange(N)[None, None, :] < bn[:, :, None]
        batch["actions"] = np.where(mask, actions, -1).astype(np.int32)
        batch["bboxes_num"] = bn
    return batch
