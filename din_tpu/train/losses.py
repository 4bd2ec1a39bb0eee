"""Losses + in-graph metrics.

reference loss protocol (train_net_dynamic.py:190-216): sum of the present
output keys — CE(activities) + actions_loss_weight * weighted-CE(actions)
+ halting * halting_penalty.  Collective action labels are padded with -1
(collective.py:203); padded entries carry zero weight (the reference instead
concatenated only valid actors, train_net.py:283-294 — same loss value up to
the mean denominator, which uses the true count here too).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  class_weights: Optional[jnp.ndarray] = None,
                  valid_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch F.cross_entropy semantics: weighted mean with the weight of
    each sample's true class as denominator."""
    logits = logits.astype(jnp.float32)
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = class_weights[safe_labels]
    else:
        w = jnp.ones_like(nll)
    if valid_mask is not None:
        w = w * valid_mask.astype(w.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def accuracy_counts(logits, labels, valid_mask=None):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels)
    if valid_mask is not None:
        correct = correct & valid_mask
        total = jnp.sum(valid_mask)
    else:
        total = labels.size
    return jnp.sum(correct), total


def confusion_matrix(logits, labels, num_classes, valid_mask=None):
    """[K, K] (rows = truth) accumulated in-graph (cf. utils.py:217-264)."""
    pred = jnp.argmax(logits, axis=-1).reshape(-1)
    lab = jnp.clip(labels.reshape(-1), 0, num_classes - 1)
    onehot_p = jax.nn.one_hot(pred, num_classes)
    onehot_l = jax.nn.one_hot(lab, num_classes)
    if valid_mask is not None:
        onehot_l = onehot_l * valid_mask.reshape(-1, 1)
    return jnp.einsum("nk,nj->kj", onehot_l, onehot_p)


def compute_losses(outputs: Dict, batch: Dict, cfg,
                   frame0_labels: bool) -> Dict:
    """Returns dict(loss=..., metrics pieces).  ``frame0_labels``: stage-2
    takes clip labels from frame 0 (train_net_dynamic.py:182-184); stage-1
    collective uses per-frame labels (train_net.py:296-299)."""
    metrics = {}
    loss = 0.0

    # optional per-clip validity (padded remainder eval batches — loader
    # pad_last); expanded below to whatever label granularity applies
    sample_mask = batch.get("sample_mask")                  # [B] or None
    sm_bool = None if sample_mask is None else sample_mask > 0

    activities_in = batch["activities"]                     # [B, T]
    B, T = activities_in.shape
    if frame0_labels:
        act_labels = activities_in[:, 0]
        act_valid = sm_bool
    else:
        act_labels = activities_in.reshape(-1)
        act_valid = None if sm_bool is None else \
            jnp.repeat(sm_bool, T)
    act_scores = outputs["activities"]
    if act_scores.shape[0] != act_labels.shape[0]:
        # volleyball stage-1: scores [B, G] vs per-frame labels — frame 0
        act_labels = activities_in[:, 0]
        act_valid = sm_bool
    a_loss = cross_entropy(act_scores, act_labels, valid_mask=act_valid)
    loss = loss + a_loss
    c, t = accuracy_counts(act_scores, act_labels, act_valid)
    metrics["activities_loss"] = a_loss
    metrics["activities_correct"] = c
    metrics["activities_total"] = t
    metrics["activities_conf"] = confusion_matrix(
        act_scores, act_labels, cfg.num_activities, act_valid)

    if "actions" in outputs:
        actions_in = batch["actions"]                       # [B, T, N]
        act_mask = outputs.get("actions_mask")
        n_out = outputs["actions"].shape[0]
        B, T, N = actions_in.shape
        if n_out == B * N:
            labels = actions_in[:, 0].reshape(-1)           # frame-0 labels
            per_clip = N
        else:                                               # per-frame
            labels = actions_in.reshape(-1)
            per_clip = T * N
        valid = labels >= 0
        if act_mask is not None:
            valid = valid & act_mask.reshape(-1)
        if sm_bool is not None:
            valid = valid & jnp.repeat(sm_bool, per_clip)
        weights = None
        wl = cfg.action_weight_list
        if wl is not None:
            weights = jnp.asarray(wl, jnp.float32)
        ac_loss = cross_entropy(outputs["actions"], labels, weights, valid)
        loss = loss + cfg.actions_loss_weight * ac_loss
        c, t = accuracy_counts(outputs["actions"], labels, valid)
        metrics["actions_loss"] = ac_loss
        metrics["actions_correct"] = c
        metrics["actions_total"] = t

    if "halting" in outputs:
        loss = loss + outputs["halting"] * cfg.halting_penalty

    metrics["loss"] = loss
    return metrics
