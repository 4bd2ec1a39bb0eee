"""Stage-1 base models: backbone finetuning with per-frame classifiers.

reference: base_model.py:6-142 (Basenet_volleyball), base_model.py:145-284
(Basenet_collective).  The collective variant replaces the reference's
per-sample python loop over true actor counts (base_model.py:258-276) with
masked batching over MAX_N (SURVEY.md §7.8): padded actors are excluded from
the activity max-pool and flagged in ``actions_mask`` for the loss.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from din_tpu.models.trunk import EmbedActors, trunk_from_cfg
from din_tpu.nn.layers import kaiming_normal_init
from din_tpu.utils.masking import masked_max


def _head_dense(features: int, name: str):
    return nn.Dense(features, kernel_init=kaiming_normal_init,
                    precision="highest", name=name)


class BasenetVolleyball(nn.Module):
    """reference base_model.py:6-142; returns
    {'actions': [B*N, A], 'activities': [B, G]}."""

    cfg: Any

    @nn.compact
    def __call__(self, images, boxes, bboxes_num=None, train: bool = False):
        cfg = self.cfg
        B, T = images.shape[:2]
        N = cfg.num_boxes
        roi, _, _ = trunk_from_cfg(cfg)(
            images, boxes, bn_train=train and not cfg.set_bn_eval)
        # stage-1 embedding: fc_emb + ReLU + dropout (base_model.py:119-121)
        feats = EmbedActors(nfb=cfg.num_features_boxes, use_layernorm=False,
                            dropout=cfg.train_dropout_prob,
                            name="embed")(roi, deterministic=not train)

        actions = _head_dense(cfg.num_actions, "fc_actions")(feats)
        pooled = jnp.max(feats, axis=2)                       # [B,T,NFB]
        activities = _head_dense(cfg.num_activities, "fc_activities")(pooled)

        # temporal fusion (base_model.py:138-141)
        actions = jnp.mean(actions, axis=1).reshape(B * N, -1)
        activities = jnp.mean(activities, axis=1)
        return {"actions": actions, "activities": activities}


class BasenetCollective(nn.Module):
    """reference base_model.py:145-284, masked-batched; returns
    {'actions': [B*T*MAX_N, A], 'activities': [B*T, G],
     'actions_mask': [B*T*MAX_N]}."""

    cfg: Any

    @nn.compact
    def __call__(self, images, boxes, bboxes_num=None, train: bool = False):
        cfg = self.cfg
        B, T = images.shape[:2]
        MAX_N = cfg.num_boxes
        roi, _, _ = trunk_from_cfg(cfg)(
            images, boxes, bn_train=train and not cfg.set_bn_eval)
        feats = EmbedActors(nfb=cfg.num_features_boxes, use_layernorm=False,
                            dropout=cfg.train_dropout_prob,
                            name="embed")(roi, deterministic=not train)

        # validity mask from the true per-frame actor counts
        # (collective.py:199-203 pads with zero boxes / -1 actions)
        n_idx = jnp.arange(MAX_N)[None, None]
        mask = n_idx < bboxes_num[:, :, None]                 # [B,T,MAX_N]

        actions = _head_dense(cfg.num_actions, "fc_actions")(feats)
        pooled = masked_max(feats, mask[..., None], axis=2)   # [B,T,NFB]
        activities = _head_dense(cfg.num_activities, "fc_activities")(pooled)

        return {
            "actions": actions.reshape(B * T * MAX_N, -1),
            "activities": activities.reshape(B * T, -1),
            "actions_mask": mask.reshape(B * T * MAX_N),
        }
