"""Stage-2 baseline models: PCTDM, HiGCIN, AT, ARG, SACRF+BiUTE, and the
legacy GCN trainer models.

reference: infer_model.py:472-608 (PCTDM_volleyball), 611-733
(HiGCIN_volleyball), 736-867 (AT_volleyball), 870-1023 (ARG_volleyball),
1026-1131 (SACRF_BiUTE_volleyball); gcn_model.py:89-433 (GCNnet_volleyball /
GCNnet_collective, the legacy ARG trainer with action heads and 3-crop
evaluation).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from din_tpu.heads.arg import GCNModule
from din_tpu.heads.at import ActorTransformer
from din_tpu.heads.higcin import CrossInferBlock
from din_tpu.heads.pctdm import PCTDM
from din_tpu.heads.positional import boxes_position_embedding
from din_tpu.heads.sacrf_biute import SACRF, BiUTE
from din_tpu.models.trunk import EmbedActors, trunk_from_cfg as _make_trunk
from din_tpu.nn.layers import TorchLayerNorm, kaiming_normal_init
from din_tpu.utils.masking import mask_actors, masked_max


def _head_dense(features: int, name: str):
    return nn.Dense(features, kernel_init=kaiming_normal_init,
                    precision="highest", name=name)


def _three_crop(images, boxes):
    """Eval-time 3-crop split: [B, T] -> [3B, T/3]
    (gcn_model.py:161-165, infer_model.py:939-943)."""
    B, T = images.shape[:2]
    images = images.reshape((B * 3, T // 3) + images.shape[2:])
    boxes = boxes.reshape((B * 3, T // 3) + boxes.shape[2:])
    return images, boxes


def _three_crop_average(scores):
    """[3B, G] -> [B, G] (gcn_model.py:247-250)."""
    b3 = scores.shape[0]
    return jnp.mean(scores.reshape(b3 // 3, 3, -1), axis=1)


class PCTDMVolleyball(nn.Module):
    """infer_model.py:472-608; returns {'activities': [B, G]}."""

    cfg: Any

    @nn.compact
    def __call__(self, images, boxes, bboxes_num=None, train: bool = False):
        cfg = self.cfg
        B, T = images.shape[:2]
        roi, _, _ = _make_trunk(cfg)(images, boxes,
                                     bn_train=train and not cfg.set_bn_eval)
        feats = EmbedActors(nfb=cfg.num_features_boxes, use_layernorm=True,
                            name="embed")(roi)
        x = PCTDM(num_players=cfg.num_boxes,
                  input_size=cfg.num_features_boxes,
                  name="pctdm")(feats)                       # [B*T, 2000]
        x = x.reshape(B, T, -1)
        x = TorchLayerNorm(ndims=2, name="pctdm_nl")(x)
        x = nn.relu(x)
        x = nn.Dropout(cfg.train_dropout_prob, deterministic=not train,
                       name="dropout_global")(x)
        scores = _head_dense(cfg.num_activities, "fc_activities")(x)
        return {"activities": jnp.mean(scores, axis=1)}


class HiGCINVolleyball(nn.Module):
    """infer_model.py:611-733: BIM at body level (T x K^2 grid per person),
    avg-pool over K^2, PIM at person level (T x N); works on raw RoI
    features (no fc_emb).  Returns {'activities': [B, G]}."""

    cfg: Any

    @nn.compact
    def __call__(self, images, boxes, bboxes_num=None, train: bool = False):
        cfg = self.cfg
        B, T = images.shape[:2]
        N = cfg.num_boxes
        K = cfg.crop_size[0]
        D = cfg.emb_features
        roi, _, _ = _make_trunk(cfg)(images, boxes,
                                     bn_train=train and not cfg.set_bn_eval)
        # [B,T,N,K,K,D] -> per-person body grid [B*N, T, K*K, D]
        x = roi.reshape(B, T, N, K * K, D).astype(jnp.float32)
        x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(B * N, T, K * K, D)
        x = CrossInferBlock(in_dim=D, name="BIM")(x, train=train)
        x = jnp.mean(x, axis=2)                               # [B*N, T, D]
        x = x.reshape(B, N, T, D).transpose(0, 2, 1, 3)       # [B,T,N,D]
        x = CrossInferBlock(in_dim=D, name="PIM")(x, train=train)
        x = nn.Dropout(0.5, deterministic=not train, name="dropout")(x)
        pooled = jnp.max(x, axis=2)
        scores = nn.Dense(cfg.num_activities, use_bias=False,
                          kernel_init=kaiming_normal_init,
                          precision="highest", name="fc_activities")(pooled)
        return {"activities": jnp.mean(scores, axis=1)}


class ATVolleyball(nn.Module):
    """infer_model.py:736-867; returns {'activities': [B, G]}."""

    cfg: Any

    @nn.compact
    def __call__(self, images, boxes, bboxes_num=None, train: bool = False):
        cfg = self.cfg
        B, T = images.shape[:2]
        N = cfg.num_boxes
        NFB = cfg.num_features_boxes
        roi, _, _ = _make_trunk(cfg)(images, boxes,
                                     bn_train=train and not cfg.set_bn_eval)
        feats = EmbedActors(nfb=NFB, use_layernorm=True, name="embed")(roi)
        feats = boxes_position_embedding(feats, boxes, tuple(cfg.image_size),
                                         tuple(cfg.out_size))
        at = ActorTransformer(in_dim=NFB, name="AT")
        if cfg.temporal_pooled_first:
            x = at(jnp.mean(feats, axis=1), deterministic=not train)  # [B,N,C]
            pooled = jnp.max(x, axis=1)                       # [B,C]
            scores = _head_dense(cfg.num_activities, "fc_activities")(pooled)
            return {"activities": scores}
        x = at(feats.reshape(B * T, N, NFB), deterministic=not train)
        x = x.reshape(B, T, N, NFB)
        pooled = jnp.max(x, axis=2)
        scores = _head_dense(cfg.num_activities, "fc_activities")(pooled)
        return {"activities": jnp.mean(scores, axis=1)}


class ARGVolleyball(nn.Module):
    """infer_model.py:870-1023 (stage-2 'arg_volleyball'): GCN layers +
    residual, activities only, 3-crop eval averaging."""

    cfg: Any

    @nn.compact
    def __call__(self, images, boxes, bboxes_num=None, train: bool = False):
        cfg = self.cfg
        three_crop = (not train) and images.shape[1] % 3 == 0 \
            and images.shape[1] > cfg.num_frames
        if three_crop:
            images, boxes = _three_crop(images, boxes)
        B, T = images.shape[:2]
        N = cfg.num_boxes
        NFG = cfg.num_features_gcn
        roi, _, _ = _make_trunk(cfg)(images, boxes,
                                     bn_train=train and not cfg.set_bn_eval)
        feats = EmbedActors(nfb=cfg.num_features_boxes, use_layernorm=True,
                            name="embed")(roi)
        graph = feats.reshape(B, T * N, NFG)
        flat_boxes = boxes.reshape(B, T * N, 4)
        for i in range(cfg.gcn_layers):
            graph, _ = GCNModule(
                num_features_gcn=NFG,
                num_features_relation=cfg.num_features_relation,
                num_graph=cfg.num_graph, pos_threshold=cfg.pos_threshold,
                out_w=cfg.out_size[1], layernorm_over_tokens=True,
                name=f"gcn_{i}")(graph, flat_boxes)
        states = graph.reshape(B, T, N, NFG) + feats
        states = nn.Dropout(cfg.train_dropout_prob, deterministic=not train,
                            name="dropout_global")(states)
        pooled = jnp.max(states, axis=2)
        scores = _head_dense(cfg.num_activities, "fc_activities")(pooled)
        scores = jnp.mean(scores, axis=1)
        if three_crop:
            scores = _three_crop_average(scores)
        return {"activities": scores}


class SACRFBiUTEVolleyball(nn.Module):
    """infer_model.py:1026-1131; returns actions + activities + halting."""

    cfg: Any

    @nn.compact
    def __call__(self, images, boxes, bboxes_num=None, train: bool = False):
        cfg = self.cfg
        B, T = images.shape[:2]
        N = cfg.num_boxes
        NFB = cfg.num_features_boxes
        roi, _, _ = _make_trunk(cfg)(images, boxes,
                                     bn_train=train and not cfg.set_bn_eval)
        feats = EmbedActors(nfb=NFB, use_layernorm=True, name="embed")(roi)
        q_hat, c_v, halt_loss = SACRF(
            in_dim=NFB, num_actions=cfg.num_actions,
            image_size=tuple(cfg.image_size), out_size=tuple(cfg.out_size),
            name="SACRF")(feats, boxes, deterministic=not train)
        group = BiUTE(in_dim=NFB, num_boxes=N, name="BiUTE")(c_v)
        scores = _head_dense(cfg.num_activities, "fc_activities")(group)
        actions = jnp.mean(q_hat, axis=1).reshape(B * N, -1)
        activities = jnp.mean(scores, axis=1)
        return {"actions": actions, "activities": activities,
                "halting": halt_loss, "boxes_states": c_v}


class GCNNetVolleyball(nn.Module):
    """Legacy stage-2 trainer model (gcn_model.py:89-253): GCN + residual,
    action AND activity heads, 3-crop eval."""

    cfg: Any

    @nn.compact
    def __call__(self, images, boxes, bboxes_num=None, train: bool = False):
        cfg = self.cfg
        three_crop = (not train) and images.shape[1] % 3 == 0 \
            and images.shape[1] > cfg.num_frames
        if three_crop:
            images, boxes = _three_crop(images, boxes)
        B, T = images.shape[:2]
        N = cfg.num_boxes
        NFG = cfg.num_features_gcn
        roi, _, _ = _make_trunk(cfg)(images, boxes,
                                     bn_train=train and not cfg.set_bn_eval)
        feats = EmbedActors(nfb=cfg.num_features_boxes, use_layernorm=True,
                            name="embed")(roi)
        graph = feats.reshape(B, T * N, NFG)
        flat_boxes = boxes.reshape(B, T * N, 4)
        for i in range(cfg.gcn_layers):
            graph, _ = GCNModule(
                num_features_gcn=NFG,
                num_features_relation=cfg.num_features_relation,
                num_graph=cfg.num_graph, pos_threshold=cfg.pos_threshold,
                out_w=cfg.out_size[1], layernorm_over_tokens=True,
                name=f"gcn_{i}")(graph, flat_boxes)
        states = graph.reshape(B, T, N, NFG) + feats
        states = nn.Dropout(cfg.train_dropout_prob, deterministic=not train,
                            name="dropout_global")(states)

        actions = _head_dense(cfg.num_actions, "fc_actions")(states)
        actions = jnp.mean(actions, axis=1).reshape(B * N, -1)
        pooled = jnp.max(states, axis=2)
        activities = _head_dense(cfg.num_activities, "fc_activities")(pooled)
        activities = jnp.mean(activities, axis=1)
        if three_crop:
            actions = jnp.mean(
                actions.reshape(B // 3, 3, N, -1), axis=1).reshape(-1,
                                                                   actions.shape[-1])
            activities = _three_crop_average(activities)
        return {"actions": actions, "activities": activities}


class GCNNetCollective(nn.Module):
    """Legacy collective GCN model (gcn_model.py:258-433), masked-batched:
    per-sample GCN over T*MAX_N tokens with validity masking replaces the
    per-sample loop (gcn_model.py:378-417)."""

    cfg: Any

    @nn.compact
    def __call__(self, images, boxes, bboxes_num=None, train: bool = False):
        cfg = self.cfg
        # eval-time 3-crop (gcn_model.py:322-327)
        three_crop = (not train) and images.shape[1] % 3 == 0 \
            and images.shape[1] > cfg.num_frames
        if three_crop:
            images, boxes = _three_crop(images, boxes)
            bboxes_num = bboxes_num.reshape(images.shape[:2])
        B, T = images.shape[:2]
        MAX_N = cfg.num_boxes
        NFG = cfg.num_features_gcn
        roi, _, _ = _make_trunk(cfg)(images, boxes,
                                     bn_train=train and not cfg.set_bn_eval)
        feats = EmbedActors(nfb=cfg.num_features_boxes, use_layernorm=True,
                            name="embed")(roi)
        n_valid = bboxes_num[:, 0]
        mask = jnp.arange(MAX_N)[None, None] < n_valid[:, None, None]
        mask = jnp.broadcast_to(mask, (B, T, MAX_N))
        feats = mask_actors(feats, mask[..., None])

        graph = feats.reshape(B, T * MAX_N, NFG)
        flat_boxes = boxes.reshape(B, T * MAX_N, 4)
        token_mask = mask.reshape(B, T * MAX_N)
        for i in range(cfg.gcn_layers):
            graph, _ = GCNModule(
                num_features_gcn=NFG,
                num_features_relation=cfg.num_features_relation,
                num_graph=cfg.num_graph, pos_threshold=cfg.pos_threshold,
                out_w=cfg.out_size[1], layernorm_over_tokens=False,
                name=f"gcn_{i}")(graph, flat_boxes, token_mask=token_mask)
        states = graph.reshape(B, T, MAX_N, NFG) + feats
        states = nn.Dropout(cfg.train_dropout_prob, deterministic=not train,
                            name="dropout_global")(states)

        actions = _head_dense(cfg.num_actions, "fc_actions")(states)
        actions = jnp.mean(actions, axis=1)                    # [B,MAX_N,A]
        pooled = masked_max(states, mask[..., None], axis=2)   # [B,T,C]
        activities = _head_dense(cfg.num_activities, "fc_activities")(pooled)
        activities = jnp.mean(activities, axis=1)
        amask = mask[:, 0]
        if three_crop:
            # average the 3 crops (gcn_model.py:424-427)
            actions = jnp.mean(actions.reshape(B // 3, 3, MAX_N, -1), axis=1)
            activities = _three_crop_average(activities)
            amask = amask.reshape(B // 3, 3, MAX_N)[:, 0]
            B = B // 3
        return {"actions": actions.reshape(B * MAX_N, -1),
                "activities": activities,
                "actions_mask": amask.reshape(B * MAX_N)}
