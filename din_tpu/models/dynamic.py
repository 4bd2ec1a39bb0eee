"""Stage-2 DIN models.

reference: infer_model.py:15-234 (Dynamic_volleyball), 237-468
(Dynamic_TCE_volleyball), 1135-1319 (Dynamic_collective).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from din_tpu.heads.din import (HierarchicalDynamicInference,
                               MultiDynamicInference)
from din_tpu.heads.positional import context_position_embedding_sine
from din_tpu.heads.tce import MultiHeadTCE
from din_tpu.models.trunk import EmbedActors, trunk_from_cfg as _make_trunk
from din_tpu.nn.layers import TorchLayerNorm, kaiming_normal_init
from din_tpu.utils.masking import mask_actors, masked_max


def _head_dense(features: int, name: str):
    return nn.Dense(features, kernel_init=kaiming_normal_init,
                    precision="highest", name=name)


def _make_dpi(cfg, in_dim, name="DPI"):
    common = dict(in_dim=in_dim, stride=cfg.stride,
                  dynamic_sampling=cfg.dynamic_sampling,
                  sampling_ratio=tuple(cfg.sampling_ratio), group=cfg.group,
                  scale_factor=cfg.scale_factor, beta_factor=cfg.beta_factor,
                  parallel_inference=cfg.parallel_inference, name=name)
    if cfg.hierarchical_inference:
        return HierarchicalDynamicInference(
            kernel_sizes=tuple(map(tuple, cfg.kernel_sizes)), **common)
    return MultiDynamicInference(
        kernel_sizes=tuple(map(tuple, cfg.kernel_sizes)), **common)


def _lite_bottleneck(cfg, feats, name_prefix=""):
    """1x1 conv NFB -> lite_dim + LayerNorm([T,N,lite]) + ReLU
    (infer_model.py:108-111,188-193); a 1x1 conv over the channel axis is a
    Dense in NHWC."""
    x = nn.Dense(cfg.lite_dim, kernel_init=nn.initializers.lecun_normal(),
                 precision="highest", name=f"{name_prefix}point_conv")(feats)
    x = TorchLayerNorm(ndims=3, name=f"{name_prefix}point_ln")(x)
    return nn.relu(x)


def _din_readout(cfg, graph_feats, boxes_feats, deterministic, name_scope):
    """Per-backbone LN/residual ordering (infer_model.py:203-216):
    res18 = LN on graph features then residual; every other backbone uses
    the vgg16 ordering (residual then LN) — the reference only wires these
    two and would crash otherwise; generalised by intent."""
    dpi_nl = TorchLayerNorm(ndims=3, name="dpi_nl")
    drop = nn.Dropout(cfg.train_dropout_prob, deterministic=deterministic,
                      name="dropout_global")
    if cfg.backbone == "res18":
        g = nn.relu(dpi_nl(graph_feats))
        states = drop(g + boxes_feats)
    else:
        states = drop(nn.relu(dpi_nl(graph_feats + boxes_feats)))
    return states


class DynamicVolleyball(nn.Module):
    """infer_model.py:15-234; returns {'activities': [B, G]}."""

    cfg: Any

    @nn.compact
    def __call__(self, images, boxes, bboxes_num=None, train: bool = False,
                 return_mad: bool = False):
        cfg = self.cfg
        B, T = images.shape[:2]
        roi, _, _ = _make_trunk(cfg)(images, boxes,
                                     bn_train=train and not cfg.set_bn_eval)
        feats = EmbedActors(nfb=cfg.num_features_boxes, use_layernorm=True,
                            name="embed")(roi)
        if cfg.lite_dim:
            feats = _lite_bottleneck(cfg, feats)
        graph, mad = _make_dpi(cfg, feats.shape[-1])(
            feats, deterministic=not train, return_mad=return_mad)
        states = _din_readout(cfg, graph, feats, not train, "din")
        pooled = jnp.max(states, axis=2)                      # [B,T,C]
        scores = _head_dense(cfg.num_activities, "fc_activities")(pooled)
        out = {"activities": jnp.mean(scores, axis=1)}
        if return_mad and mad is not None:
            # sampled neighbourhood features + their centre features, for
            # the MAD representation-smoothing diagnostic (utils.py:302-384)
            out["mad_features"] = mad
            out["mad_center"] = feats
        return out


class DynamicTCEVolleyball(nn.Module):
    """infer_model.py:237-468: trunk + context cross-attention (TCE)
    concatenated with actor features before DIN."""

    cfg: Any
    num_heads_context: int = 4
    num_features_context: int = 128

    @nn.compact
    def __call__(self, images, boxes, bboxes_num=None, train: bool = False):
        cfg = self.cfg
        B, T = images.shape[:2]
        N = cfg.num_boxes
        roi, _, outputs = _make_trunk(cfg)(
            images, boxes, bn_train=train and not cfg.set_bn_eval)
        feats = EmbedActors(nfb=cfg.num_features_boxes, use_layernorm=True,
                            name="embed")(roi)
        if cfg.lite_dim:
            feats = _lite_bottleneck(cfg, feats)

        # context positional encoding on the last backbone map
        # (infer_model.py:289,424-426): downscale 16, 512/2 features
        context = outputs[-1].astype(jnp.float32)
        context = context_position_embedding_sine(
            context, downscale_ratio=16, num_pos_feats=context.shape[-1] // 2)
        tce = MultiHeadTCE(num_heads=self.num_heads_context, num_layers=1,
                           num_features_context=self.num_features_context,
                           name="tce")(
            feats.reshape(B * T, N, -1), context, deterministic=not train)
        feats = jnp.concatenate(
            [feats, tce.reshape(B, T, N, -1).astype(feats.dtype)], axis=-1)

        graph, _ = _make_dpi(cfg, feats.shape[-1])(
            feats, deterministic=not train)
        states = _din_readout(cfg, graph, feats, not train, "din")
        pooled = jnp.max(states, axis=2)
        scores = _head_dense(cfg.num_activities, "fc_activities")(pooled)
        return {"activities": jnp.mean(scores, axis=1)}


class DynamicCollective(nn.Module):
    """infer_model.py:1135-1319 with masked MAX_N batching instead of the
    per-sample loop (numerically equivalent: tests/test_models.py).
    Returns {'activities': [B, G]}."""

    cfg: Any

    @nn.compact
    def __call__(self, images, boxes, bboxes_num=None, train: bool = False):
        cfg = self.cfg
        B, T = images.shape[:2]
        MAX_N = cfg.num_boxes
        roi, _, _ = _make_trunk(cfg)(images, boxes,
                                     bn_train=train and not cfg.set_bn_eval)
        feats = EmbedActors(nfb=cfg.num_features_boxes, use_layernorm=True,
                            name="embed")(roi)
        if cfg.lite_dim:
            feats = _lite_bottleneck(cfg, feats)

        # the reference slices the first frame's count for the whole clip
        # (infer_model.py:1289)
        n_valid = bboxes_num[:, 0]
        mask = jnp.arange(MAX_N)[None, None] < n_valid[:, None, None]
        mask = jnp.broadcast_to(mask, (B, T, MAX_N))
        feats = mask_actors(feats, mask[..., None])

        graph, _ = _make_dpi(cfg, feats.shape[-1])(
            feats, deterministic=not train)
        states = graph + feats                                # [B,T,N,C]
        # per-actor LayerNorm([T, C]) (infer_model.py:1201,1299-1302)
        states = jnp.swapaxes(states, 1, 2)                   # [B,N,T,C]
        states = TorchLayerNorm(ndims=2, name="dpi_nl")(states)
        states = nn.relu(states)
        states = nn.Dropout(cfg.train_dropout_prob, deterministic=not train,
                            name="dropout_global")(states)
        states = jnp.swapaxes(states, 1, 2)                   # [B,T,N,C]

        pooled = masked_max(states, mask[..., None], axis=2)  # [B,T,C]
        scores = _head_dense(cfg.num_activities, "fc_activities")(pooled)
        return {"activities": jnp.mean(scores, axis=1)}
