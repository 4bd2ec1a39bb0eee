"""TCE — Embfeature Context Encoding Transformer (AAAI'21 STBiP module).

Re-implements the reference's cross-attention of actor embeddings (queries)
against the full backbone context map (keys/values)
(infer_module/TCE_STBiP_module.py:224-312
``EmbfeatureContextEncodingTransformer`` / multi-head wrapper), plus the
bundled ``STBilinearMessagePassing`` spatio-temporal bilinear attention
(TCE_STBiP_module.py:12-121) that the AAAI'21 code ships but no model here
instantiates — provided for capability parity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from din_tpu.nn.layers import kaiming_normal_init
from din_tpu.ops.image import calc_pairwise_distance_3d


def _context_attend_ffn(emb, img, context_dropout, deterministic, dtype):
    """Shared TCE tail: attention of roi embeddings over OH*OW context
    cells + residual/LN/FFN (TCE_STBiP_module.py:175-193 and 271-285 — the
    raw-RoI and Embfeature variants share this block verbatim).  Must be
    called from a compact ``__call__`` (creates named submodules).

    emb: [BT, N, NFC]; img: [BT, OH, OW, NFC].  Returns [BT, N, NFC]."""
    BT, OH, OW, NFC = img.shape
    img_flat = img.reshape(BT, OH * OW, NFC)
    a = jnp.einsum("bnc,bpc->bnp", emb, img_flat, precision="highest")
    att = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(emb.dtype)
    ctx = jnp.einsum("bnp,bpc->bnc", att, img_flat, precision="highest")
    ctx = nn.Dropout(context_dropout, deterministic=deterministic,
                     name="dropout")(ctx)
    ctx = nn.LayerNorm(epsilon=1e-5, name="layernorm1")(ctx + emb)
    y = nn.Dense(NFC, kernel_init=nn.initializers.lecun_normal(),
                 precision="highest", dtype=dtype, name="FFN_1")(ctx)
    y = nn.relu(y)
    y = nn.Dropout(context_dropout, deterministic=deterministic,
                   name="FFN_dropout")(y)
    y = nn.Dense(NFC, kernel_init=nn.initializers.lecun_normal(),
                 precision="highest", dtype=dtype, name="FFN_2")(y)
    return nn.LayerNorm(epsilon=1e-5, name="layernorm2")(ctx + y)


class EmbfeatureContextEncoding(nn.Module):
    """One TCE head: roi embeddings attend over the OH*OW context cells.

    roi_features:  [BT, N, F_in]  (actor embeddings; F_in = NFB at layer 1)
    image_feature: [BT, OH, OW, D] context map (PE-augmented)
    Returns [BT, N, NFC] (TCE_STBiP_module.py:252-286).
    """

    num_features_context: int
    layer_id: int = 1
    context_dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_features, image_feature,
                 deterministic: bool = True):
        NFC = self.num_features_context

        # 1x1 conv downsample of the context (TCE_STBiP_module.py:229,266)
        img = nn.Dense(NFC, kernel_init=nn.initializers.lecun_normal()
                       if self.layer_id == 1 else kaiming_normal_init,
                       precision="highest", dtype=self.dtype,
                       name="downsample")(image_feature)
        emb = nn.Dense(NFC, kernel_init=nn.initializers.lecun_normal(),
                       precision="highest", dtype=self.dtype,
                       name="emb_roi")(roi_features)          # [BT,N,NFC]
        return _context_attend_ffn(emb, img, self.context_dropout,
                                   deterministic, self.dtype)


class ContextEncoding(nn.Module):
    """Raw-RoI TCE head (TCE_STBiP_module.py:129-194
    ``ContextEncodingTransformer``): layer 1 consumes the raw RoIAlign crop
    ([BT, N, K, K, D] here) — 1x1-downsampled to NFC, flattened, embedded —
    instead of fc_emb actor embeddings; layers > 1 consume the previous
    layer's concatenated head outputs.  Bundled AAAI'21 code with no model
    using it in the reference; provided for capability parity.
    """

    num_features_context: int
    layer_id: int = 1
    context_dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_features, image_feature,
                 deterministic: bool = True):
        NFC = self.num_features_context
        dense = lambda name: nn.Dense(
            NFC, kernel_init=kaiming_normal_init
            if name == "downsample" else nn.initializers.lecun_normal(),
            precision="highest", dtype=self.dtype, name=name)
        if self.layer_id == 1:
            # roi_features [BT, N, K, K, D]: 1x1 conv D->NFC, flatten K*K*NFC
            # (TCE_STBiP_module.py:169-176)
            BT, N = roi_features.shape[:2]
            roi = dense("downsample1")(roi_features)
            roi = roi.reshape(BT, N, -1)
            emb = dense("emb_roi")(roi)
            img = dense("downsample2")(image_feature)
        else:
            # roi_features [BT, N, NFC * num_heads] from the previous layer
            emb = dense("emb_roi")(roi_features)
            img = dense("downsample")(image_feature)
        return _context_attend_ffn(emb, img, self.context_dropout,
                                   deterministic, self.dtype)


class MultiHeadLayerContextEncoding(nn.Module):
    """Raw-RoI multi-head/multi-layer wrapper
    (TCE_STBiP_module.py:196-221): per layer the head outputs are
    concatenated and become the next layer's roi features."""

    num_heads: int
    num_layers: int
    num_features_context: int
    context_dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_features, image_feature,
                 deterministic: bool = True):
        x = roi_features
        for layer in range(self.num_layers):
            outs = [ContextEncoding(
                self.num_features_context, layer_id=layer + 1,
                context_dropout=self.context_dropout, dtype=self.dtype,
                name=f"CET_{layer}_{h}")(x, image_feature,
                                         deterministic=deterministic)
                for h in range(self.num_heads)]
            x = jnp.concatenate(outs, axis=-1)
        return x


class MultiHeadTCE(nn.Module):
    """num_heads x num_layers TCE; per layer the head outputs are
    concatenated and become the next layer's roi features
    (TCE_STBiP_module.py:289-312)."""

    num_heads: int
    num_layers: int
    num_features_context: int
    context_dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_features, image_feature,
                 deterministic: bool = True):
        x = roi_features
        for layer in range(self.num_layers):
            outs = [EmbfeatureContextEncoding(
                self.num_features_context, layer_id=layer + 1,
                context_dropout=self.context_dropout, dtype=self.dtype,
                name=f"CET_{layer}_{h}")(x, image_feature,
                                         deterministic=deterministic)
                for h in range(self.num_heads)]
            x = jnp.concatenate(outs, axis=-1)
        return x


def generate_spatial_mask(boxes: jnp.ndarray, threshold: float,
                          out_h: int) -> jnp.ndarray:
    """Distance mask from box centres: True where too far apart
    (TCE_STBiP_module.py:107-121).  boxes: [BT, N, 4]."""
    cx = (boxes[..., 0] + boxes[..., 2]) / 2.0
    cy = (boxes[..., 1] + boxes[..., 3]) / 2.0
    pos = jnp.stack([cx, cy], axis=-1).astype(jnp.float32)
    dist = calc_pairwise_distance_3d(pos, pos)
    return dist > (threshold * out_h)


class STBilinearMessagePassing(nn.Module):
    """Spatio-temporal bilinear attention over T*N tokens with a spatial
    mask (TCE_STBiP_module.py:12-69); multihead fusion 'sum'/'cat'
    (TCE_STBiP_module.py:71-103)."""

    emb_dim: int
    message_dim: int
    T: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, feature, mask):
        """feature: [B*T, N, F]; mask: [B, T*N, T*N] (True = suppress)."""
        BT, N, F = feature.shape
        T = self.T
        B = BT // T
        x = feature.reshape(B, T * N, F)
        dense = lambda feats, bias, name: nn.Dense(
            feats, use_bias=bias, kernel_init=nn.initializers.lecun_normal(),
            precision="highest", dtype=self.dtype, name=name)
        u = dense(self.emb_dim, True, "U")(x)
        v = dense(self.emb_dim, True, "V")(x)
        w_a = self.param("w_a", kaiming_normal_init, (1, self.emb_dim),
                         jnp.float32)
        u = u * w_a.astype(u.dtype)
        uv = jnp.einsum("bnf,bmf->bnm", u, v, precision="highest")
        uv = jnp.where(mask, -jnp.inf, uv.astype(jnp.float32))
        e = jax.nn.softmax(uv, axis=2).astype(x.dtype)
        e = jnp.where(jnp.isnan(e), 0.0, e)
        msg = dense(self.message_dim, False, "W_e2")(x)
        msg = jnp.einsum("bnm,bmf->bnf", e, msg, precision="highest")
        msg = nn.LayerNorm(epsilon=1e-5, name="layernorm")(msg)
        msg = nn.relu(msg)
        out = dense(self.emb_dim, False, "W_e1")(msg)
        return out.reshape(BT, N, -1)


class MultiHeadSTBilinear(nn.Module):
    """Multi-head wrapper with 'sum' or 'cat' fusion
    (TCE_STBiP_module.py:71-103)."""

    emb_dim: int
    message_dim: int
    num_heads: int
    T: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, feature, mask, fusion_method: str = "sum",
                 shortcut_connection: bool = False):
        outs = [STBilinearMessagePassing(
            self.emb_dim, self.message_dim, T=self.T, dtype=self.dtype,
            name=f"bilinear_{i}")(feature, mask)
            for i in range(self.num_heads)]
        if fusion_method == "sum":
            out = sum(outs)
            return feature + out if shortcut_connection else out
        out = jnp.concatenate(outs, axis=-1)
        return jnp.concatenate([out, feature], axis=-1)
