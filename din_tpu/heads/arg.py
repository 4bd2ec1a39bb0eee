"""ARG — Actor Relation Graphs (CVPR'19 baseline head).

Re-implements the reference's ``GCN_Module`` (gcn_model.py:6-87; duplicate
copy infer_module/ARG_infer_module.py:6-91): NG parallel relation graphs,
each with theta/phi embeddings (NFG->NFR), scaled dot-product affinity, a
distance mask (pairwise box-centre distance > pos_threshold * OW =>
-inf before row-softmax), graph conv + LayerNorm + ReLU, graphs summed.

All NG graphs are computed as one batched einsum over a stacked parameter
axis instead of a python loop over ModuleLists — same math, one MXU pass.
The reference's in-place mutation of ``boxes_in_flat`` into centres
(gcn_model.py:50-51) becomes a pure centre computation.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from din_tpu.nn.layers import kaiming_normal_init
from din_tpu.ops.image import calc_pairwise_distance_3d


class GCNModule(nn.Module):
    """One ARG layer over [B', N', NFG] token sets (B' = B, N' = T*N for
    volleyball; B' = 1, N' = T*N_real for the reference collective path)."""

    num_features_gcn: int                 # NFG
    num_features_relation: int            # NFR
    num_graph: int                        # NG
    pos_threshold: float                  # distance mask threshold
    out_w: int                            # OW of the feature map
    layernorm_over_tokens: bool = True    # volleyball: LN([T*N, NFG]);
    # collective: LN([NFG]) (gcn_model.py:27-30)
    dtype: Any = None

    @nn.compact
    def __call__(self, graph_features: jnp.ndarray,
                 boxes: jnp.ndarray,
                 token_mask: Optional[jnp.ndarray] = None):
        """graph_features [B, Nt, NFG]; boxes [B, Nt, 4] feature coords.

        token_mask [B, Nt] optional (True = valid): masked batching for
        variable actor counts replaces the reference's per-sample slicing.
        Returns (features [B, Nt, NFG], relation_graph [B, Nt, Nt]).
        """
        B, Nt, NFG = graph_features.shape
        NFR, NG = self.num_features_relation, self.num_graph

        # distance mask over box centres (gcn_model.py:48-56)
        cx = (boxes[..., 0] + boxes[..., 2]) / 2.0
        cy = (boxes[..., 1] + boxes[..., 3]) / 2.0
        pos = jnp.stack([cx, cy], axis=-1).astype(jnp.float32)
        dist = calc_pairwise_distance_3d(pos, pos)
        position_mask = dist > (self.pos_threshold * self.out_w)
        if token_mask is not None:
            invalid = ~(token_mask[:, :, None] & token_mask[:, None, :])
            position_mask = position_mask | invalid

        # stacked theta/phi/gcn weights for all NG graphs
        theta_w = self.param("theta_kernel", kaiming_normal_init,
                             (NG, NFG, NFR), jnp.float32)
        theta_b = self.param("theta_bias", nn.initializers.zeros,
                             (NG, NFR), jnp.float32)
        phi_w = self.param("phi_kernel", kaiming_normal_init,
                           (NG, NFG, NFR), jnp.float32)
        phi_b = self.param("phi_bias", nn.initializers.zeros,
                           (NG, NFR), jnp.float32)
        gcn_w = self.param("gcn_kernel", kaiming_normal_init,
                           (NG, NFG, NFG), jnp.float32)

        x = graph_features
        theta = jnp.einsum("bnf,gfr->bgnr", x, theta_w.astype(x.dtype),
                           precision="highest") + theta_b.astype(x.dtype)[None, :, None]
        phi = jnp.einsum("bnf,gfr->bgnr", x, phi_w.astype(x.dtype),
                         precision="highest") + phi_b.astype(x.dtype)[None, :, None]
        sim = jnp.einsum("bgnr,bgmr->bgnm", theta, phi,
                         precision="highest") / jnp.sqrt(float(NFR))
        sim = jnp.where(position_mask[:, None], -jnp.inf, sim.astype(jnp.float32))
        relation = jax.nn.softmax(sim, axis=-1)
        # fully-masked rows produce NaN softmax; zero them (padded tokens)
        relation = jnp.where(jnp.isnan(relation), 0.0, relation)

        agg = jnp.einsum("bgnm,bmf->bgnf", relation.astype(x.dtype), x,
                         precision="highest")
        out = jnp.einsum("bgnf,gfh->bgnh", agg, gcn_w.astype(x.dtype),
                         precision="highest")

        # Per-graph LayerNorm + ReLU, then sum over graphs.  The reference
        # instantiates NG separate LayerNorms (gcn_model.py:27-30) —
        # volleyball normalises over [T*N, NFG] jointly, collective over
        # [NFG] — so the affine params here carry a leading NG axis.
        if self.layernorm_over_tokens:
            ln_axes, ln_shape = (-2, -1), (NG, Nt, NFG)
        else:
            ln_axes, ln_shape = (-1,), (NG, 1, NFG)
        scale = self.param("nl_gcn_scale", nn.initializers.ones,
                           ln_shape, jnp.float32)
        bias = self.param("nl_gcn_bias", nn.initializers.zeros,
                          ln_shape, jnp.float32)
        o32 = out.astype(jnp.float32)
        mean = jnp.mean(o32, axis=ln_axes, keepdims=True)
        var = jnp.var(o32, axis=ln_axes, keepdims=True)
        normed = (o32 - mean) * jax.lax.rsqrt(var + 1e-5)
        normed = normed * scale[None] + bias[None]
        normed = nn.relu(normed).astype(x.dtype)
        return jnp.sum(normed, axis=1), relation[:, -1]
