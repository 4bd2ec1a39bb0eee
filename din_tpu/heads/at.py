"""AT — Actor Transformer (Gavrilyuk et al. CVPR'20 baseline head).

Re-implements the reference's single-layer single-head self-attention over
the N actors of each frame (or over temporally-pooled actors),
post-LN residual + FFN (infer_module/AT_infer_module.py:100-144).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from din_tpu.nn.layers import kaiming_normal_init


class ActorTransformer(nn.Module):
    """x: [B', N', C] token sets -> same shape.

    The caller reshapes [B,T,N,C] to [B*T,N,C] (or mean-pools T first —
    AT_infer_module.py:124-128).
    """

    in_dim: int
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        dense = lambda feats, bias, name: nn.Dense(
            feats, use_bias=bias, kernel_init=kaiming_normal_init,
            precision="highest", dtype=self.dtype, name=name)
        q = dense(self.in_dim, False, "Q_W")(x)
        k = dense(self.in_dim, False, "K_W")(x)
        v = dense(self.in_dim, False, "V_W")(x)
        att = jnp.einsum("bnc,bmc->bnm", q, k, precision="highest")
        att = att.astype(jnp.float32) / jnp.sqrt(float(self.in_dim))
        att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
        att_v = jnp.einsum("bnm,bmc->bnc", att, v, precision="highest")

        att_v = nn.Dropout(self.dropout, deterministic=deterministic,
                           name="dropout1")(att_v)
        x = nn.LayerNorm(epsilon=1e-5, name="layernorm1")(x + att_v)
        y = dense(self.in_dim, True, "FFN_linear1")(x)
        y = nn.relu(y)
        # the reference applies dropout2 inside the FFN and again on its
        # output (AT_infer_module.py:139-143)
        y = nn.Dropout(self.dropout, deterministic=deterministic,
                       name="dropout2a")(y)
        y = dense(self.in_dim, True, "FFN_linear2")(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic,
                       name="dropout2b")(y)
        return nn.LayerNorm(epsilon=1e-5, name="layernorm2")(x + y)
