"""PCTDM — Participation-Contributed Temporal Dynamic Model (Yan et al.).

Re-implements the reference's ``PCTDM`` head
(infer_module/pctdm_infer_module.py:9-133): players-as-sequence BiLSTM,
"early pooling" (elementwise max of forward/backward states), split into two
teams of N/2, context-conditioned attention per team, one-to-all intra-group
LSTM whose last hidden state summarises each team, concat -> [B*T, 2*hidden].

LSTMs are expressed as ``lax.scan`` over a fused [C, 4H] gate kernel in torch
gate order (i, f, g, o) so torch LSTM weights port directly
(weight_ih_l0/weight_hh_l0 -> kernel_i/kernel_h, b_ih + b_hh -> bias).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from din_tpu.nn.layers import kaiming_normal_init


class TorchLSTM(nn.Module):
    """Unidirectional LSTM over axis 1 of [B, L, C], torch semantics."""

    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        B, L, C = x.shape
        H = self.hidden

        # torch init: uniform(-1/sqrt(H), 1/sqrt(H))
        def shifted_uniform(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype,
                                      -float(1.0 / H ** 0.5),
                                      float(1.0 / H ** 0.5))

        w_i = self.param("kernel_i", shifted_uniform, (C, 4 * H))
        w_h = self.param("kernel_h", shifted_uniform, (H, 4 * H))
        b = self.param("bias", shifted_uniform, (4 * H,))

        def step(carry, xt):
            h, c = carry
            gates = (xt @ w_i.astype(xt.dtype) + h @ w_h.astype(xt.dtype)
                     + b.astype(xt.dtype))
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        h0 = jnp.zeros((B, H), x.dtype)
        (_, _), ys = jax.lax.scan(step, (h0, h0), jnp.swapaxes(x, 0, 1))
        return jnp.swapaxes(ys, 0, 1)  # [B, L, H]


class BiTorchLSTM(nn.Module):
    """Bidirectional wrapper: concat [forward ; backward] per position."""

    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        fwd = TorchLSTM(self.hidden, dtype=self.dtype, name="fwd")(x)
        bwd = TorchLSTM(self.hidden, dtype=self.dtype, name="bwd")(
            jnp.flip(x, axis=1))
        return jnp.concatenate([fwd, jnp.flip(bwd, axis=1)], axis=-1)


class PCTDM(nn.Module):
    """x: [B, T, N, NFB] -> [B*T, 2*hidden] team descriptors."""

    num_players: int
    input_size: int = 1024
    hidden: int = 1000
    num_groups: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        B, T, N, NFB = x.shape
        assert N == self.num_players
        H = self.hidden
        x = x.reshape(B * T, N, NFB)

        # players-as-sequence BiLSTM (pctdm_infer_module.py:22-24,83-84)
        lstm_out = BiTorchLSTM(H, dtype=self.dtype, name="Bi_Lstm")(x)
        # early pooling: elementwise max of fwd/bwd states
        # (pctdm_infer_module.py:92-96)
        pooled = jnp.maximum(lstm_out[..., :H], lstm_out[..., H:])

        dense = lambda feats, name: nn.Dense(
            feats, use_bias=True, kernel_init=kaiming_normal_init,
            precision="highest", dtype=self.dtype, name=name)
        # attention weights and intra-group LSTM are shared by both teams
        # (pctdm_infer_module.py:36-47 single modules)
        att_source = dense(H, "att_source_weights")
        att_context = dense(H, "att_context_weights")
        att_extra = dense(1, "att_extra_weights")
        intra_lstm = TorchLSTM(H, dtype=self.dtype, name="Intra_Group_LSTM")

        # context-conditioned attention per group
        # (pctdm_infer_module.py:52-67,100-116)
        context = jnp.mean(pooled, axis=1)                     # [BT, H]
        per_group = N // self.num_groups
        group_feats = []
        for g in range(self.num_groups):
            xg = pooled[:, g * per_group:(g + 1) * per_group]  # [BT, n, H]
            ctx = jnp.broadcast_to(context[:, None], xg.shape)
            e = att_extra(jnp.tanh(att_source(xg) + att_context(ctx)))
            gamma = jax.nn.softmax(e[..., 0].astype(jnp.float32), axis=-1)
            gamma = gamma[..., None].astype(xg.dtype)          # [BT, n, 1]
            # one-to-all LSTM; last node summarises the group
            seq = xg + xg * gamma
            out = intra_lstm(seq)
            group_feats.append(out[:, -1])
        return jnp.concatenate(group_feats, axis=-1)           # [BT, 2H]
