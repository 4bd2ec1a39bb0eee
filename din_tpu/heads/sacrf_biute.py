"""SACRF + BiUTE (Pramono et al. ECCV'20 baseline head).

Re-implements the reference's mean-field-style refinement with ACT halting
(infer_module/SACRF_BiUTE_infer_module.py:99-414):

  * unary potentials ``Q_u = f_u(PE(x))``;
  * per iteration (<=10): multi-head *spatial* attention over clique
    partitions of the actors with learned clique weights, multi-head
    *temporal* attention per actor, pairwise potentials via compatibility
    transforms, per-actor halting probability accumulation with freeze;
  * halting loss ``R_t + N_t``;
  * BiUTE group descriptor: learned-weighted actor sum concat max-pool
    (the reference computes a bidirectional temporal attention but returns
    the plain descriptor ``n`` — SACRF_BiUTE_infer_module.py:414; kept
    behind ``use_biute_attention`` with the reference default off).

TPU-native control flow: the reference's data-dependent ``while`` loop
(SACRF_BiUTE_infer_module.py:307-329) becomes a fixed-trip-count
``lax.scan`` over 10 iterations with halting masks.  The reference's loop
body recomputes the same attention from loop-invariant inputs each
iteration (features never change inside the loop), so in deterministic mode
the attention is computed once and only the scalar halting recursion is
iterated — bit-identical to the reference, ~10x less compute.  The early
loop exit (all actors halted) only affects ``running_counter``; it is
reproduced exactly by computing the stop iteration ``v_stop`` from the
halting trajectory.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from din_tpu.heads.positional import boxes_position_embedding
from din_tpu.nn.layers import kaiming_normal_init


class SelfAtt(nn.Module):
    """Unnormalised dot-product attention (no softmax —
    SACRF_BiUTE_infer_module.py:122-147)."""

    in_dim: int
    latent_dim: int
    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, kernel_init=kaiming_normal_init,
            precision="highest", dtype=self.dtype, name=name)
        theta = dense(self.latent_dim, "theta")(x)
        phi = dense(self.latent_dim, "phi")(x)
        g = dense(self.out_dim, "fun_g")(x)
        att = jnp.einsum("bnl,bml->bnm", theta, phi, precision="highest")
        att = att / jnp.sqrt(float(self.in_dim)).astype(att.dtype)
        return jnp.einsum("bnm,bmo->bno", att, g, precision="highest")


class SpatialAtt(nn.Module):
    """Multi-head attention over clique partitions with learned clique
    weights (SACRF_BiUTE_infer_module.py:150-206)."""

    in_dim: int
    num_att: int = 8
    dropout: float = 0.1
    cliques: Sequence[int] = (2, 3, 6, 12)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, T, N, C = x.shape
        latent = self.in_dim // self.num_att
        atts = [SelfAtt(self.in_dim, latent, latent, dtype=self.dtype,
                        name=f"att_{i}") for i in range(self.num_att)]
        w_out = nn.Dense(self.in_dim, use_bias=False,
                         kernel_init=kaiming_normal_init, precision="highest",
                         dtype=self.dtype, name="W_out")
        ln1 = nn.LayerNorm(epsilon=1e-5, name="layernorm1")
        ffn1 = nn.Dense(self.in_dim, kernel_init=kaiming_normal_init,
                        precision="highest", dtype=self.dtype,
                        name="FFN_linear1")
        ffn2 = nn.Dense(self.in_dim, kernel_init=kaiming_normal_init,
                        precision="highest", dtype=self.dtype,
                        name="FFN_linear2")
        clique_w = self.param("w", nn.initializers.ones,
                              (len(self.cliques),), jnp.float32)

        multi = []
        for clique in self.cliques:
            xc = x.reshape(B * T * N // clique, clique, C)
            heads = jnp.concatenate([att(xc) for att in atts], axis=-1)
            heads = heads.reshape(B, T, N, C)
            heads = w_out(heads)
            heads = nn.Dropout(self.dropout, deterministic=deterministic,
                               name=f"drop_{clique}")(heads)
            heads = ln1(heads + x)
            y = nn.relu(ffn1(heads))
            y = nn.Dropout(self.dropout, deterministic=deterministic,
                           name=f"ffn_drop_{clique}")(y)
            multi.append(ffn2(y))
        stacked = jnp.stack(multi, axis=-1)
        return jnp.einsum("btncx,x->btnc", stacked,
                          clique_w.astype(stacked.dtype))


class TemporalAtt(nn.Module):
    """Multi-head temporal attention per actor
    (SACRF_BiUTE_infer_module.py:209-258)."""

    in_dim: int
    num_att: int = 8
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, T, N, C = x.shape
        latent = self.in_dim // self.num_att
        xt = jnp.swapaxes(x, 1, 2).reshape(B * N, T, C)
        heads = jnp.concatenate(
            [SelfAtt(self.in_dim, latent, latent, dtype=self.dtype,
                     name=f"att_{i}")(xt) for i in range(self.num_att)],
            axis=-1)
        heads = nn.Dense(self.in_dim, use_bias=False,
                         kernel_init=kaiming_normal_init, precision="highest",
                         dtype=self.dtype, name="W_out")(heads)
        heads = nn.Dropout(self.dropout, deterministic=deterministic,
                           name="dropout1")(heads)
        heads = nn.LayerNorm(epsilon=1e-5, name="layernorm1")(heads + xt)
        y = nn.relu(nn.Dense(self.in_dim, kernel_init=kaiming_normal_init,
                             precision="highest", dtype=self.dtype,
                             name="FFN_linear1")(heads))
        y = nn.Dropout(self.dropout, deterministic=deterministic,
                       name="FFN_dropout")(y)
        y = nn.Dense(self.in_dim, kernel_init=kaiming_normal_init,
                     precision="highest", dtype=self.dtype,
                     name="FFN_linear2")(y)
        return jnp.swapaxes(y.reshape(B, N, T, C), 1, 2)


class SACRF(nn.Module):
    """Returns (Q_hat action posteriors [B,T,N,A], C_v features, halt_loss)
    (SACRF_BiUTE_infer_module.py:261-337)."""

    in_dim: int
    num_actions: int
    image_size: Tuple[int, int]
    out_size: Tuple[int, int]
    num_att: int = 8
    dropout: float = 0.1
    cliques: Sequence[int] = (2, 3, 6, 12)
    max_iters: int = 10
    dtype: Any = None

    @nn.compact
    def __call__(self, features, boxes, deterministic: bool = True):
        B, T, N, C = features.shape
        dense = lambda feats, bias, name: nn.Dense(
            feats, use_bias=bias, kernel_init=kaiming_normal_init,
            precision="highest", dtype=self.dtype, name=name)

        features = boxes_position_embedding(features, boxes, self.image_size,
                                            self.out_size)
        q_u = dense(self.num_actions, True, "f_u")(features)

        spatial_att = SpatialAtt(self.in_dim, self.num_att, self.dropout,
                                 self.cliques, dtype=self.dtype,
                                 name="spatial_att")
        temporal_att = TemporalAtt(self.in_dim, self.num_att, self.dropout,
                                   dtype=self.dtype, name="temporal_att")
        f_s = dense(self.num_actions, False, "f_spatil_att")
        f_t = dense(self.num_actions, False, "f_temporal_att")
        comp_s = dense(self.num_actions, False, "compatible_trans_s")
        comp_t = dense(self.num_actions, False, "compatible_trans_t")
        halt_fc = dense(1, True, "halt_fc")

        # The loop body's attention depends only on loop-invariant
        # ``features``; with dropout active each iteration resamples noise,
        # otherwise one evaluation suffices (see module docstring).
        stochastic = (not deterministic) and self.dropout > 0.0
        if stochastic:
            # each call resamples dropout noise (flax folds a fresh rng per
            # Dropout invocation), matching the reference's per-iteration
            # recompute under training
            s_stack = jnp.stack([spatial_att(features, deterministic=False)
                                 for _ in range(self.max_iters)])
            t_stack = jnp.stack([temporal_att(features, deterministic=False)
                                 for _ in range(self.max_iters)])
        else:
            s = spatial_att(features, deterministic=True)
            t = temporal_att(features, deterministic=True)
            s_stack = jnp.broadcast_to(s[None], (self.max_iters,) + s.shape)
            t_stack = jnp.broadcast_to(t[None], (self.max_iters,) + t.shape)

        # halting recursion (SACRF_BiUTE_infer_module.py:302-335)
        halt_prob = jnp.zeros((B, T, N), jnp.float32)
        halt_mask = jnp.zeros((B, T, N), bool)
        c_v = features
        halt_iter = jnp.full((B, T, N), self.max_iters + 1, jnp.int32)
        q_hat = jax.nn.softmax(q_u.astype(jnp.float32), axis=-1)
        q_hat_last = q_hat

        carry = (halt_prob, halt_mask, c_v, halt_iter, q_hat_last)
        outs = []
        for v in range(self.max_iters):
            halt_prob, halt_mask, c_v, halt_iter, q_hat_last = carry
            s_ft, t_ft = s_stack[v], t_stack[v]
            q_p = comp_s(f_s(s_ft)) + comp_t(f_t(t_ft))
            q_hat_v = jax.nn.softmax((q_u + q_p).astype(jnp.float32), axis=-1)
            c_temp = s_ft + t_ft
            c_v = jnp.where(halt_mask[..., None], c_v, c_temp)
            h = jax.nn.sigmoid(halt_fc(c_v)[..., 0].astype(jnp.float32))
            halt_prob_new = halt_prob + h
            newly = (halt_prob_new >= 1.0) & (~halt_mask)
            halt_iter = jnp.where(newly, v + 1, halt_iter)
            halt_mask_new = halt_mask | newly
            halt_prob = jnp.where(halt_mask_new, halt_prob, halt_prob_new)
            # the reference freezes halt_prob at the *pre-crossing* value
            # for cells that just crossed (halt_prob_new[halt_mask] =
            # halt_prob[halt_mask] uses the OLD prob for newly-halted too)
            carry = (halt_prob, halt_mask_new, c_v, halt_iter, q_hat_v)
            outs.append((q_hat_v, c_v))

        halt_prob, halt_mask, c_v_final, halt_iter, _ = carry

        # the reference exits the loop once every cell has halted; the
        # returned Q_hat / C_v are those of the stop iteration v_stop
        all_halted = jnp.all(halt_mask.reshape(B, -1), axis=-1)
        v_stop = jnp.where(
            all_halted,
            jnp.max(jnp.minimum(halt_iter, self.max_iters).reshape(B, -1),
                    axis=-1),
            self.max_iters)                                     # [B]
        q_stack = jnp.stack([o[0] for o in outs])               # [V,B,T,N,A]
        c_stack = jnp.stack([o[1] for o in outs])
        sel = (v_stop - 1).astype(jnp.int32)
        q_hat = jnp.take_along_axis(
            q_stack, sel[None, :, None, None, None], axis=0)[0]
        c_v = jnp.take_along_axis(
            c_stack, sel[None, :, None, None, None], axis=0)[0]

        # R(t) + N(t) (SACRF_BiUTE_infer_module.py:331-335): the counter
        # counts iterations spent halted up to v_stop (inclusive)
        counter = jnp.where(
            halt_mask,
            jnp.maximum(v_stop[:, None, None] - halt_iter + 1, 0), 0)
        r_t = jnp.sum(1.0 - halt_prob)
        n_t = self.max_iters - counter + 1
        n_t = jnp.where(n_t == self.max_iters + 1, self.max_iters, n_t)
        halt_loss = r_t + jnp.sum(n_t.astype(jnp.float32))
        return q_hat, c_v, halt_loss


class BiUTE(nn.Module):
    """Group descriptor per frame: learned-weighted actor sum concat
    max-pool over actors -> [B, T, 2*C]
    (SACRF_BiUTE_infer_module.py:340-414)."""

    in_dim: int
    num_boxes: int
    use_biute_attention: bool = False   # reference returns plain n (line 414)
    dtype: Any = None

    @nn.compact
    def __call__(self, features):
        B, T, N, C = features.shape
        q = nn.Dense(self.num_boxes, use_bias=False,
                     kernel_init=kaiming_normal_init, precision="highest",
                     dtype=self.dtype, name="q")(features)   # [B,T,N,N]
        g_weight = jnp.sum(jnp.swapaxes(q, 2, 3), axis=2)    # [B,T,N]
        g = jnp.einsum("btn,btnc->btc", g_weight, features,
                       precision="highest")
        f = jnp.max(features, axis=2)
        n = jnp.concatenate([g, f], axis=-1)                 # [B,T,2C]
        if not self.use_biute_attention:
            return n

        # optional bidirectional temporal attention (the reference computes
        # this but discards it; vectorised with before/after masks)
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, kernel_init=kaiming_normal_init,
            precision="highest", dtype=self.dtype, name=name)
        tidx = jnp.arange(T)
        before = tidx[:, None] > tidx[None, :]     # j < i
        after = tidx[:, None] < tidx[None, :]
        out = n
        for name, mask in (("before", before), ("after", after)):
            theta = dense(self.in_dim, f"theta_{name}")(n)
            phi = dense(self.in_dim, f"phi_{name}")(n)
            fg = dense(2 * self.in_dim, f"fun_g_{name}")(n)
            w = jnp.einsum("btc,bsc->bts", theta, phi, precision="highest")
            w = w / jnp.sqrt(2.0 * self.in_dim)
            w = jnp.where(mask[None], w, 0.0)
            out = out + jnp.einsum("bts,bsc->btc", w, fg, precision="highest")
        return out
