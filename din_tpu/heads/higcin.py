"""HiGCIN — Cross Inference Block (Yan et al.).

Re-implements the reference's ``CrossInferBlock``
(infer_module/higcin_infer_module.py:9-66).  The reference loops
``for i in range(T): for j in range(N)`` computing, for each cell, dot-product
attention of its embedding against its row (temporal) and column (spatial),
averaged and residual-added, followed by BatchNorm2d.  The loop reads only
from the original ``x`` (it writes a clone), so the whole block vectorises
into four einsums — same math, O(T*N) fewer kernel launches and fully
MXU-shaped.  No softmax is used, matching the paper (higcin_infer_module.py:44).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from din_tpu.nn.layers import kaiming_normal_init


class CrossInferBlock(nn.Module):
    """x: [B, T, S, C] -> same.  S is K*K body positions (BIM) or N actors
    (PIM) (infer_model.py:646-647)."""

    in_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        B, T, S, C = x.shape
        latent = self.in_dim // 2
        dense = lambda name: nn.Dense(
            latent, use_bias=False, kernel_init=kaiming_normal_init,
            precision="highest", dtype=self.dtype, name=name)

        theta_x = dense("theta")(x)        # [B,T,S,L]
        phi_x = dense("phi")(x)            # [B,T,S,L]
        g_x = dense("fun_g")(x)            # [B,T,S,L]

        # spatial: cell (t, j) attends over its frame's S positions
        sweight = jnp.einsum("btnl,btjl->btjn", phi_x, theta_x,
                             precision="highest")
        spatio = jnp.einsum("btjn,btnl->btjl", sweight / S, g_x,
                            precision="highest")

        # temporal: cell (t, j) attends over its own track's T frames
        tweight = jnp.einsum("bsjl,btjl->btjs", phi_x, theta_x,
                             precision="highest")
        temporal = jnp.einsum("btjs,bsjl->btjl", tweight / T, g_x,
                              precision="highest")

        st = (spatio + temporal) / (T + S)
        w_out = nn.Dense(self.in_dim, use_bias=False,
                         kernel_init=kaiming_normal_init,
                         precision="highest", dtype=self.dtype, name="W")(st)
        out = w_out + x

        # torch BatchNorm2d over channels, stats across (B, T, S)
        from din_tpu.nn.layers import TorchBatchNorm
        out = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(out)
        return out
