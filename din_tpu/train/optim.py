"""Optimizer: torch-Adam semantics + manual lr plan + trainable masks.

reference: ``optim.Adam(filter(requires_grad), lr, weight_decay)``
(train_net.py:86) with the epoch-keyed lr plan applied by ``adjust_lr``
(train_net.py:23-26,102-103).  torch Adam's weight_decay adds wd*w to the
*gradient* (not AdamW), reproduced by add_decayed_weights before the Adam
transform.  ``requires_grad=False`` for a frozen backbone
(infer_model.py:44-46) becomes an optax mask that zeroes those updates (the
trunk also stop-gradients them, so no backbone backward is even computed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def trainable_mask(params, train_backbone: bool):
    """True where the parameter is trainable.  The backbone lives under
    .../trunk/* in every model."""

    def mask_fn(path, leaf):
        if train_backbone:
            return True
        return not any(getattr(k, "key", None) == "trunk" for k in path)

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(cfg, params):
    """optax chain with an injected learning_rate hyperparameter."""
    mask = trainable_mask(params, cfg.train_backbone)

    @optax.inject_hyperparams
    def make(learning_rate):
        txs = []
        if cfg.weight_decay:
            txs.append(optax.add_decayed_weights(cfg.weight_decay))
        txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        txs.append(optax.scale(-learning_rate))
        return optax.chain(*txs)

    tx = make(learning_rate=cfg.train_learning_rate)
    tx = optax.masked(tx, mask)
    return tx


def lr_for_epoch(cfg, epoch: int) -> float:
    """The reference switches lr at epoch boundaries (train_net.py:102-103):
    the plan value applies from its epoch onward."""
    lr = cfg.train_learning_rate
    for e in sorted(cfg.lr_plan):
        if epoch >= e:
            lr = cfg.lr_plan[e]
    return lr


def adopt_adam_moments(opt_state, mu_src, nu_src, count: int):
    """Return opt_state with Adam first/second moments and step count
    replaced by converted values (nested dicts matching the params tree,
    possibly partial).  Used by the reference-checkpoint migration to
    resume torch-Adam training exactly (nn/ref_import.py): torch
    ``exp_avg``/``exp_avg_sq``/``step`` map 1:1 onto optax scale_by_adam's
    ``mu``/``nu``/``count`` — both apply the same bias correction."""

    def merge(dst, src, path=""):
        if isinstance(dst, dict):
            return {k: merge(v, src[k], f"{path}/{k}") if k in src else v
                    for k, v in dst.items()}
        if not hasattr(dst, "shape"):      # optax.MaskedNode: frozen param
            raise ValueError(f"moment supplied for frozen param at {path}")
        src = jnp.asarray(src, dst.dtype)
        if src.shape != dst.shape:
            raise ValueError(f"moment shape mismatch at {path}: "
                             f"{dst.shape} vs {src.shape}")
        return src

    inject = opt_state.inner_state          # masked -> InjectHyperparamsState
    chain = inject.inner_state
    new_chain, replaced = [], False
    for s in chain:
        if hasattr(s, "mu") and hasattr(s, "nu"):
            s = s._replace(count=jnp.asarray(count, s.count.dtype),
                           mu=merge(s.mu, mu_src), nu=merge(s.nu, nu_src))
            replaced = True
        new_chain.append(s)
    if not replaced:
        raise ValueError("no scale_by_adam state found in opt_state")
    return opt_state._replace(
        inner_state=inject._replace(inner_state=tuple(new_chain)))


def set_learning_rate(opt_state, lr: float):
    """Return a NEW opt_state with the injected learning_rate replaced.

    Functional rebuild (optax states are namedtuples): mutating
    ``hyperparams`` in place happens to work with current optax internals
    but breaks under donation/jit caching assumptions."""
    inner = opt_state.inner_state          # InjectHyperparamsState
    hyperparams = dict(inner.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(
        inner_state=inner._replace(hyperparams=hyperparams))
