"""DIN head vs an independent torch/numpy oracle.

The oracle re-derives the reference's dynamic-walk math (offset conv ->
fractional positions -> 4-corner clamped bilinear blend over the zero-padded
T x N grid -> affinity-softmax weighting -> ratio mixing -> linear) from the
algorithm description, using torch convs for the offset/affinity predictors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from din_tpu.heads.din import (DynamicPersonInference,
                               HierarchicalDynamicInference,
                               MultiDynamicInference)

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


def oracle_din(x, params, kernel, ratios, scale_factor=True, beta=None,
               dynamic=True):
    """x: [B,T,N,C] numpy. params: dict with per-ratio conv weights (torch
    layout [O,I,kh,kw]) and 'hidden' [C,C] (flax layout in->out)."""
    B, T, N, C = x.shape
    kh, kw = kernel
    k2 = kh * kw
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))  # [B,C,T,N]

    ratio_fts = []
    for r in ratios:
        pad_tb, pad_lr = (kh - 1) // 2 * r, (kw - 1) // 2 * r
        Hp, Wp = T + 2 * pad_tb, N + 2 * pad_lr

        # base positions + kernel offsets (y block then x block)
        dy = np.arange(-((kh - 1) * r) // 2, ((kh - 1) * r) // 2 + 1, r)
        dx = np.arange(-((kw - 1) * r) // 2, ((kw - 1) * r) // 2 + 1, r)
        gy, gx = np.meshgrid(dy, dx, indexing="ij")
        posk = np.concatenate([gy.ravel(), gx.ravel()]).astype(np.float64)
        y0 = pad_tb + np.arange(T)
        x0 = pad_lr + np.arange(N)
        pos0 = np.concatenate([
            np.broadcast_to(y0[:, None, None], (T, N, k2)),
            np.broadcast_to(x0[None, :, None], (T, N, k2))], -1).astype(np.float64)

        if dynamic:
            off = TF.conv2d(xt, torch.from_numpy(params[f"p_{r}"]).double(),
                            torch.from_numpy(params[f"pb_{r}"]).double(),
                            padding=(pad_tb, pad_lr), dilation=r)
            off = off.permute(0, 2, 3, 1).numpy().astype(np.float64)
            pos = pos0[None] + posk[None, None, None] + off
        else:
            pos = np.broadcast_to(pos0[None] + posk[None, None, None],
                                  (B, T, N, 2 * k2)).astype(np.float64)

        if scale_factor:
            sc = TF.conv2d(xt, torch.from_numpy(params[f"s_{r}"]).double(),
                           torch.from_numpy(params[f"sb_{r}"]).double(),
                           padding=(pad_tb, pad_lr), dilation=r)
            sc = sc.permute(0, 2, 3, 1).numpy().astype(np.float64)
            sc = np.exp(sc - sc.max(-1, keepdims=True))
            sc = sc / sc.sum(-1, keepdims=True)

        xpad = np.zeros((B, Hp, Wp, C))
        xpad[:, pad_tb:pad_tb + T, pad_lr:pad_lr + N] = x

        py, px = pos[..., :k2], pos[..., k2:]
        if dynamic:
            lty = np.clip(np.floor(py), 0, Hp - 1)
            ltx = np.clip(np.floor(px), 0, Wp - 1)
            rby = np.clip(np.floor(py) + 1, 0, Hp - 1)
            rbx = np.clip(np.floor(px) + 1, 0, Wp - 1)
            cy = np.clip(py, 0, Hp - 1)
            cx = np.clip(px, 0, Wp - 1)

            def g(yy, xx):
                out = np.zeros((B, T, N, k2, C))
                for b in range(B):
                    out[b] = xpad[b, yy[b].astype(int), xx[b].astype(int)]
                return out

            ft = (g(lty, ltx) * ((1 - np.abs(cy - lty)) * (1 - np.abs(cx - ltx)))[..., None]
                  + g(rby, rbx) * ((1 - np.abs(cy - rby)) * (1 - np.abs(cx - rbx)))[..., None]
                  + g(rby, ltx) * ((1 - np.abs(cy - rby)) * (1 - np.abs(cx - ltx)))[..., None]
                  + g(lty, rbx) * ((1 - np.abs(cy - lty)) * (1 - np.abs(cx - rbx)))[..., None])
        else:
            ft = np.zeros((B, T, N, k2, C))
            for b in range(B):
                ft[b] = xpad[b, py[b].astype(int), px[b].astype(int)]

        if scale_factor:
            ft = (ft * sc[..., None]).sum(3)
        else:
            ft = ft.mean(3)
        ratio_fts.append(ft)

    stacked = np.stack(ratio_fts, -1)
    mixed = (stacked * np.asarray(beta)).sum(-1) if beta is not None \
        else stacked.mean(-1)
    return mixed @ params["hidden"]


def _setup_din(rng, B=2, T=4, N=5, C=8, kernel=(3, 3), ratios=(1, 2),
               scale_factor=True, beta_factor=True, dynamic=True):
    x = rng.randn(B, T, N, C).astype(np.float32) * 0.5
    module = DynamicPersonInference(
        in_dim=C, kernel_size=kernel, sampling_ratio=ratios,
        dynamic_sampling=dynamic, scale_factor=scale_factor,
        beta_factor=beta_factor)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    oracle_params = {}
    kh, kw = kernel
    k2 = kh * kw
    for r in ratios:
        if dynamic:
            w = rng.randn(2 * k2, C, kh, kw).astype(np.float32) * 0.05
            b = rng.randn(2 * k2).astype(np.float32) * 0.1
            params[f"p_conv_{r}"]["kernel"] = w.transpose(2, 3, 1, 0)
            params[f"p_conv_{r}"]["bias"] = b
            oracle_params[f"p_{r}"], oracle_params[f"pb_{r}"] = w, b
        if scale_factor:
            w = rng.randn(k2, C, kh, kw).astype(np.float32) * 0.05
            b = rng.randn(k2).astype(np.float32) * 0.1
            params[f"scale_conv_{r}"]["kernel"] = w.transpose(2, 3, 1, 0)
            params[f"scale_conv_{r}"]["bias"] = b
            oracle_params[f"s_{r}"], oracle_params[f"sb_{r}"] = w, b
    oracle_params["hidden"] = params["hidden_weight"]["kernel"]
    beta = None
    if beta_factor:
        beta = rng.randn(len(ratios)).astype(np.float32)
        params["beta"] = beta
    return x, module, {"params": params}, oracle_params, beta


def test_dynamic_scale_beta(rng):
    x, mod, variables, op, beta = _setup_din(rng)
    out, _ = mod.apply(variables, jnp.asarray(x))
    ref = oracle_din(x.astype(np.float64), op, (3, 3), (1, 2), True, beta)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_dynamic_no_scale_mean(rng):
    x, mod, variables, op, _ = _setup_din(
        rng, scale_factor=False, beta_factor=False, ratios=(1,))
    out, _ = mod.apply(variables, jnp.asarray(x))
    ref = oracle_din(x.astype(np.float64), op, (3, 3), (1,), False, None)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_plain_inference(rng):
    x, mod, variables, op, _ = _setup_din(
        rng, dynamic=False, beta_factor=False, ratios=(1,))
    out, _ = mod.apply(variables, jnp.asarray(x))
    ref = oracle_din(x.astype(np.float64), op, (3, 3), (1,), True, None,
                     dynamic=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_factorized_kernels(rng):
    """ST-factorised (1,3)/(3,1) kernels (README's DIN variants)."""
    for kernel in [(1, 3), (3, 1)]:
        x, mod, variables, op, beta = _setup_din(
            rng, kernel=kernel, ratios=(1,))
        out, _ = mod.apply(variables, jnp.asarray(x))
        ref = oracle_din(x.astype(np.float64), op, kernel, (1,), True, beta)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_zero_init_offsets_reduce_to_plain(rng):
    """With freshly-initialised (zero) convs the dynamic walk equals plain
    grid sampling with uniform affinity — the reference's intended start."""
    x = rng.randn(1, 4, 5, 8).astype(np.float32)
    dyn = DynamicPersonInference(in_dim=8, sampling_ratio=(1,),
                                 dynamic_sampling=True, scale_factor=True)
    plain = DynamicPersonInference(in_dim=8, sampling_ratio=(1,),
                                   dynamic_sampling=False, scale_factor=False)
    vd = dyn.init(jax.random.PRNGKey(1), jnp.asarray(x))
    vp = plain.init(jax.random.PRNGKey(1), jnp.asarray(x))
    # share the hidden weight
    vp["params"]["hidden_weight"] = vd["params"]["hidden_weight"]
    a, _ = dyn.apply(vd, jnp.asarray(x))
    b, _ = plain.apply(vp, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)


def test_multi_din_sums(rng):
    x = rng.randn(1, 4, 5, 8).astype(np.float32)
    multi = MultiDynamicInference(in_dim=8, kernel_sizes=((1, 3), (3, 1)),
                                  sampling_ratio=(1,))
    v = multi.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out, _ = multi.apply(v, jnp.asarray(x))
    assert out.shape == x.shape

    singles = []
    for i, ks in enumerate([(1, 3), (3, 1)]):
        mod = DynamicPersonInference(in_dim=8, kernel_size=ks,
                                     sampling_ratio=(1,))
        sv = {"params": v["params"][f"DIM_{i}"]}
        o, _ = mod.apply(sv, jnp.asarray(x))
        singles.append(np.asarray(o))
    np.testing.assert_allclose(np.asarray(out), singles[0] + singles[1],
                               rtol=1e-4, atol=1e-5)


def test_hierarchical_shapes_and_grad(rng):
    x = rng.randn(2, 4, 5, 8).astype(np.float32)
    mod = HierarchicalDynamicInference(in_dim=8,
                                       kernel_sizes=((1, 3), (3, 1)),
                                       sampling_ratio=(1,))
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out, _ = mod.apply(v, jnp.asarray(x))
    assert out.shape == x.shape

    def loss(params):
        o, _ = mod.apply({"params": params}, jnp.asarray(x))
        return jnp.sum(o ** 2)

    g = jax.grad(loss)(v["params"])
    # offset conv grads must flow (through bilinear coefficients)
    gp = g["DPI_1"]["p_conv_1"]["kernel"]
    assert float(jnp.abs(gp).max()) > 0.0


def test_masked_equals_sliced(rng):
    """MAX_N masked batching == per-sample exact-N slicing when padded
    actor features are zero (Dynamic_collective parity,
    infer_model.py:1286-1314)."""
    C, T, MAXN, n_real = 8, 4, 7, 5
    x_real = rng.randn(1, T, n_real, C).astype(np.float32)
    x_pad = np.zeros((1, T, MAXN, C), np.float32)
    x_pad[:, :, :n_real] = x_real
    mod_r = DynamicPersonInference(in_dim=C, sampling_ratio=(1,))
    mod_p = DynamicPersonInference(in_dim=C, sampling_ratio=(1,))
    v = mod_r.init(jax.random.PRNGKey(0), jnp.asarray(x_real))
    out_r, _ = mod_r.apply(v, jnp.asarray(x_real))
    out_p, _ = mod_p.apply(v, jnp.asarray(x_pad))
    np.testing.assert_allclose(np.asarray(out_p)[:, :, :n_real],
                               np.asarray(out_r), rtol=1e-4, atol=1e-5)
