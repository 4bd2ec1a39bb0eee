"""Serving path: Predictor loads a stage-2 checkpoint and classifies clips
with a single compiled program (din_tpu/experiments/predict.py; the
reference has no inference entry point — exceed-parity)."""

import numpy as np

from __graft_entry__ import _flagship_cfg, _make_batch
from din_tpu.experiments.predict import Predictor
from din_tpu.train import checkpoint as ckpt_lib


def test_predictor_roundtrip(tmp_path):
    cfg = _flagship_cfg(tiny=True).replace(batch_size=2)
    pred = Predictor.from_checkpoint(cfg, None)
    batch = _make_batch(cfg, batch_size=2)
    out = pred(batch["images"], batch["boxes"])
    assert out["activities"].shape == (2, cfg.num_activities)
    np.testing.assert_allclose(out["activities"].sum(-1), 1.0, rtol=1e-4)

    # save a checkpoint, reload through the serving path, same outputs
    path = str(tmp_path / "stage2_epoch1_0.00%.ckpt")
    ckpt_lib.save_checkpoint(path, {
        "epoch": 1,
        "params": pred._variables["params"],
        "batch_stats": pred._variables.get("batch_stats", {}),
    })
    pred2 = Predictor.from_checkpoint(cfg, path)
    out2 = pred2(batch["images"], batch["boxes"])
    np.testing.assert_allclose(out2["activities"], out["activities"],
                               rtol=1e-5, atol=1e-6)


def test_predictor_pad_to_single_program():
    """pad_to=k serves ragged request sizes (1..2k+1) from ONE compiled
    program, bit-equal to the per-size unpadded answers — clips are
    independent in eval mode so padding rows cannot leak (predict.py)."""
    cfg = _flagship_cfg(tiny=True).replace(batch_size=2)
    pred = Predictor.from_checkpoint(cfg, None)
    padded = Predictor(cfg, pred._variables, pad_to=2)
    big = _make_batch(cfg, batch_size=5)
    for b in (1, 2, 3, 5):
        imgs, bxs = big["images"][:b], big["boxes"][:b]
        ref = pred(imgs, bxs)
        got = padded(imgs, bxs)
        for k in ref:
            assert got[k].shape == ref[k].shape
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-6)
    # the padded predictor compiled exactly one program (batch shape k).
    # _cache_size is a private JAX API — skip the count (not the test) if a
    # JAX upgrade removes it (ADVICE r3).
    if hasattr(padded._fwd, "_cache_size"):
        assert padded._fwd._cache_size() == 1


def test_predictor_rejects_bad_pad_and_empty():
    """pad_to < 1 and empty requests fail loudly (ADVICE r3)."""
    import pytest

    cfg = _flagship_cfg(tiny=True).replace(batch_size=2)
    pred = Predictor.from_checkpoint(cfg, None)
    with pytest.raises(ValueError, match="pad_to"):
        Predictor(cfg, pred._variables, pad_to=0)
    padded = Predictor(cfg, pred._variables, pad_to=2)
    batch = _make_batch(cfg, batch_size=1)
    with pytest.raises(ValueError, match="empty request"):
        padded(batch["images"][:0], batch["boxes"][:0])


def test_predictor_mesh_data_parallel_serving():
    """Data-parallel serving (Predictor(mesh=...)): the padded batch shards
    over 'data', params replicate, outputs match the single-chip answers,
    and the per-device program carries a fraction of the single-chip
    flops (genuinely SPMD, not replicated)."""
    import jax
    import pytest

    from din_tpu.parallel.mesh import batch_sharding, make_mesh, \
        replicated_sharding

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = _flagship_cfg(tiny=True).replace(batch_size=2)
    single = Predictor.from_checkpoint(cfg, None)
    mesh = make_mesh(cfg.replace(mesh_shape={"data": 8, "model": 1}))
    served = Predictor(cfg, single._variables, pad_to=3, mesh=mesh)
    assert served.pad_to == 8                    # rounded up to the axis

    big = _make_batch(cfg, batch_size=5)
    ref = single(big["images"], big["boxes"])
    got = served(big["images"], big["boxes"])
    for k in ref:
        assert got[k].shape == ref[k].shape
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-5)

    # per-device flops of the sharded program << single-chip program at the
    # same batch shape (8): SPMD partitioning, not replication
    def flops(pred, k):
        imgs = np.repeat(big["images"][:1], k, axis=0)
        bxs = np.repeat(big["boxes"][:1], k, axis=0)
        if pred.mesh is None:
            args = (pred._variables, imgs, bxs, None)
            lowered = pred._fwd.lower(*args)
        else:
            s = batch_sharding(pred.mesh)
            args = (jax.device_put(pred._variables,
                                   replicated_sharding(pred.mesh)),
                    jax.device_put(imgs, s), jax.device_put(bxs, s), None)
            with jax.set_mesh(pred.mesh):
                lowered = pred._fwd.lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(dict(analysis)["flops"])

    assert flops(served, 8) < flops(single, 8) / 3
