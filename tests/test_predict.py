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
