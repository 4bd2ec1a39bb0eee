"""StableHLO serving artifact: export bakes weights into one fixed-shape
program; the reloaded artifact must answer ragged request sizes identically
to the live Predictor, with no model code or checkpoint in the loop
(din_tpu/experiments/export_serving.py; the reference has no deployment
path at all — exceed-parity)."""

import numpy as np

from __graft_entry__ import _flagship_cfg, _make_batch
from din_tpu.experiments.export_serving import (ExportedPredictor,
                                                export_predictor)
from din_tpu.experiments.predict import Predictor


def test_exported_artifact_matches_predictor(tmp_path):
    cfg = _flagship_cfg(tiny=True).replace(batch_size=2)
    pred = Predictor.from_checkpoint(cfg, None)
    data = export_predictor(pred, batch=2)

    path = tmp_path / "model.dinx"
    path.write_bytes(data)
    served = ExportedPredictor.load(str(path))
    assert served.pad_to == 2
    assert "activities" in served.header["outputs"]

    big = _make_batch(cfg, batch_size=5)
    for b in (1, 2, 3, 5):              # under / exact / ragged / multi-chunk
        imgs, bxs = big["images"][:b], big["boxes"][:b]
        ref = pred(imgs, bxs)
        got = served(imgs, bxs)
        for k in ref:
            assert got[k].shape == ref[k].shape
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-6)


def test_exported_artifact_collective_requires_bboxes_num(tmp_path):
    """Collective artifacts carry the bboxes_num arg; requests without it
    must fail loudly, and with it must match the live Predictor."""
    import pytest

    from din_tpu.experiments.presets import PRESETS

    cfg = PRESETS["collective_stage2_dynamic"]().replace(
        image_size=(64, 96), out_size=(2, 3), num_frames=2, batch_size=2,
        num_features_boxes=64, num_features_gcn=64, lite_dim=32,
        compute_dtype="float32", backbone="res18")
    pred = Predictor.from_checkpoint(cfg, None)
    served = ExportedPredictor.from_bytes(export_predictor(pred, batch=2))
    assert served._has_bn

    batch = _make_batch(cfg, batch_size=3)
    with pytest.raises(ValueError, match="bboxes_num"):
        served(batch["images"], batch["boxes"])
    ref = pred(batch["images"], batch["boxes"], batch["bboxes_num"])
    got = served(batch["images"], batch["boxes"], batch["bboxes_num"])
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-6)


def test_artifact_rejects_bad_magic():
    import pytest

    with pytest.raises(ValueError, match="magic"):
        ExportedPredictor.from_bytes(b"NOTDINX1" + b"\x00" * 16)
