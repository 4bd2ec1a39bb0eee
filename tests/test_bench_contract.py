"""bench.py driver contract: the primary stdout line must be strict JSON
(the driver records the last parseable stdout line; BENCH_r02 was lost to
rc=124 — the early-emit + sanitize path is load-bearing), and the clip
fixture must match the training batch spec without the full-image randint
that used to dominate loader measurements (PERF.md input-pipeline
correction)."""

import json
import os
import tempfile

import numpy as np
import pytest


def test_dumps_is_strict_json_with_nan_fields():
    """The early emit happens BEFORE mfu/mfu_useful are filled (NaN
    placeholders) — the line must still parse under strict JSON."""
    from bench import _dumps

    primary = {"metric": "m", "value": 1.25, "mfu": float("nan"),
               "nested": {"x": float("inf")}}
    line = _dumps(primary)
    parsed = json.loads(line, parse_constant=lambda c: pytest.fail(
        f"non-strict JSON constant {c!r} in driver line"))
    assert parsed["value"] == 1.25
    assert parsed["mfu"] is None and parsed["nested"]["x"] is None


def test_budget_gating(monkeypatch):
    import bench

    monkeypatch.setenv("DIN_TPU_BENCH_BUDGET_S", "10000")
    assert bench._time_left(60, "x")
    monkeypatch.setenv("DIN_TPU_BENCH_BUDGET_S", "0")
    assert not bench._time_left(60, "x")


def test_jpeg_clips_fixture_matches_batch_spec():
    """_JpegClips items must stack into exactly the loader's batch spec:
    uint8 [T,H,W,3] frames, f32 feature-coord boxes, i32 labels."""
    from __graft_entry__ import _flagship_cfg
    from bench import _JpegClips
    from din_tpu.data.loader import BatchLoader

    cfg = _flagship_cfg(tiny=True).replace(batch_size=2)
    with tempfile.TemporaryDirectory() as td:
        ds = _JpegClips(td, cfg, n_clips=4, pool=3)
        batch = next(iter(BatchLoader(ds, 2, shuffle=False, num_workers=1)))
        T, N = cfg.num_frames, cfg.num_boxes
        H, W = cfg.image_size
        OH, OW = cfg.out_size
        assert batch["images"].shape == (2, T, H, W, 3)
        assert batch["images"].dtype == np.uint8
        assert batch["boxes"].shape == (2, T, N, 4)
        assert batch["boxes"].dtype == np.float32
        # boxes live in feature-map coordinates (volleyball.py:246-251);
        # same formula as __graft_entry__._make_batch: x1 in [0, OW-2],
        # x2 = x1 + 1.5 (may exceed tiny maps by <=1.5 — RoIAlign clamps)
        assert float(batch["boxes"][..., 0].min()) >= 0
        assert float(batch["boxes"][..., 2].max()) <= OW + 1.5
        assert float(batch["boxes"][..., 3].max()) <= OH + 1.5
        assert batch["actions"].dtype == np.int32
        assert int(batch["actions"].max()) < cfg.num_actions
        assert batch["activities"].shape == (2, T)
        # determinism: same index -> same labels (epoch-stable)
        a0 = ds[0]
        b0 = ds[0]
        np.testing.assert_array_equal(a0["boxes"], b0["boxes"])


def test_supervisor_wedged_child_emits_stale_fallback(monkeypatch, tmp_path,
                                                      capfd):
    """A child that never prints (the wedged-tunnel hang blocks inside C
    code, so only a separate supervising process can act) must yield rc=0
    and the last-good measurement explicitly labeled stale."""
    import sys

    import bench

    monkeypatch.setattr(bench, "_LAST_GOOD_PATH",
                        str(tmp_path / "last_good.json"))
    with open(bench._LAST_GOOD_PATH, "w") as f:
        json.dump({"metric": "m", "value": 5.5,
                   "measured_at_commit": "abc1234"}, f)
    rc = bench._supervise(
        child_cmd=[sys.executable, "-c", "import time; time.sleep(60)"],
        deadline_s=1.5)
    assert rc == 0
    last = capfd.readouterr().out.strip().splitlines()[-1]
    obj = json.loads(last)
    assert obj["value"] == 5.5 and obj["stale"] is True
    assert "stale_reason" in obj and obj["measured_at_commit"] == "abc1234"


def test_supervisor_healthy_child_records_last_good(monkeypatch, tmp_path,
                                                    capfd):
    import sys

    import bench

    monkeypatch.setattr(bench, "_LAST_GOOD_PATH",
                        str(tmp_path / "last_good.json"))
    line = json.dumps({"metric": "m", "value": 7.25, "unit": "u"})
    rc = bench._supervise(
        child_cmd=[sys.executable, "-c", f"print({line!r})"],
        deadline_s=30.0)
    assert rc == 0
    out_last = capfd.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out_last)["value"] == 7.25      # forwarded, not stale
    with open(bench._LAST_GOOD_PATH) as f:
        rec = json.load(f)
    assert rec["value"] == 7.25 and "measured_at" in rec


def test_supervisor_wedged_child_no_last_good_fails(monkeypatch, tmp_path):
    import sys

    import bench

    monkeypatch.setattr(bench, "_LAST_GOOD_PATH",
                        str(tmp_path / "absent.json"))
    rc = bench._supervise(
        child_cmd=[sys.executable, "-c", "import time; time.sleep(60)"],
        deadline_s=1.5)
    assert rc != 0


def test_flops_cache_hit_miss_and_invalidation(monkeypatch, tmp_path):
    """bench_flops_cache.json: a fingerprint-matching entry returns
    instantly (no compute, no budget draw); a config change invalidates;
    an exhausted budget on a miss returns NaN without computing."""
    import bench
    from din_tpu.config import Config

    monkeypatch.setattr(bench, "_FLOPS_CACHE_PATH",
                        str(tmp_path / "cache.json"))
    monkeypatch.setenv("DIN_TPU_BENCH_BUDGET_S", "100000")
    cfg = Config("volleyball").replace(batch_size=4)
    calls = []

    def compute():
        calls.append(1)
        return 123.0

    flops, hit = bench._cached_flops("k", cfg, compute, 60, "p")
    assert (flops, hit, len(calls)) == (123.0, False, 1)
    flops, hit = bench._cached_flops("k", cfg, compute, 60, "p")
    assert (flops, hit, len(calls)) == (123.0, True, 1)     # no recompute
    # different config -> fingerprint miss -> recompute
    flops, hit = bench._cached_flops("k", cfg.replace(batch_size=8),
                                     compute, 60, "p")
    assert (hit, len(calls)) == (False, 2)
    # miss + no budget -> NaN, not computed
    monkeypatch.setenv("DIN_TPU_BENCH_BUDGET_S", "0")
    flops, hit = bench._cached_flops("k2", cfg, compute, 60, "p")
    assert flops != flops and len(calls) == 2
