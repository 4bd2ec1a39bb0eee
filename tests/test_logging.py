"""Direct unit tests for the logging/observability surface.

Pins the reference's log formats (utils.py:101-158) plus the
metrics.jsonl stream (beyond-parity addition) — previously these were
only exercised indirectly through the engine e2e tests.
"""

import json
import os

import numpy as np

from din_tpu.config import Config
from din_tpu.utils.logging import (append_metrics_jsonl, log_final_exp_result,
                                   print_log, show_config, show_epoch_info)


def test_print_log_appends_and_prints(tmp_path, capsys):
    log = str(tmp_path / "log.txt")
    print_log(log, "hello", 1)
    print_log(log, "world")
    assert capsys.readouterr().out == "hello 1\nworld\n"
    with open(log) as f:
        assert f.read() == "hello 1\nworld\n"
    # None path: stdout only, no file
    print_log(None, "nofile")
    assert capsys.readouterr().out == "nofile\n"


def test_show_config_dumps_every_field(tmp_path, capsys):
    cfg = Config("volleyball")
    cfg = cfg.replace(log_path=str(tmp_path / "log.txt"))
    show_config(cfg)
    out = capsys.readouterr().out
    # every dataclass field appears by name (reference utils.py:107-111)
    import dataclasses
    for field in dataclasses.fields(cfg):
        assert field.name in out, field.name
    assert "=====================Config=====================" in out


def test_show_epoch_info_formats_and_streams_jsonl(tmp_path, capsys):
    log = str(tmp_path / "log.txt")
    info = {"epoch": 3, "activities_acc": 91.25, "loss": 0.4321,
            "time": 12.5, "clips_per_sec": 6.07, "actions_acc": 80.5,
            "activities_conf": np.eye(2, dtype=np.int64),
            "activities_MPCA": 90.0, "MAD": 0.1234}
    show_epoch_info("Test", log, info)
    out = capsys.readouterr().out
    assert "====> Test at epoch #3" in out
    assert "Group Activity Accuracy: 91.25%, Loss: 0.43210" in out
    assert "Throughput: 6.07 clips/sec" in out
    assert "Actions Accuracy: 80.50%" in out
    assert "Activities MPCA:90.00%" in out
    assert "MAD:0.1234" in out
    # Train phase drops the '====>' marker (reference utils.py:117-121)
    show_epoch_info("Train", log, dict(info, epoch=4))
    assert "====> Train" not in capsys.readouterr().out

    # metrics.jsonl: one machine-readable record per call, same dir as log
    mpath = os.path.join(str(tmp_path), "metrics.jsonl")
    with open(mpath) as f:
        recs = [json.loads(line) for line in f]
    assert [r["phase"] for r in recs] == ["Test", "Train"]
    assert recs[0]["epoch"] == 3 and recs[1]["epoch"] == 4
    assert recs[0]["activities_conf"] == [[1, 0], [0, 1]]  # np -> list
    assert isinstance(recs[0]["activities_acc"], float)


def test_append_metrics_jsonl_none_path_is_noop(tmp_path):
    append_metrics_jsonl(None, "Test", {"epoch": 1})  # must not raise


def test_log_final_exp_result_merges_db(tmp_path):
    log = str(tmp_path / "log.txt")
    db = str(tmp_path / "db.json")
    cfg = Config("volleyball").replace(exp_name="run_a")
    res = {"cfg": cfg, "total_time": 1.5,
           "best_result": {"epoch": 7, "activities_acc": 92.0,
                           "activities_conf": np.eye(2)}}
    log_final_exp_result(log, db, res)
    # second experiment merges, doesn't clobber (reference pickle-db
    # semantics, utils.py:131-158)
    res2 = {"cfg": cfg.replace(exp_name="run_b"), "total_time": 2.0,
            "best_result": {"epoch": 3, "activities_acc": 88.0}}
    log_final_exp_result(log, db, res2)
    with open(db) as f:
        data = json.load(f)
    assert set(data) == {"run_a", "run_b"}
    # array-valued entries (confusion) are dropped from the JSON db
    assert "activities_conf" not in data["run_a"]["best_result"]
    assert data["run_a"]["best_result"]["activities_acc"] == 92.0
    with open(log) as f:
        text = f.read()
    assert "=====================Result======================" in text
    assert "Cost total 1.5000 hours." in text
    # hidden fields stay hidden (reference no_display_cfg)
    assert "result_path :" not in text
