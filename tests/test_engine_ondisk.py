"""End-to-end engine drive from ON-DISK reference-layout datasets.

Every other engine test feeds the synthetic fixture; this one exercises
the exact path the real accuracy-parity runs take (ROADMAP runbook):
reference directory layouts on disk -> annotation parsers -> native JPEG
decode -> BatchLoader -> train_net, for both dataset families.
Volleyball layout: <root>/<sid>/annotations.txt +
<sid>/<src_fid>/<fid>.jpg + tracks_normalized.pkl (volleyball.py:30-65);
Collective layout: <root>/seq%02d/annotations.txt + frame%04d.jpg
(collective.py:37-81).
"""

import os
import pickle

import numpy as np

from din_tpu.config import Config
from din_tpu.train.engine import train_net


def _write_volleyball_seq(root, sid, activities=("r_set", "l-spike")):
    """One video dir in the reference layout; returns its track entries."""
    from PIL import Image

    vdir = os.path.join(root, str(sid))
    os.makedirs(vdir, exist_ok=True)
    lines, tracks = [], {}
    for k, fid in enumerate((10, 20)):
        people = ["%d %d %d %d %s" % (10 + i, 8 + i, 5, 8, "digging")
                  for i in range(3)]
        lines.append("%d.jpg %s " % (fid, activities[k % len(activities)])
                     + " ".join(people))
        ftracks = {}
        d = os.path.join(vdir, str(fid))
        os.makedirs(d, exist_ok=True)
        for f in range(fid - 4, fid + 5):
            img = np.full((24, 32, 3), (sid * 31 + f * 7) % 255, np.uint8)
            Image.fromarray(img).save(os.path.join(d, f"{f}.jpg"))
            ftracks[f] = np.tile(np.array([[0.1, 0.2, 0.5, 0.4]]), (3, 1))
        tracks[(sid, fid)] = ftracks
    with open(os.path.join(vdir, "annotations.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return tracks


def test_engine_volleyball_ondisk(tmp_path):
    root = str(tmp_path / "videos")
    tracks = {}
    for sid in (0, 1):
        tracks.update(_write_volleyball_seq(root, sid))
    with open(os.path.join(root, "tracks_normalized.pkl"), "wb") as f:
        pickle.dump(tracks, f)

    cfg = Config("volleyball").replace(
        training_stage=2, inference_module_name="dynamic_volleyball",
        data_path=root, train_seqs=[0], test_seqs=[1],
        backbone="alex", image_size=(64, 96), out_size=(1, 2),
        emb_features=256, num_before=1, num_after=1, num_frames=3,
        num_boxes=12, num_features_boxes=64, num_features_gcn=64,
        lite_dim=None, ST_kernel_size=((3, 3),), sampling_ratio=[1],
        beta_factor=False, batch_size=2, test_batch_size=2, max_epoch=1,
        train_backbone=True, compute_dtype="float32",
        result_root=str(tmp_path / "res"), exp_note="ondisk_vb")
    best = train_net(cfg, max_steps_per_epoch=2)
    assert "activities_acc" in best
    files = os.listdir(cfg.result_path)
    assert any(f.endswith(".ckpt") for f in files)
    log = open(os.path.join(cfg.result_path, "log.txt")).read()
    assert "Test at epoch" in log


def _write_collective_seq(root, sid, num_frames):
    from PIL import Image

    seq = os.path.join(root, "seq%02d" % sid)
    os.makedirs(seq, exist_ok=True)
    lines = []
    for fid in (1, 11):
        # raw actions: Crossing x2 + Waiting -> majority Crossing;
        # variable actor counts across clips exercise the padding path
        acts = [2, 2, 3] if fid == 1 else [3, 3, 2, 2, 3]
        for aid, act in enumerate(acts):
            lines.append("%d\t%d\t%d\t10\t20\t%d"
                         % (fid, 10 * aid, 5 * aid, act))
        for f in range(fid, fid + num_frames):
            img = np.full((24, 32, 3), (sid * 17 + f * 11) % 255, np.uint8)
            Image.fromarray(img).save(
                os.path.join(seq, "frame%04d.jpg" % f))
    with open(os.path.join(seq, "annotations.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_engine_collective_ondisk(tmp_path):
    root = str(tmp_path / "ActivityDataset")
    for sid in (1, 2):
        _write_collective_seq(root, sid, num_frames=2)

    cfg = Config("collective").replace(
        training_stage=2, inference_module_name="dynamic_collective",
        data_path=root, train_seqs=[1], test_seqs=[2],
        backbone="alex", image_size=(64, 96), out_size=(1, 2),
        emb_features=256, num_frames=2, num_boxes=13, num_actions=5,
        num_activities=4, num_features_boxes=64, num_features_gcn=64,
        ST_kernel_size=(3, 3), sampling_ratio=[1], beta_factor=False,
        batch_size=2, test_batch_size=2, max_epoch=1, train_backbone=True,
        compute_dtype="float32", result_root=str(tmp_path / "res"),
        exp_note="ondisk_cad")
    best = train_net(cfg, max_steps_per_epoch=2)
    assert "activities_acc" in best
    files = os.listdir(cfg.result_path)
    assert any(f.endswith(".ckpt") for f in files)
