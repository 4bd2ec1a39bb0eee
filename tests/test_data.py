"""Data layer: annotation parsers against synthetic fixture files written in
the reference's grammar, sampling policies, loaders."""

import os
import pickle

import numpy as np
import pytest

from din_tpu.config import Config
from din_tpu.data.collective import (ACTION6_TO_5, ACTIVITY5_TO_4,
                                     collective_read_annotations)
from din_tpu.data.loader import BatchLoader
from din_tpu.data.synthetic import SyntheticDataset
from din_tpu.data.volleyball import (VolleyballDataset,
                                     volley_read_annotations)


def _write_volleyball_fixture(root, sid=0, fids=(10, 20)):
    """Write annotations.txt + frames + tracks in the reference layout
    (volleyball.py:30-65, JPEG tree <sid>/<src_fid>/<fid>.jpg)."""
    from PIL import Image
    vdir = os.path.join(root, str(sid))
    os.makedirs(vdir, exist_ok=True)
    lines = []
    tracks = {}
    for fid in fids:
        people = ["%d %d %d %d %s" % (10 + i, 20 + i, 5, 8, "digging")
                  for i in range(3)]
        lines.append("%d.jpg r_set " % fid + " ".join(people))
        ftracks = {}
        for f in range(fid - 4, fid + 5):
            d = os.path.join(vdir, str(fid))
            os.makedirs(d, exist_ok=True)
            Image.fromarray(
                np.full((24, 32, 3), (f * 7) % 255, np.uint8)).save(
                    os.path.join(d, f"{f}.jpg"))
            ftracks[f] = np.tile(np.array([[0.1, 0.2, 0.5, 0.4]]), (3, 1))
        tracks[(sid, fid)] = ftracks
    with open(os.path.join(vdir, "annotations.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "tracks_normalized.pkl"), "wb") as f:
        pickle.dump(tracks, f)
    return tracks


def test_volleyball_parser(tmp_path):
    tracks = _write_volleyball_fixture(str(tmp_path))
    anns = volley_read_annotations(str(tmp_path / "0" / "annotations.txt"))
    assert set(anns) == {10, 20}
    a = anns[10]
    assert a["group_activity"] == 0                      # r_set
    assert a["actions"] == [1, 1, 1]                     # digging
    # xywh (x=10, y=20, w=5, h=8) -> (y1, x1, y2, x2) (volleyball.py:52-54)
    np.testing.assert_array_equal(a["bboxes"][0], [20, 10, 28, 15])

    ds = VolleyballDataset(
        anns={0: anns}, tracks=tracks, frames=[(0, 10)],
        images_path=str(tmp_path), image_size=(24, 32), feature_size=(2, 3),
        inference_module_name="dynamic_volleyball", num_boxes=12,
        is_training=True, is_finetune=False)
    sample = ds[0]
    assert sample["images"].shape == (9, 24, 32, 3)
    assert sample["boxes"].shape == (9, 12, 4)
    assert sample["actions"].shape == (9, 12)
    # pad-by-repetition: the 4th actor repeats the 1st
    np.testing.assert_array_equal(sample["boxes"][0, 3], sample["boxes"][0, 0])
    # track box (0.1,0.2,0.5,0.4) -> feature coords x*OW, y*OH
    np.testing.assert_allclose(sample["boxes"][0, 0],
                               [0.2 * 3, 0.1 * 2, 0.4 * 3, 0.5 * 2],
                               rtol=1e-5)


def test_volleyball_sampling_policies(tmp_path):
    tracks = _write_volleyball_fixture(str(tmp_path))
    anns = volley_read_annotations(str(tmp_path / "0" / "annotations.txt"))
    common = dict(anns={0: anns}, tracks=tracks, frames=[(0, 10)],
                  images_path=str(tmp_path), image_size=(24, 32),
                  feature_size=(2, 3), num_boxes=12)
    # stage-1 train: 1 random frame in [src-5, src+4] (volleyball.py:194)
    ds = VolleyballDataset(inference_module_name="dynamic_volleyball",
                           num_before=4, num_after=4, is_training=True,
                           is_finetune=True, **common)
    assert len(ds.sample_frames((0, 10))) == 1
    # stage-2: all consecutive frames
    ds = VolleyballDataset(inference_module_name="dynamic_volleyball",
                           num_before=4, num_after=4, is_training=True,
                           is_finetune=False, **common)
    assert [f[2] for f in ds.sample_frames((0, 10))] == list(range(6, 15))
    # ARG: train 3 random of 10; test fixed 9-frame ordering
    ds = VolleyballDataset(inference_module_name="arg_volleyball",
                           num_before=4, num_after=4, is_training=True,
                           is_finetune=False, **common)
    assert len(ds.sample_frames((0, 10))) == 3
    ds = VolleyballDataset(inference_module_name="arg_volleyball",
                           num_before=4, num_after=4, is_training=False,
                           is_finetune=False, **common)
    assert [f[2] for f in ds.sample_frames((0, 10))] == \
        [7, 10, 13, 6, 9, 12, 8, 11, 14]


def test_collective_parser(tmp_path):
    """Tab-separated grammar, 10th-frame windows, majority vote
    (collective.py:37-81)."""
    seq = tmp_path / "seq01"
    seq.mkdir()
    lines = []
    # frame 1: actions NA(1), Crossing(2), Crossing(2), Walking(5)
    for aid, act in enumerate([1, 2, 2, 5]):
        lines.append("1\t%d\t%d\t10\t20\t%d" % (10 * aid, 5 * aid, act))
    # frame 2 (not %10==1 after windowing... still parsed but dropped)
    lines.append("2\t0\t0\t10\t20\t2")
    # frame 11
    lines.append("11\t5\t5\t10\t20\t3")
    with open(seq / "annotations.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    anns = collective_read_annotations(str(tmp_path), 1)
    assert set(anns) == {1, 11}
    # majority of non-NA actions: Crossing (raw 2 -> action id 1) ->
    # activity id 0 (collective.py:50-52 double -1 mapping)
    assert anns[1]["group_activity"] == 0
    assert len(anns[1]["actions"]) == 4
    # normalized boxes by FRAMES_SIZE[1] = (480, 720)
    y1, x1, y2, x2 = anns[1]["bboxes"][0]
    np.testing.assert_allclose([y1, x1, y2, x2],
                               [5 * 0 / 480, 0 / 720, 20 / 480, 10 / 720])
    # remaps
    assert ACTION6_TO_5[4] == 1          # Walking -> Crossing/Moving
    assert ACTIVITY5_TO_4[3] == 0


def test_batch_loader_shapes():
    cfg = Config("volleyball").replace(
        data_path="synthetic", image_size=(24, 32), out_size=(2, 3),
        num_frames=3, training_stage=2)
    ds = SyntheticDataset(cfg, size=10)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2            # drop_last
    b = batches[0]
    assert b["images"].shape == (4, 3, 24, 32, 3)
    assert b["images"].dtype == np.uint8
    assert b["boxes"].shape == (4, 3, 12, 4)
    assert b["activities"].shape == (4, 3)

    # reshuffles between epochs
    order1 = [b["activities"][:, 0].tolist() for b in loader]
    order2 = [b["activities"][:, 0].tolist() for b in loader]
    assert len(order1) == len(order2) == 2


def test_frame_cache(tmp_path):
    """Decoded-frame LRU cache: identical outputs, hit accounting across
    epochs, byte-budget eviction (din_tpu/data/cache.py)."""
    from din_tpu.data.cache import FrameCache, make_cache

    tracks = _write_volleyball_fixture(str(tmp_path))
    anns = volley_read_annotations(str(tmp_path / "0" / "annotations.txt"))
    common = dict(anns={0: anns}, tracks=tracks, frames=[(0, 10), (0, 20)],
                  images_path=str(tmp_path), image_size=(24, 32),
                  feature_size=(2, 3), num_boxes=12,
                  inference_module_name="dynamic_volleyball",
                  is_training=False, is_finetune=False)
    plain = VolleyballDataset(**common)
    cache = FrameCache(budget_mb=64)
    cached = VolleyballDataset(cache=cache, **common)

    for i in range(2):
        np.testing.assert_array_equal(plain[i]["images"],
                                      cached[i]["images"])
    assert cache.misses == 18 and cache.hits == 0       # 2 clips x 9 frames
    # epoch 2: all hits, still identical
    for i in range(2):
        np.testing.assert_array_equal(plain[i]["images"],
                                      cached[i]["images"])
    assert cache.hits == 18 and cache.misses == 18
    assert len(cache) == 18 and cache.nbytes == 18 * 24 * 32 * 3

    # eviction: budget for ~6 frames of 24x32x3 (2304 B each)
    small = FrameCache(budget_mb=6 * 2304 / (1 << 20))
    tiny = VolleyballDataset(cache=small, **common)
    _ = tiny[0]
    assert len(small) == 6              # 9 decoded, LRU-evicted down to 6
    assert small.nbytes <= small.budget_bytes
    _ = tiny[0]                         # re-read: mostly misses again
    assert small.misses > 9

    # make_cache knob
    assert make_cache(Config("volleyball")) is None
    assert make_cache(Config("volleyball").replace(
        decode_cache_mb=32)).budget_bytes == 32 << 20


def test_packed_frame_store(tmp_path):
    """Packed decoded-frame store (data/packed.py): byte-identical to live
    decode, relocatable suffix lookup, miss fallback, dataset integration,
    make_frame_source precedence."""
    from din_tpu import native
    from din_tpu.data.packed import (PackedFrameStore, make_frame_source,
                                     pack_frames)

    tracks = _write_volleyball_fixture(str(tmp_path))
    out = str(tmp_path / "frames.pack")
    n = pack_frames(str(tmp_path), out, 24, 32, batch=5)
    assert n == 18                                  # 2 clips x 9 frames

    store = PackedFrameStore(out, root=str(tmp_path))
    paths = [os.path.join(str(tmp_path), "0", "10", f"{f}.jpg")
             for f in range(6, 15)]
    np.testing.assert_array_equal(store.load_frames(paths, 24, 32),
                                  native.load_frames(paths, 24, 32))
    assert store.hits == 9 and store.misses == 0

    # relocatable: no root, paths under a different mount point resolve by
    # the <sid>/<src_fid>/<fid>.jpg suffix (the real store travels hosts)
    roaming = PackedFrameStore(out)
    moved = [p.replace(str(tmp_path), "/elsewhere/videos") for p in paths]
    np.testing.assert_array_equal(roaming.load_frames(moved, 24, 32),
                                  native.load_frames(paths, 24, 32))
    assert roaming.hits == 9

    # miss fallback: a frame absent from the store decodes live
    extra = str(tmp_path / "0" / "10" / "999.jpg")
    from PIL import Image
    Image.fromarray(np.full((24, 32, 3), 7, np.uint8)).save(extra)
    got = store.load_frames([paths[0], extra], 24, 32)
    np.testing.assert_array_equal(got[1], native.load_frames([extra],
                                                             24, 32)[0])
    assert store.misses == 1

    # wrong geometry is an explicit error, not silent resize
    with pytest.raises(ValueError):
        store.load_frames(paths, 48, 64)

    # dataset integration: identical batches through the store
    anns = volley_read_annotations(str(tmp_path / "0" / "annotations.txt"))
    common = dict(anns={0: anns}, tracks=tracks, frames=[(0, 10), (0, 20)],
                  images_path=str(tmp_path), image_size=(24, 32),
                  feature_size=(2, 3), num_boxes=12,
                  inference_module_name="dynamic_volleyball",
                  is_training=False, is_finetune=False)
    plain = VolleyballDataset(**common)
    packed = VolleyballDataset(cache=PackedFrameStore(
        out, root=str(tmp_path)), **common)
    for i in range(2):
        np.testing.assert_array_equal(plain[i]["images"],
                                      packed[i]["images"])

    # make_frame_source precedence: packed > LRU > None
    cfg = Config("volleyball").replace(data_path=str(tmp_path))
    assert make_frame_source(cfg) is None
    assert make_frame_source(
        cfg.replace(decode_cache_mb=32)).budget_bytes == 32 << 20
    src = make_frame_source(cfg.replace(decode_cache_mb=32,
                                        packed_frames_path=out))
    assert isinstance(src, PackedFrameStore) and len(src) == 18


def test_loader_set_epoch_determinism():
    """set_epoch pins the shuffle: order is a pure function of
    (seed, epoch) — resume-invariant — and skip_batches drops exactly the
    already-consumed batches (data/loader.py)."""

    class _Idx:
        def __len__(self):
            return 24

        def __getitem__(self, i):
            return {"x": np.asarray([i])}

    def order_of(loader):
        return [int(x) for b in iter(loader) for x in b["x"][:, 0]]

    a = BatchLoader(_Idx(), 4, shuffle=True, num_workers=1)
    b = BatchLoader(_Idx(), 4, shuffle=True, num_workers=1)
    a.set_epoch(5)
    b.set_epoch(5)
    five = order_of(a)
    assert five == order_of(b)
    b.set_epoch(6)
    assert five != order_of(b)

    # legacy auto-increment unchanged: successive epochs differ
    c = BatchLoader(_Idx(), 4, shuffle=True, num_workers=1)
    assert order_of(c) != order_of(c)

    # skip_batches resumes the SAME epoch order at the next batch
    a.set_epoch(5)
    full = order_of(a)
    a.set_epoch(5, skip_batches=3)
    assert order_of(a) == full[12:]
    a.set_epoch(5)                       # skip is one-shot
    assert order_of(a) == full


def test_hflip_augmentation(tmp_path):
    """Horizontal flip (data/augment.py): mirrored images, mirrored
    feature-coord boxes, l/r activity swap for volleyball, eval-side off,
    and zero-padding preserved under the collective box mask."""
    from din_tpu.data.augment import VOLLEY_ACTIVITY_HFLIP, hflip_clip

    tracks = _write_volleyball_fixture(str(tmp_path))
    anns = volley_read_annotations(str(tmp_path / "0" / "annotations.txt"))
    OW = 3
    common = dict(anns={0: anns}, tracks=tracks, frames=[(0, 10)],
                  images_path=str(tmp_path), image_size=(24, 32),
                  feature_size=(2, OW), num_boxes=12,
                  inference_module_name="dynamic_volleyball",
                  is_finetune=False)
    plain = VolleyballDataset(is_training=True, **common)[0]
    flip = VolleyballDataset(is_training=True, hflip_prob=1.0, **common)[0]
    np.testing.assert_array_equal(flip["images"],
                                  plain["images"][:, :, ::-1])
    np.testing.assert_allclose(flip["boxes"][..., 0],
                               OW - plain["boxes"][..., 2], rtol=1e-6)
    np.testing.assert_allclose(flip["boxes"][..., 2],
                               OW - plain["boxes"][..., 0], rtol=1e-6)
    np.testing.assert_array_equal(flip["boxes"][..., 1],
                                  plain["boxes"][..., 1])
    # fixture activity is r_set (0) -> l_set (4); actions side-agnostic
    assert plain["activities"][0] == 0 and flip["activities"][0] == 4
    np.testing.assert_array_equal(flip["actions"], plain["actions"])
    # the swap is an involution covering all 8 classes
    np.testing.assert_array_equal(
        VOLLEY_ACTIVITY_HFLIP[VOLLEY_ACTIVITY_HFLIP], np.arange(8))

    # eval side never flips, even with the knob set
    ev = VolleyballDataset(is_training=False, hflip_prob=1.0, **common)[0]
    np.testing.assert_array_equal(ev["images"], VolleyballDataset(
        is_training=False, **common)[0]["images"])

    # collective-style zero padding passes through under box_mask
    boxes = np.zeros((1, 3, 4), np.float32)
    boxes[0, 0] = [0.0, 0.5, 1.0, 1.5]          # one real actor of 3
    imgs = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(1, 2, 4, 3)
    mask = np.asarray([[True, False, False]])
    fimgs, fboxes, _ = hflip_clip(imgs, boxes, 3.0, box_mask=mask)
    np.testing.assert_allclose(fboxes[0, 0], [2.0, 0.5, 3.0, 1.5])
    np.testing.assert_array_equal(fboxes[0, 1:], 0)
    np.testing.assert_array_equal(fimgs, imgs[:, :, ::-1])


def test_prefetch_propagates_producer_errors():
    """A failure inside the loader/device_put must reach the training loop
    as an exception, not strand it on q.get() forever (data/loader.py
    producer try/except)."""
    from din_tpu.data.loader import prefetch_to_device

    def bad_iter():
        yield {"x": np.zeros((2, 2), np.float32)}
        raise RuntimeError("corrupt jpeg")

    it = prefetch_to_device(bad_iter(), size=2)
    next(it)                                     # first batch flows
    with pytest.raises(RuntimeError, match="corrupt jpeg"):
        next(it)


def test_volleyball_zero_box_frame_raises(tmp_path):
    """A frame with no annotated boxes cannot be padded by repetition —
    must raise a clear error instead of spinning the pad loop forever."""
    tracks = _write_volleyball_fixture(str(tmp_path))
    anns = volley_read_annotations(str(tmp_path / "0" / "annotations.txt"))
    tracks[(0, 10)] = {f: np.zeros((0, 4)) for f in tracks[(0, 10)]}
    ds = VolleyballDataset(
        anns={0: anns}, tracks=tracks, frames=[(0, 10)],
        images_path=str(tmp_path), image_size=(24, 32), feature_size=(2, 3),
        inference_module_name="dynamic_volleyball", num_boxes=12,
        is_training=True, is_finetune=False)
    with pytest.raises(ValueError, match="no annotated boxes"):
        ds[0]


def _write_collective_fixture(tmp_path, n_people=4, actions=None):
    seq = tmp_path / "seq01"
    seq.mkdir(exist_ok=True)
    actions = actions or [2] * n_people
    lines = ["1\t%d\t%d\t4\t4\t%d" % (4 * aid, 2 * aid, act)
             for aid, act in enumerate(actions)]
    with open(seq / "annotations.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    from PIL import Image
    for fid in range(1, 11):
        Image.fromarray(np.full((16, 24, 3), fid, np.uint8)).save(
            seq / ("frame%04d.jpg" % fid))


def test_collective_truncates_crowded_frames(tmp_path):
    """More annotated people than num_boxes: truncate (volleyball parity),
    never loop appending padding (the old `!=` loop condition)."""
    from din_tpu.data.collective import CollectiveDataset
    _write_collective_fixture(tmp_path, n_people=5)
    anns = collective_read_annotations(str(tmp_path), 1)
    ds = CollectiveDataset(
        anns={1: anns}, frames=[(1, 1)], images_path=str(tmp_path),
        image_size=(16, 24), feature_size=(2, 3), num_boxes=3,
        num_frames=2, is_training=True, is_finetune=False)
    s = ds[0]
    assert s["boxes"].shape == (2, 3, 4)
    assert s["actions"].shape == (2, 3)
    assert int(s["bboxes_num"][0]) == 3          # post-truncation count


def test_collective_all_na_frame_skipped(tmp_path):
    """A frame whose every action is NA has no majority vote — it is
    skipped, not an IndexError (collective.py commit())."""
    _write_collective_fixture(tmp_path, actions=[1, 1, 1])   # all NA
    anns = collective_read_annotations(str(tmp_path), 1)
    assert anns == {}


def test_dataset_draws_are_thread_interleaving_independent(tmp_path):
    """Item content is a pure function of (seed, epoch, index): concurrent
    BatchLoader threads or any access ORDER must not change frame draws —
    the contract exact mid-epoch resume relies on (loader.set_epoch)."""
    tracks = _write_volleyball_fixture(str(tmp_path), fids=(10, 20))
    anns = volley_read_annotations(str(tmp_path / "0" / "annotations.txt"))
    mk = lambda: VolleyballDataset(
        anns={0: anns}, tracks=tracks, frames=[(0, 10), (0, 20)],
        images_path=str(tmp_path), image_size=(24, 32), feature_size=(2, 3),
        inference_module_name="dynamic_volleyball", num_boxes=12,
        num_before=4, num_after=4,
        is_training=True, is_finetune=True, seed=7)

    a, b = mk(), mk()
    a.set_epoch(3), b.set_epoch(3)
    fwd = [a[0]["images"], a[1]["images"]]
    rev = [b[1]["images"], b[0]["images"]][::-1]   # opposite access order
    np.testing.assert_array_equal(fwd[0], rev[0])
    np.testing.assert_array_equal(fwd[1], rev[1])

    # different epoch -> (eventually) different random frame: with 9
    # candidate fids, 16 epochs all drawing the same one is ~1e-15
    c = mk()
    draws = set()
    for ep in range(16):
        c.set_epoch(ep)
        draws.add(c[0]["images"].tobytes())
    assert len(draws) > 1


def test_run_cli_zero_overrides():
    """--max-epoch 0 must override the preset (is-not-None semantics), so
    an eval-only pass via max_epoch=0 is expressible."""
    import din_tpu.experiments.run as run_mod
    parser_cfg = {}

    def fake_train_net(cfg, **kwargs):
        parser_cfg["cfg"] = cfg
        return {}

    orig = run_mod.train_net
    run_mod.train_net = fake_train_net
    try:
        run_mod.main(["--preset", "synthetic_smoke", "--max-epoch", "0"])
    finally:
        run_mod.train_net = orig
    assert parser_cfg["cfg"].max_epoch == 0
