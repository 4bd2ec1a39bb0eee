"""Native JPEG loader: decode parity with PIL, batch path, fallback."""

import io

import numpy as np
import pytest

from din_tpu import native

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader did not build")


def _jpeg(rng, h=64, w=96, quality=92):
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_decode_exact_vs_pil(rng):
    """At the native size both paths run the same libjpeg — must be
    bit-identical."""
    data = _jpeg(rng)
    ours = native.decode_resize(data, 64, 96)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(ours, ref)


def test_resize_shape_and_range(rng):
    data = _jpeg(rng, 128, 128)
    out = native.decode_resize(data, 48, 72)
    assert out.shape == (48, 72, 3)
    assert out.dtype == np.uint8


def test_batch(rng):
    datas = [_jpeg(rng) for _ in range(6)]
    batch = native.decode_resize_batch(datas, 32, 48, n_threads=3)
    assert batch.shape == (6, 32, 48, 3)
    for i, d in enumerate(datas):
        single = native.decode_resize(d, 32, 48)
        np.testing.assert_array_equal(batch[i], single)


def test_bad_data_raises(rng):
    with pytest.raises(RuntimeError):
        native.decode_resize(b"not a jpeg", 32, 32)


def test_load_frame_fallback(tmp_path, rng):
    """load_frame falls back to PIL for non-JPEG files the native decoder
    rejects (e.g. PNG)."""
    img = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(img).save(p)
    out = native.load_frame(str(p), 20, 20)
    assert out.shape == (20, 20, 3)


def test_load_frames_clip_batch(tmp_path, rng):
    """Clip-level batched file decode == per-frame decode, incl. the PIL
    fallback when one file is not a JPEG."""
    paths = []
    for i in range(4):
        img = (rng.rand(40, 60, 3) * 255).astype(np.uint8)
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(img).save(p, "JPEG", quality=92)
        paths.append(str(p))
    batch = native.load_frames(paths, 40, 60)
    assert batch.shape == (4, 40, 60, 3)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(batch[i], native.load_frame(p, 40, 60))

    # poison one file -> whole-clip PIL fallback still returns the frames
    img = (rng.rand(40, 60, 3) * 255).astype(np.uint8)
    png = tmp_path / "4.png"
    Image.fromarray(img).save(png)
    mixed = paths + [str(png)]
    out = native.load_frames(mixed, 20, 30)
    assert out.shape == (5, 20, 30, 3)
