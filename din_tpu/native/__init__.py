"""ctypes bindings for the native JPEG decode+resize loader.

Builds ``libdin_loader.so`` from din_loader.cc on first use (g++ + libjpeg)
and falls back to PIL transparently when the toolchain or library is
missing.  See din_loader.cc for the kernel.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "din_loader.cc")
_SO = os.path.join(_DIR, "libdin_loader.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-ljpeg", "-o", _SO]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        return res.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if needed; None if
    unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.din_decode_resize.restype = ctypes.c_int
        lib.din_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.din_decode_resize_batch.restype = ctypes.c_int
        lib.din_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_long), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def decode_resize(jpeg_bytes: bytes, out_h: int, out_w: int) -> np.ndarray:
    """Decode one JPEG to uint8 RGB [out_h, out_w, 3] (native path).

    Raises RuntimeError on decode failure; caller should fall back to PIL.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.din_decode_resize(
        jpeg_bytes, len(jpeg_bytes), out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise RuntimeError(f"native jpeg decode failed (rc={rc})")
    return out


def decode_resize_batch(jpegs: List[bytes], out_h: int, out_w: int,
                        n_threads: int = 4) -> np.ndarray:
    """Decode a batch of JPEGs to uint8 [n, out_h, out_w, 3]."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(jpegs)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    bufs = (ctypes.c_char_p * n)(*jpegs)
    lens = (ctypes.c_long * n)(*[len(j) for j in jpegs])
    failures = lib.din_decode_resize_batch(
        bufs, lens, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
    if failures:
        raise RuntimeError(f"native jpeg decode failed for {failures} frames")
    return out


def load_frames(paths: List[str], out_h: int, out_w: int,
                n_threads: Optional[int] = None) -> np.ndarray:
    """Decode+resize a clip's JPEG files in ONE native batch call
    (din_loader.cc din_decode_resize_batch — its worker threads decode the
    frames concurrently inside the ctypes call, outside the GIL); per-frame
    PIL fallback.  Returns uint8 [len(paths), out_h, out_w, 3].

    ``n_threads=None`` adapts to the host: single-core machines decode
    serially (thread thrash measured 4x slower there), multi-core use up to
    4 decoder threads.
    """
    if n_threads is None:
        n_threads = max(1, min(4, (os.cpu_count() or 1) - 1))
    try:
        datas = [open(p, "rb").read() for p in paths]
        return decode_resize_batch(datas, out_h, out_w, n_threads)
    except (RuntimeError, OSError):
        return np.stack([load_frame(p, out_h, out_w) for p in paths])


def load_frame(path: str, out_h: int, out_w: int) -> np.ndarray:
    """Decode+resize one JPEG file, native with PIL fallback."""
    try:
        with open(path, "rb") as f:
            data = f.read()
        return decode_resize(data, out_h, out_w)
    except (RuntimeError, OSError):
        from PIL import Image
        img = Image.open(path).convert("RGB")
        img = img.resize((out_w, out_h), Image.BILINEAR)
        return np.asarray(img, np.uint8)
