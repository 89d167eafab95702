"""ctypes bindings for the native host-pipeline codecs (codecs.cpp).

Builds the shared library on first use (g++, libpng, libjpeg — all in the
image; no pybind11 needed) and caches it next to the source. Every entry
point degrades gracefully: ``available()`` is False when the toolchain or
libs are missing and callers fall back to PIL/cv2.

Why native: decode is the host-side bottleneck of real KITTI/NYU training
(the reference leans on torch's C++ DataLoader workers for the same
reason); Python-thread decode serializes on the GIL outside the small
PIL/cv2 C sections, while ``decode_batch`` fans a whole batch across
std::thread workers with zero Python in the loop.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "codecs.cpp")
_LIB = os.path.join(_DIR, "libsndepth_codecs.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-lpng", "-ljpeg", "-lz", "-pthread", "-o", _LIB]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    return proc.returncode == 0 and os.path.exists(_LIB)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SNDEPTH_NATIVE_CODECS", "1") == "0":
            return None
        stale = (not os.path.exists(_LIB) or
                 os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.snd_probe.argtypes = [ctypes.c_char_p] + \
            [ctypes.POINTER(ctypes.c_int)] * 4
        lib.snd_probe.restype = ctypes.c_int
        lib.snd_decode.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int]
        lib.snd_decode.restype = ctypes.c_int
        lib.snd_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.snd_decode_batch.restype = ctypes.c_int
        lib.snd_decode_alloc.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p)] + \
            [ctypes.POINTER(ctypes.c_int)] * 4
        lib.snd_decode_alloc.restype = ctypes.c_int
        lib.snd_free.argtypes = [ctypes.c_void_p]
        lib.snd_free.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def probe(path: str) -> tuple[int, int, int, int]:
    """(h, w, channels, bits) of a PNG/JPEG file."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native codecs unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    rc = lib.snd_probe(path.encode(), ctypes.byref(h), ctypes.byref(w),
                       ctypes.byref(c), ctypes.byref(b))
    if rc:
        raise IOError(f"probe({path}) failed rc={rc}")
    return h.value, w.value, c.value, b.value


def decode(path: str) -> np.ndarray:
    """Decode one PNG (8/16-bit, any channels) or JPEG. Returns (H, W) or
    (H, W, C), dtype uint8 or uint16 — same array PIL/cv2 would give.

    Single file read (C-side alloc + one memcpy into numpy)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native codecs unavailable")
    buf = ctypes.c_void_p()
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    rc = lib.snd_decode_alloc(path.encode(), ctypes.byref(buf),
                              ctypes.byref(h), ctypes.byref(w),
                              ctypes.byref(c), ctypes.byref(b))
    if rc:
        raise IOError(f"decode({path}) failed rc={rc}")
    try:
        dtype = np.uint16 if b.value == 16 else np.uint8
        nbytes = h.value * w.value * c.value * dtype().itemsize
        src = np.ctypeslib.as_array(
            ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)),
            shape=(nbytes,))
        out = src.view(dtype).reshape(h.value, w.value, c.value).copy()
    finally:
        lib.snd_free(buf)
    return out[..., 0] if c.value == 1 else out


def decode_batch(paths: list[str], nthreads: int | None = None
                 ) -> np.ndarray:
    """Decode same-shaped images across a std::thread pool -> (N, H, W, C)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native codecs unavailable")
    if not paths:
        raise ValueError("empty batch")
    h, w, c, bits = probe(paths[0])
    dtype = np.uint16 if bits == 16 else np.uint8
    out = np.empty((len(paths), h, w, c), dtype)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    n = nthreads or min(len(paths), os.cpu_count() or 1)
    rc = lib.snd_decode_batch(arr, len(paths),
                              out.ctypes.data_as(ctypes.c_void_p),
                              h, w, c, bits, n)
    if rc:
        raise IOError(f"decode_batch failed at index {-rc - 1} "
                      f"({paths[-rc - 1]})")
    return out
