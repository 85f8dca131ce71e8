"""ctypes bindings + lazy build for the native C++ image loader.

The shared library is compiled on first use (g++ -O3, libpng) and cached
next to the source; the KITTI dataset falls back to PIL transparently if the
toolchain or libpng is unavailable (``utils/kitti.py``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_SO = os.path.join(_DIR, "libsvoload.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-lpng", "-lpthread", "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.svo_decode_png_gray.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.svo_decode_png_gray.restype = ctypes.c_int
        lib.svo_prefetch_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.svo_prefetch_create.restype = ctypes.c_void_p
        lib.svo_prefetch_next.argtypes = [ctypes.c_void_p, u8p, u8p]
        lib.svo_prefetch_next.restype = ctypes.c_int
        lib.svo_prefetch_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def decode_png_gray(path: str, static_hw: tuple[int, int] | None = None) -> np.ndarray:
    """Decode a PNG to (H, W) uint8, optionally edge-padded to static_hw."""
    lib = get_lib()
    if static_hw is None:
        # Probe real size with a big scratch buffer sized from the file.
        from PIL import Image

        with Image.open(path) as im:
            static_hw = im.size[1], im.size[0]
    h, w = static_hw
    out = np.empty((h, w), np.uint8)
    ih = ctypes.c_int()
    iw = ctypes.c_int()
    rc = lib.svo_decode_png_gray(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, ctypes.byref(ih), ctypes.byref(iw))
    if rc != 0:
        raise IOError(f"native png decode failed ({rc}): {path}")
    return out


def iter_stereo_prefetch(paths: list[tuple[str, str]], static_hw: tuple[int, int],
                         depth: int = 4, n_threads: int = 2,
                         ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Iterate decoded (left, right) pairs with background prefetch."""
    lib = get_lib()
    h, w = static_hw
    n = len(paths)
    left_arr = (ctypes.c_char_p * n)(*[p[0].encode() for p in paths])
    right_arr = (ctypes.c_char_p * n)(*[p[1].encode() for p in paths])
    handle = lib.svo_prefetch_create(left_arr, right_arr, n, h, w, depth, n_threads)
    if not handle:
        raise RuntimeError("prefetcher creation failed")
    try:
        for _ in range(n):
            out_l = np.empty((h, w), np.uint8)
            out_r = np.empty((h, w), np.uint8)
            rc = lib.svo_prefetch_next(
                handle, out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                out_r.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if rc == -1:
                return
            if rc == -2:
                raise IOError("native decode failed during prefetch")
            yield out_l, out_r
    finally:
        lib.svo_prefetch_destroy(handle)
