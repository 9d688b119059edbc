"""ctypes binding for the native data plane (native/decoder.cpp).

decode_resize_batch() releases the GIL for the whole batch: JPEG decode +
Pillow-compatible antialiased resize run on C++ threads, overlapping Python
and device work. Images the native path can't handle (PNG, CMYK JPEG,
truncated files) are reported back and the caller falls back to PIL.

The library is built by scripts/build_native.sh; if missing, this module
attempts a one-shot build and otherwise reports unavailable (the loader then
uses pure PIL — functionality identical, just slower).
"""

from __future__ import annotations

import ctypes
import os

import pathlib
import subprocess

import numpy as np

_LIB_PATH = (pathlib.Path(__file__).parent.parent / "native_lib"
             / "libcalmdata.so")
_SRC = pathlib.Path(__file__).parent.parent.parent / "native" / "decoder.cpp"
_lib = None
_tried = False


def _build() -> bool:
    try:
        _LIB_PATH.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             "-o", str(_LIB_PATH), str(_SRC), "-ljpeg", "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and _SRC.exists():
        _build()
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.decode_resize_batch.restype = None
        lib.resize_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.resize_rgb.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def decode_resize_batch(paths: list[str], out_size: int,
                        n_threads: int | None = None):
    """Returns (images uint8 (N, out, out, 3), ok bool (N,)). Failed entries
    have ok=False and undefined pixels — decode those with PIL.

    n_threads defaults to the host core count (capped at the batch size):
    the decode pool should scale with the machine, not a fixed constant —
    ImageNet hosts feeding a chip at ~600 img/s need every core."""
    if n_threads is None:
        n_threads = max(1, min(os.cpu_count() or 8, len(paths)))
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native data plane unavailable")
    n = len(paths)
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.decode_resize_batch(
        arr, n, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads)
    return out, ok.astype(bool)


def resize_rgb(img: np.ndarray, out_size: int) -> np.ndarray:
    """Antialiased bilinear resize of one RGB uint8 image (testing hook)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native data plane unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    h, w, _ = img.shape
    out = np.empty((out_size, out_size, 3), np.uint8)
    lib.resize_rgb(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                   w, h, out_size,
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
