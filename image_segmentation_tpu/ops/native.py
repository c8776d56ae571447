"""ctypes bindings for the native C++ resampling library.

Builds `native/_resample.so` from `native/resample.cpp` on first use
(g++ -O3 -fopenmp), caches it next to the source, and degrades to the
numpy path transparently if no compiler is available. The GIL is
released for the duration of each call (ctypes), so Python-side thread
pools parallelise across images on top of the library's own OpenMP
batch entry point.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_SRC = os.path.join(_NATIVE_DIR, "resample.cpp")
_LIB = os.path.join(_NATIVE_DIR, "_resample.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        fp = ctypes.POINTER(ctypes.c_float)
        lib.resample_linear.argtypes = [fp] + [ctypes.c_int] * 7 + [fp] + [
            ctypes.c_int
        ] * 3
        lib.resample_nearest.argtypes = lib.resample_linear.argtypes
        lib.resample_batch_linear.argtypes = [fp] + [ctypes.c_int] * 4 + [
            fp
        ] + [ctypes.c_int] * 3
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _check_crop(ih: int, iw: int, y0: int, x0: int, ch: int, cw: int) -> None:
    """Reject out-of-bounds crops BEFORE they reach C++ (a bad crop would
    be an out-of-bounds heap read there, not an IndexError)."""
    if y0 < 0 or x0 < 0 or ch <= 0 or cw <= 0 or y0 + ch > ih or x0 + cw > iw:
        raise ValueError(
            f"crop (y0={y0}, x0={x0}, h={ch}, w={cw}) outside image "
            f"({ih}, {iw})"
        )


def resize_linear(
    img: np.ndarray,
    out_hw,
    antialias: bool = False,
    crop=None,
) -> np.ndarray:
    """Native (crop+)resize of (H, W, C) float32. crop = (y0, x0, ch, cw)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native resample library unavailable")
    img = np.ascontiguousarray(img, dtype=np.float32)
    ih, iw, c = img.shape
    y0, x0, ch, cw = crop if crop is not None else (0, 0, ih, iw)
    _check_crop(ih, iw, y0, x0, ch, cw)
    oh, ow = int(out_hw[0]), int(out_hw[1])
    out = np.empty((oh, ow, c), np.float32)
    lib.resample_linear(
        _fp(img), ih, iw, c, y0, x0, ch, cw, _fp(out), oh, ow, int(antialias)
    )
    return out


def resize_nearest(
    img: np.ndarray, out_hw, exact: bool = True, crop=None
) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native resample library unavailable")
    img = np.ascontiguousarray(img, dtype=np.float32)
    ih, iw, c = img.shape
    y0, x0, ch, cw = crop if crop is not None else (0, 0, ih, iw)
    _check_crop(ih, iw, y0, x0, ch, cw)
    oh, ow = int(out_hw[0]), int(out_hw[1])
    out = np.empty((oh, ow, c), np.float32)
    lib.resample_nearest(
        _fp(img), ih, iw, c, y0, x0, ch, cw, _fp(out), oh, ow, int(exact)
    )
    return out


def resize_batch_linear(
    imgs: np.ndarray, out_hw, antialias: bool = False
) -> np.ndarray:
    """OpenMP-parallel resize of (N, H, W, C) float32 same-sized images."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native resample library unavailable")
    imgs = np.ascontiguousarray(imgs, dtype=np.float32)
    n, ih, iw, c = imgs.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    out = np.empty((n, oh, ow, c), np.float32)
    lib.resample_batch_linear(
        _fp(imgs), n, ih, iw, c, _fp(out), oh, ow, int(antialias)
    )
    return out
