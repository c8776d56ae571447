"""ctypes bindings for the native C++ image codec + staging library.

Builds `native/_imagecodec.so` from `imagecodec.cpp` + `resample.cpp`
(g++ -O3 -fopenmp, linked against libpng/libjpeg) on first use, caches it
next to the source, and reports unavailable if the toolchain or codec
libraries are missing — callers (data/native_pipeline.py, serve) fall
back to PIL transparently. Every call releases the GIL (ctypes), so a
Python thread pool parallelises decode+resize across cores.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_SRCS = [
    os.path.join(_NATIVE_DIR, "imagecodec.cpp"),
    os.path.join(_NATIVE_DIR, "resample.cpp"),
]
_LIB = os.path.join(_NATIVE_DIR, "_imagecodec.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_ERRORS = {
    -1: "file unreadable",
    -2: "unsupported image format",
    -3: "decode error",
    -4: "buffer/dimension mismatch",
}


class CodecError(RuntimeError):
    def __init__(self, rc: int, context: str):
        super().__init__(f"{context}: {_ERRORS.get(rc, f'error {rc}')}")
        self.rc = rc


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        *_SRCS, "-lpng", "-ljpeg", "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or any(
            os.path.exists(s) and os.path.getmtime(s) > os.path.getmtime(_LIB)
            for s in _SRCS
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        ip = ctypes.POINTER(ctypes.c_int)
        fp = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.codec_probe_file.argtypes = [ctypes.c_char_p, ip, ip, ip]
        lib.codec_probe_file.restype = ctypes.c_int
        lib.codec_probe_mem.argtypes = [u8p, ctypes.c_long, ip, ip, ip]
        lib.codec_probe_mem.restype = ctypes.c_int
        lib.codec_decode_mem_u8.argtypes = [
            u8p, ctypes.c_long, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int
        ]
        lib.codec_decode_mem_u8.restype = ctypes.c_int
        lib.codec_load_image_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, fp, ip
        ]
        lib.codec_load_image_f32.restype = ctypes.c_int
        lib.codec_load_label_i32.argtypes = [
            ctypes.c_char_p, ctypes.c_int, i32p, ip, i32p, ctypes.c_long
        ]
        lib.codec_load_label_i32.restype = ctypes.c_int
        lib.codec_load_heatmap_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, fp, ip
        ]
        lib.codec_load_heatmap_f32.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _meta_buf():
    return np.zeros(6, np.int32)


def _meta_dict(m: np.ndarray, target: int) -> dict:
    h, w, nh, nw, pt, pl = (int(v) for v in m)
    return {
        "original_size": (h, w),
        "new_size": (nh, nw),
        "pad": (pl, pt, target - nw - pl, target - nh - pt),
        "scale": min(target / h, target / w),
    }


def probe(path: str) -> Tuple[int, int, int]:
    """(h, w, channels) of a PNG/JPEG file without full decode."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image codec unavailable")
    h = ctypes.c_int(); w = ctypes.c_int(); c = ctypes.c_int()
    rc = lib.codec_probe_file(path.encode(), h, w, c)
    if rc != 0:
        raise CodecError(rc, f"probe {path}")
    return h.value, w.value, c.value


def probe_bytes(data: bytes) -> Tuple[int, int, int]:
    """(h, w, channels) of in-memory PNG/JPEG bytes — header-only, no
    full decode (the cheap gate for format-dependent dispatch)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image codec unavailable")
    buf = np.frombuffer(data, np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    h = ctypes.c_int(); w = ctypes.c_int(); c = ctypes.c_int()
    rc = lib.codec_probe_mem(bp, len(data), h, w, c)
    if rc != 0:
        raise CodecError(rc, "probe bytes")
    return h.value, w.value, c.value


def decode_bytes(data: bytes) -> np.ndarray:
    """Decode in-memory PNG/JPEG bytes to (H, W, C) uint8 — the serving
    upload path's native alternative to PIL."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image codec unavailable")
    buf = np.frombuffer(data, np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    h = ctypes.c_int(); w = ctypes.c_int(); c = ctypes.c_int()
    rc = lib.codec_probe_mem(bp, len(data), h, w, c)
    if rc != 0:
        raise CodecError(rc, "probe bytes")
    out = np.empty((h.value, w.value, c.value), np.uint8)
    rc = lib.codec_decode_mem_u8(
        bp, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h.value, w.value, c.value,
    )
    if rc != 0:
        raise CodecError(rc, "decode bytes")
    return out


def load_image(path: str, target: int, antialias: bool = True):
    """Decode + resize_with_padding in one native call.

    Returns ((T, T, 3) float32 in [0,1], meta dict) with the exact
    ops/geometry.py resize_with_padding_np contract."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image codec unavailable")
    out = np.empty((target, target, 3), np.float32)
    m = _meta_buf()
    rc = lib.codec_load_image_f32(
        path.encode(), target, int(antialias),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc != 0:
        raise CodecError(rc, f"load image {path}")
    return out, _meta_dict(m, target)


# default speculative orig-label capacity: comfortably above Oxford-Pet
# native resolutions (≤ ~500×500), so one decode suffices per file
_DEFAULT_ORIG_CAP = 768 * 768


def load_label(
    path: str,
    target: int,
    orig_hw: Optional[Tuple[int, int]] = None,
    want_orig: bool = False,
):
    """Decode a class-id label PNG + nearest resize_with_padding.

    Returns ((T, T) int32, meta dict) — plus the (H, W) int32
    native-resolution label when `orig_hw` (exact dims, e.g. from
    probe()) or `want_orig` (dims discovered from the decode itself via
    a speculative buffer; no separate probe/file re-read) is given."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image codec unavailable")
    out = np.empty((target, target), np.int32)
    m = _meta_buf()
    if orig_hw is not None:
        flat = np.empty(int(orig_hw[0]) * int(orig_hw[1]), np.int32)
    elif want_orig:
        flat = np.empty(_DEFAULT_ORIG_CAP, np.int32)
    else:
        flat = None

    def call(buf):
        bp = (
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            if buf is not None
            else None
        )
        return lib.codec_load_label_i32(
            path.encode(), target,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), bp,
            buf.size if buf is not None else 0,
        )

    rc = call(flat)
    if rc == -4 and flat is not None and m[0] > 0:
        # capacity miss: meta6 is valid (C contract) — retry exact
        flat = np.empty(int(m[0]) * int(m[1]), np.int32)
        rc = call(flat)
    if rc != 0:
        raise CodecError(rc, f"load label {path}")
    meta = _meta_dict(m, target)
    if flat is not None:
        h, w = meta["original_size"]
        return out, meta, flat[: h * w].reshape(h, w).copy()
    return out, meta


def load_heatmap(path: str, target: int, antialias: bool = True):
    """Decode a 0-255 L-mode heatmap PNG + linear resize_with_padding.

    Returns ((T, T, 1) float32 in [0,1], meta dict)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image codec unavailable")
    out = np.empty((target, target, 1), np.float32)
    m = _meta_buf()
    rc = lib.codec_load_heatmap_f32(
        path.encode(), target, int(antialias),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc != 0:
        raise CodecError(rc, f"load heatmap {path}")
    return out, _meta_dict(m, target)
