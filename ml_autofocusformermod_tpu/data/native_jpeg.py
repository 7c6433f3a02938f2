"""ctypes bindings for the native decode/resample runtime.

``native/src/affdata.cpp`` implements the hot half of the input pipeline
(JPEG decode with DCT-domain downscale + scanline cropping, and a
PIL-equivalent separable resampler). This module builds the shared library
on first use (single translation unit, ~1s) and degrades to ``None``
handles when a toolchain or libjpeg is unavailable, in which case callers
fall back to the pure-PIL path in ``transforms.py``.

No pybind11 in this image -> plain C ABI + ctypes (zero-copy via numpy).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libaffdata.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "src", "affdata.cpp")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-fPIC", "-shared",
        "-march=native", "-std=c++17", _SRC_PATH, "-ljpeg", "-o", _SO_PATH,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0 and os.path.exists(_SO_PATH)
    except (OSError, subprocess.TimeoutExpired):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first call (or None)."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("MLAFF_NO_NATIVE_DATA", "0") == "1":
            _lib_failed = True
            return None
        try:
            src_mtime = os.path.getmtime(_SRC_PATH)
            stale = (not os.path.exists(_SO_PATH)
                     or os.path.getmtime(_SO_PATH) < src_mtime)
            if stale and not _build():
                _lib_failed = True
                return None
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _lib_failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.aff_version.restype = ctypes.c_int
        lib.aff_jpeg_dims.restype = ctypes.c_int
        lib.aff_jpeg_dims.argtypes = [
            u8p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.aff_jpeg_decode_resample.restype = ctypes.c_int
        lib.aff_jpeg_decode_resample.argtypes = [
            u8p, ctypes.c_long,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p,
        ]
        lib.aff_resample_rgb.restype = ctypes.c_int
        lib.aff_resample_rgb.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        ]
        lib.aff_randaugment.restype = ctypes.c_int
        lib.aff_randaugment.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
        ]
        if lib.aff_version() != 1:
            _lib_failed = True
            return None
        _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


_FILTERS = {"bilinear": 0, "bicubic": 1}


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def jpeg_dims(data: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from the JPEG header, or None if not decodable."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    if lib.aff_jpeg_dims(_u8ptr(buf), len(data), ctypes.byref(w),
                         ctypes.byref(h)):
        return None
    return w.value, h.value


def decode_crop_resize(
    data: bytes,
    box: Tuple[float, float, float, float],  # (x, y, w, h) original coords
    out_size: Tuple[int, int],               # (w, h)
    flip: bool = False,
    interpolation: str = "bicubic",
    fast_scale: bool = True,
) -> Optional[np.ndarray]:
    """Decode JPEG bytes, crop ``box``, resample to ``out_size``.

    Returns (h, w, 3) uint8 RGB, or None on failure (caller falls back to
    PIL). Matches ``PIL.Image.resize(size, interp, box=box)`` numerics;
    ``fast_scale`` enables DCT-domain downscale (train-path speedup, ~1 LSB
    off full decode on photographs) — eval passes False.
    """
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    ow, oh = out_size
    out = np.empty((oh, ow, 3), np.uint8)
    rc = lib.aff_jpeg_decode_resample(
        _u8ptr(buf), len(data),
        float(box[0]), float(box[1]), float(box[2]), float(box[3]),
        int(ow), int(oh), int(bool(flip)),
        _FILTERS.get(interpolation, 1), int(bool(fast_scale)), _u8ptr(out),
    )
    return None if rc else out


def randaugment_inplace(arr: np.ndarray, op_ids, params) -> bool:
    """Execute a pre-drawn RandAugment plan in place on (h, w, 3) uint8.

    ``op_ids``/``params`` come from ``RandAugment.plan`` mapped through
    ``transforms.RA_OP_IDS``. Returns False if the native runtime is
    unavailable (caller falls back to the PIL executor on the SAME plan,
    so the rng stream never diverges).
    """
    lib = get_lib()
    if lib is None or not op_ids:
        return lib is not None and not op_ids
    ids = (ctypes.c_int * len(op_ids))(*op_ids)
    ps = (ctypes.c_double * len(params))(*params)
    rc = lib.aff_randaugment(
        _u8ptr(arr), arr.shape[1], arr.shape[0], ids, ps, len(op_ids)
    )
    return rc == 0


def resample_rgb(
    arr: np.ndarray,
    box: Tuple[float, float, float, float],
    out_size: Tuple[int, int],
    flip: bool = False,
    interpolation: str = "bicubic",
) -> Optional[np.ndarray]:
    """Native crop+resample of an in-memory (h, w, 3) uint8 RGB array."""
    lib = get_lib()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, np.uint8)
    ow, oh = out_size
    out = np.empty((oh, ow, 3), np.uint8)
    rc = lib.aff_resample_rgb(
        _u8ptr(arr), arr.shape[1], arr.shape[0],
        float(box[0]), float(box[1]), float(box[2]), float(box[3]),
        int(ow), int(oh), int(bool(flip)),
        _FILTERS.get(interpolation, 1), _u8ptr(out),
    )
    return None if rc else out
