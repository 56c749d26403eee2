"""ctypes bindings for the native GeoTIFF batch decoder.

Builds (once, via make) and loads ``libinstageo_native.so``. All entry
points degrade gracefully: ``available()`` is False when no compiler/zlib
exists and callers fall back to the pure-Python codec.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libinstageo_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_DTYPES = {1: np.uint8, 2: np.uint16, 3: np.int16, 4: np.int32,
           5: np.float32, 6: np.float64, 7: np.int8, 8: np.uint32}


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception as e:
        log.debug("native build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            log.warning("cannot load native decoder: %s", e)
            return None
        lib.igt_open_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32)]
        lib.igt_open_info.restype = ctypes.c_int
        lib.igt_read_full.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                      ctypes.c_int64]
        lib.igt_read_full.restype = ctypes.c_int
        lib.igt_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int]
        lib.igt_read_batch.restype = ctypes.c_int
        lib.igt_last_error.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_info(path: str) -> Tuple[int, int, int, np.dtype]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    w = ctypes.c_int64()
    h = ctypes.c_int64()
    b = ctypes.c_int64()
    dt = ctypes.c_int32()
    rc = lib.igt_open_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(b), ctypes.byref(dt))
    if rc != 0:
        raise IOError(f"{path}: {lib.igt_last_error().decode()}")
    return w.value, h.value, b.value, np.dtype(_DTYPES[dt.value])


def read_geotiff_native(path: str) -> np.ndarray:
    """Decode one raster to (bands, h, w)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    w, h, b, dtype = read_info(path)
    out = np.empty((b, h, w), dtype)
    rc = lib.igt_read_full(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                           out.nbytes)
    if rc != 0:
        raise IOError(f"{path}: {lib.igt_last_error().decode()}")
    return out


def read_batch_native(paths: List[str], shape: Tuple[int, int, int],
                      dtype: np.dtype, n_threads: int = 0) -> np.ndarray:
    """Decode many same-shape rasters concurrently -> (N, bands, h, w).

    Failed items are zero-filled (the dataset QA layer drops empties).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    out = np.empty((n,) + tuple(shape), np.dtype(dtype))
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.igt_read_batch(
        arr, n, out.ctypes.data_as(ctypes.c_void_p),
        out.nbytes // max(n, 1), n_threads)
    if failures:
        log.warning("native batch decode: %d/%d items failed", failures, n)
    return out
