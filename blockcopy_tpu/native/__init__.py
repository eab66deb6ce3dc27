"""ctypes bindings for the native runtime library (``io.cpp``).

Provides threaded PNG decode + resize + normalize (the data-loading hot
path) and CPU NMS/soft-NMS.  Falls back gracefully when the library isn't
built — callers check ``available()`` and use the PIL/numpy paths otherwise.

Build once with ``make -C blockcopy_tpu/native`` (auto-attempted on first
import if g++ is present).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libblockcopy_io.so")
_lib = None


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception as e:  # pragma: no cover
        logger.debug("native build failed: %s", e)
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_DIR, "io.cpp")
    if os.path.exists(_SO) and os.path.exists(src) \
            and os.path.getmtime(src) > os.path.getmtime(_SO):
        _try_build()  # source newer than the library: best-effort refresh
    if not os.path.exists(_SO) and not _try_build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.bc_decode_image.restype = ctypes.c_int
    lib.bc_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.bc_decode_batch.restype = ctypes.c_int
    lib.bc_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.bc_decode_label.restype = ctypes.c_int
    lib.bc_decode_label.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.bc_nms.restype = ctypes.c_int
    lib.bc_nms.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                           ctypes.c_float, ctypes.POINTER(ctypes.c_int)]
    lib.bc_soft_nms.restype = ctypes.c_int
    lib.bc_soft_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_image(path: str, out_w: int, out_h: int, mean, std) -> np.ndarray:
    lib = _load()
    assert lib is not None
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((out_h, out_w, 3), np.float32)
    rc = lib.bc_decode_image(path.encode(), out_w, out_h, _fptr(mean),
                             _fptr(std), _fptr(out))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return out


def decode_clip(paths, out_w: int, out_h: int, mean, std,
                num_threads: int = 6) -> np.ndarray:
    """Decode a clip into one contiguous (T, H, W, 3) float32 array."""
    lib = _load()
    assert lib is not None
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.bc_decode_batch(arr, n, out_w, out_h, _fptr(mean),
                                   _fptr(std), _fptr(out), num_threads)
    if failures:
        raise IOError(f"native clip decode: {failures}/{n} frames failed")
    return out


def decode_label(path: str, max_hw=(2048, 4096)) -> np.ndarray:
    lib = _load()
    assert lib is not None
    buf = np.empty(max_hw[0] * max_hw[1], np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.bc_decode_label(path.encode(),
                             buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                             ctypes.byref(w), ctypes.byref(h), buf.size)
    if rc != 0:
        raise IOError(f"native label decode failed ({rc}): {path}")
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


def nms(dets: np.ndarray, iou_thr: float) -> np.ndarray:
    lib = _load()
    assert lib is not None
    dets = np.ascontiguousarray(dets, np.float32)
    keep = np.empty(len(dets), np.int32)
    k = lib.bc_nms(_fptr(dets), len(dets), iou_thr,
                   keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:k].copy()


def soft_nms(dets: np.ndarray, iou_thr: float = 0.3, method: str = "linear",
             sigma: float = 0.5, min_score: float = 1e-3):
    lib = _load()
    assert lib is not None
    dets = np.ascontiguousarray(dets, np.float32).copy()
    keep = np.empty(len(dets), np.int32)
    m = {"linear": 0, "gaussian": 1, "naive": 2}[method]
    k = lib.bc_soft_nms(_fptr(dets), len(dets), iou_thr, m, sigma, min_score,
                        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    # rows [0, k) are the kept detections, positionally aligned with the
    # kept original indices (same contract as ops.nms.soft_nms_numpy)
    return dets[:k].copy(), keep[:k].copy()
