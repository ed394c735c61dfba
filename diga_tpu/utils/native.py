"""ctypes bindings for the native host-ops library (native/host_ops.cpp).

Auto-builds the .so on first import if a compiler is available; every
function has a numpy fallback, so the package works without the native
library (e.g. in minimal CI).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
# installed (non-repo) layouts: point DIGA_TPU_NATIVE_LIB at the built .so
_SO_PATH = os.environ.get(
    "DIGA_TPU_NATIVE_LIB",
    os.path.abspath(os.path.join(_NATIVE_DIR, "libdiga_host_ops.so")))

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build():
        _lib = False
        return _lib
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.remap_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_size_t, ctypes.POINTER(ctypes.c_uint8)]
        lib.normalize_bgr.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t, ctypes.POINTER(ctypes.c_float)]
        lib.fast_hist.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_size_t, ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
        lib.label_histogram_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def remap_u8(labels: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """LUT remap for uint8 label maps (native or numpy)."""
    lib = get_lib()
    labels = np.ascontiguousarray(labels, dtype=np.uint8)
    if lib:
        out = np.empty_like(labels)
        lut_c = np.ascontiguousarray(lut, dtype=np.uint8)
        lib.remap_u8(_ptr(labels, ctypes.c_uint8), _ptr(out, ctypes.c_uint8),
                     labels.size, _ptr(lut_c, ctypes.c_uint8))
        return out
    return lut[labels]


def normalize_bgr(rgb_uint8: np.ndarray, mean_bgr: np.ndarray) -> np.ndarray:
    """Fused RGB->BGR + mean-subtract + /128 (native or numpy)."""
    lib = get_lib()
    rgb = np.ascontiguousarray(rgb_uint8, dtype=np.uint8)
    if lib and rgb.ndim == 3 and rgb.shape[-1] == 3:
        out = np.empty(rgb.shape, dtype=np.float32)
        mean_c = np.ascontiguousarray(mean_bgr, dtype=np.float32)
        lib.normalize_bgr(_ptr(rgb, ctypes.c_uint8), _ptr(out, ctypes.c_float),
                          rgb.size // 3, _ptr(mean_c, ctypes.c_float))
        return out
    img = rgb.astype(np.float32)[..., ::-1]
    return (img - mean_bgr) / 128.0


def fast_hist(gt: np.ndarray, pred: np.ndarray, n_class: int) -> np.ndarray:
    """Host confusion-matrix counts (native or numpy bincount)."""
    lib = get_lib()
    gt = np.ascontiguousarray(gt.reshape(-1), dtype=np.int32)
    pred = np.ascontiguousarray(pred.reshape(-1), dtype=np.int32)
    if lib:
        hist = np.zeros((n_class, n_class), dtype=np.int64)
        lib.fast_hist(_ptr(gt, ctypes.c_int32), _ptr(pred, ctypes.c_int32),
                      gt.size, n_class, _ptr(hist, ctypes.c_int64))
        return hist
    mask = (gt >= 0) & (gt < n_class)
    return np.bincount(
        n_class * gt[mask] + pred[mask], minlength=n_class ** 2
    ).reshape(n_class, n_class)


def label_histogram(labels: np.ndarray) -> np.ndarray:
    """256-bin label histogram for the rare-class resampling gate."""
    lib = get_lib()
    labels = np.ascontiguousarray(labels, dtype=np.uint8)
    if lib:
        counts = np.zeros((256,), dtype=np.int64)
        lib.label_histogram_u8(_ptr(labels, ctypes.c_uint8), labels.size,
                               _ptr(counts, ctypes.c_int64))
        return counts
    return np.bincount(labels.reshape(-1), minlength=256)
