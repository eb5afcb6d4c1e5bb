"""ctypes loader for the native eval matcher (csrc/eval_match.cpp).

Compiles on first use into the package directory with g++ (cached by mtime);
falls back to the pure-numpy matcher when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "..", "csrc", "eval_match.cpp")
_LIB = os.path.join(_DIR, "_eval_match.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                       check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        lib.greedy_match.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_match(dt_scores, iou_mat, gt_ignore, iou_thrs, dt_ignore):
    """Native greedy matching; returns (dtm, dt_ig) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    D, G = iou_mat.shape
    T = len(iou_thrs)
    order = np.argsort(-np.asarray(dt_scores), kind="stable").astype(np.int64)
    iou = np.ascontiguousarray(iou_mat, np.float64)
    gi = np.ascontiguousarray(gt_ignore, np.uint8)
    di = np.ascontiguousarray(dt_ignore, np.uint8)
    th = np.ascontiguousarray(iou_thrs, np.float64)
    dtm = np.empty((T, D), np.int64)
    dig = np.empty((T, D), np.uint8)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.greedy_match(p(order, ctypes.c_int64), D,
                     p(iou, ctypes.c_double), G,
                     p(gi, ctypes.c_uint8), p(di, ctypes.c_uint8),
                     p(th, ctypes.c_double), T,
                     p(dtm, ctypes.c_int64), p(dig, ctypes.c_uint8))
    return dtm, dig.astype(bool)
