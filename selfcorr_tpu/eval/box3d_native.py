"""ctypes binding for the native exact 3D-IoU library (native/box3d_iou.cpp).

Auto-builds the shared library on first use (g++ is part of the toolchain);
falls back to the pure-python eval/box3d.py implementation when compilation
is unavailable. The native path removes the per-rotation scipy ConvexHull
cost from the NOCS 18-rotation symmetry sweep.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbox3d_iou.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        dptr = ctypes.POINTER(ctypes.c_double)
        lib.box3d_iou.restype = ctypes.c_double
        lib.box3d_iou.argtypes = [dptr, dptr]
        lib.box3d_iou_batch.restype = None
        lib.box3d_iou_batch.argtypes = [dptr, dptr, ctypes.c_int, dptr]
        lib.box3d_iou_max.restype = ctypes.c_double
        lib.box3d_iou_max.argtypes = [dptr, dptr, ctypes.c_int]
        _lib = lib
    except Exception as e:
        print(f"[box3d_native] falling back to python IoU ({e})")
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def iou(verts_a: np.ndarray, verts_b: np.ndarray) -> float:
    lib = _load()
    a = np.ascontiguousarray(verts_a, np.float64)
    b = np.ascontiguousarray(verts_b, np.float64)
    if lib is None:
        from selfcorr_tpu.eval.box3d import Box3D, box_iou
        return box_iou(Box3D(a), Box3D(b))
    return float(lib.box3d_iou(_ptr(a), _ptr(b)))


def iou_max(verts_pred: np.ndarray, verts_gts: np.ndarray) -> float:
    """Max IoU of one predicted box against (N, 9, 3) candidate boxes."""
    lib = _load()
    p = np.ascontiguousarray(verts_pred, np.float64)
    g = np.ascontiguousarray(verts_gts, np.float64)
    if lib is None:
        return max(iou(p, gi) for gi in g)
    return float(lib.box3d_iou_max(_ptr(p), _ptr(g), len(g)))
