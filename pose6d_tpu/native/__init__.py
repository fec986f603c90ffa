"""ctypes bindings for the native (C++) components.

Builds lazily via `make` on first use if the shared library is missing;
callers fall back to the pure-Python implementations when no compiler
is available.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libpose6d_native.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_DIR)], check=True,
                       capture_output=True)
    _lib = ctypes.CDLL(str(_LIB_PATH))
    _lib.decimate_qem.restype = ctypes.c_int
    _lib.decimate_qem.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def decimate_qem(verts: np.ndarray, faces: np.ndarray, target_faces: int):
    lib = _load()
    verts = np.ascontiguousarray(verts, np.float64)
    faces = np.ascontiguousarray(faces, np.int64)
    nv, nf = len(verts), len(faces)
    out_verts = np.empty_like(verts)
    out_faces = np.empty_like(faces)
    out_nv = ctypes.c_int64()
    out_nf = ctypes.c_int64()
    rc = lib.decimate_qem(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nv,
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), nf,
        target_faces,
        out_verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(out_nv), ctypes.byref(out_nf))
    if rc != 0:
        raise RuntimeError(f"decimate_qem failed rc={rc}")
    return (out_verts[:out_nv.value].copy(),
            out_faces[:out_nf.value].copy())
