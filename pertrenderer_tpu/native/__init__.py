"""ctypes bindings for the native (C++) runtime components.

Currently: the fast OBJ parser (objparse.cpp).  The shared library is built
lazily with g++ on first use (cached next to the source); every consumer has
a pure-Python fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "objparse.cpp")
_LIB = os.path.join(_DIR, "libobjparse.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


class _ObjData(ctypes.Structure):
    _fields_ = [
        ("verts", ctypes.POINTER(ctypes.c_float)),
        ("n_verts", ctypes.c_long),
        ("uvs", ctypes.POINTER(ctypes.c_float)),
        ("n_uvs", ctypes.c_long),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("n_normals", ctypes.c_long),
        ("faces_v", ctypes.POINTER(ctypes.c_int)),
        ("faces_t", ctypes.POINTER(ctypes.c_int)),
        ("faces_n", ctypes.POINTER(ctypes.c_int)),
        ("n_faces", ctypes.c_long),
        ("mtl", ctypes.c_char * 1024),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                        < os.path.getmtime(_SRC)):
            if not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.obj_parse.restype = ctypes.POINTER(_ObjData)
            lib.obj_parse.argtypes = [ctypes.c_char_p]
            lib.obj_free.argtypes = [ctypes.POINTER(_ObjData)]
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def parse_obj_native(path: str) -> Optional[dict]:
    """Parse an OBJ with the C++ parser.  Returns dict of numpy arrays
    {verts (V,3), uvs (Vt,2) or None, normals, faces_v/t/n (F,3), mtl}
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ptr = lib.obj_parse(path.encode())
    if not ptr:
        raise FileNotFoundError(path)
    d = ptr.contents
    try:
        def _np(p, n, w, dtype):
            if n == 0:
                return np.zeros((0, w), dtype)
            return np.ctypeslib.as_array(p, shape=(n, w)).astype(dtype,
                                                                 copy=True)

        out = {
            "verts": _np(d.verts, d.n_verts, 3, np.float32),
            "uvs": _np(d.uvs, d.n_uvs, 2, np.float32) if d.n_uvs else None,
            "normals": (_np(d.normals, d.n_normals, 3, np.float32)
                        if d.n_normals else None),
            "faces_v": _np(d.faces_v, d.n_faces, 3, np.int32),
            "faces_t": _np(d.faces_t, d.n_faces, 3, np.int32),
            "faces_n": _np(d.faces_n, d.n_faces, 3, np.int32),
            "mtl": d.mtl.decode() or None,
        }
    finally:
        lib.obj_free(ptr)
    return out
