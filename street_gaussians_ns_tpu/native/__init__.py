"""Native (C++) host-side components, loaded via ctypes.

The TPU compute path is Pallas/XLA; these are the RUNTIME pieces where
the reference leans on C++ (SURVEY.md §2.2: OpenCV's remap, COLMAP's own
readers) and pure Python is measurably slow. Each has a pure-Python
fallback — the extension compiles lazily with g++ on first use and any
failure silently falls back (zero hard native dependency).
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = pathlib.Path(__file__).parent / "colmap_reader.cpp"
_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    """Compile (once) and dlopen the native library; None on any failure."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        cache = pathlib.Path(tempfile.gettempdir()) / "sgnt_native"
        cache.mkdir(parents=True, exist_ok=True)
        so = cache / f"libsgnt_native_{_SRC.stat().st_mtime_ns}.so"
        if not so.exists():
            tmp = so.with_suffix(".so.tmp")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o",
                 str(tmp)],
                check=True, capture_output=True, timeout=120)
            tmp.replace(so)
        lib = ctypes.CDLL(str(so))
        lib.sgnt_points3d_count.restype = ctypes.c_longlong
        lib.sgnt_points3d_count.argtypes = [ctypes.c_char_p]
        lib.sgnt_read_points3d.restype = ctypes.c_longlong
        lib.sgnt_read_points3d.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def read_points3d_binary(path) -> Optional[tuple]:
    """Native points3D.bin parse; None if the extension is unavailable
    (caller falls back to the Python reader). Returns (xyz (N,3) f64,
    rgb (N,3) u8, error (N,) f64, ids (N,) i64)."""
    lib = _load()
    if lib is None:
        return None
    p = str(path).encode()
    n = lib.sgnt_points3d_count(p)
    if n < 0:
        return None
    ids = np.empty(n, np.int64)
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty(n, np.float64)
    got = lib.sgnt_read_points3d(
        p, n,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if got != n:
        return None
    return xyz, rgb, err, ids
