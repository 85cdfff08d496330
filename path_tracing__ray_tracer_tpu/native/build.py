"""On-demand compilation + ctypes binding of the native components."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _compile() -> Optional[Path]:
    src = _HERE / "bvh_builder.cpp"
    out = _HERE / "libptrt_bvh.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    for cxx in (os.environ.get("CXX"), "g++", "clang++"):
        if not cxx:
            continue
        try:
            subprocess.run(
                [cxx, "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", str(out), str(src)],
                check=True, capture_output=True, timeout=120,
            )
            return out
        except Exception:
            continue
    return None


def load_bvh_builder():
    """Returns ``build(tri_min, tri_max, leaf_size) -> dict | None``.

    None (or a function returning None) means "use the numpy fallback".
    """
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            path = _compile()
            if path is not None:
                try:
                    lib = ctypes.CDLL(str(path))
                    lib.ptrt_build_bvh.restype = ctypes.c_int
                    lib.ptrt_build_bvh.argtypes = [
                        ctypes.POINTER(ctypes.c_float),
                        ctypes.POINTER(ctypes.c_float),
                        ctypes.c_int, ctypes.c_int, ctypes.c_int,
                        ctypes.POINTER(ctypes.c_float),
                        ctypes.POINTER(ctypes.c_float),
                        ctypes.POINTER(ctypes.c_int32),
                        ctypes.POINTER(ctypes.c_uint8),
                        ctypes.POINTER(ctypes.c_int32),
                    ]
                    _LIB = lib
                except OSError:
                    _LIB = None
    if _LIB is None:
        return None

    lib = _LIB

    def build(tri_min: np.ndarray, tri_max: np.ndarray, leaf_size: int):
        t = tri_min.shape[0]
        tri_min = np.ascontiguousarray(tri_min, dtype=np.float32)
        tri_max = np.ascontiguousarray(tri_max, dtype=np.float32)
        max_nodes = 4 * t + 16
        lo = np.empty((max_nodes, 3), np.float32)
        hi = np.empty((max_nodes, 3), np.float32)
        skip = np.empty(max_nodes, np.int32)
        is_leaf = np.empty(max_nodes, np.uint8)
        slots = np.empty((max_nodes, leaf_size), np.int32)

        def p(a, ty):
            return a.ctypes.data_as(ctypes.POINTER(ty))

        n = lib.ptrt_build_bvh(
            p(tri_min, ctypes.c_float), p(tri_max, ctypes.c_float),
            t, leaf_size, max_nodes,
            p(lo, ctypes.c_float), p(hi, ctypes.c_float),
            p(skip, ctypes.c_int32), p(is_leaf, ctypes.c_uint8),
            p(slots, ctypes.c_int32),
        )
        if n <= 0:
            return None
        return {
            "lo": lo[:n].copy(),
            "hi": hi[:n].copy(),
            "skip": skip[:n].copy(),
            "is_leaf": is_leaf[:n].astype(bool),
            "slots": slots[:n].copy(),
        }

    return build
