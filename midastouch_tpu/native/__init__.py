"""ctypes bindings for the native mesh-graph engine (geodesic.cpp).

Build (done automatically on first use, or `make -C midastouch_tpu/native`):
    g++ -O3 -shared -fPIC geodesic.cpp -o libmidastouch_native.so

Falls back to scipy.sparse.csgraph when the library can't be built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmidastouch_native.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             os.path.join(_DIR, "geodesic.cpp"), "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.geodesic_path.restype = ctypes.c_int
    lib.geodesic_path.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.feature_edges.restype = ctypes.c_int
    lib.feature_edges.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    _lib = lib
    return _lib


def _cptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def geodesic_path(
    vertices: np.ndarray, faces: np.ndarray, src: int, dst: int
) -> np.ndarray:
    """Vertex-id path src..dst along mesh edges (Dijkstra). Native when
    available, scipy.sparse.csgraph otherwise."""
    v = np.ascontiguousarray(vertices, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(len(v) + 1, dtype=np.int32)
        n = lib.geodesic_path(
            _cptr(v, ctypes.c_float), len(v), _cptr(f, ctypes.c_int), len(f),
            int(src), int(dst), _cptr(out, ctypes.c_int), len(out),
        )
        if n > 0:
            return out[:n].copy()
    return _geodesic_path_scipy(v, f, src, dst)


def _geodesic_path_scipy(v, f, src, dst):
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import dijkstra

    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    w = np.linalg.norm(v[e[:, 0]] - v[e[:, 1]], axis=1)
    g = coo_matrix((w, (e[:, 0], e[:, 1])), shape=(len(v), len(v)))
    _, pred = dijkstra(
        g, directed=False, indices=src, return_predecessors=True
    )
    path = [dst]
    while path[-1] != src:
        p = pred[path[-1]]
        if p < 0:
            raise ValueError("no path")
        path.append(p)
    return np.asarray(path[::-1], dtype=np.int32)


def feature_edges(
    vertices: np.ndarray, faces: np.ndarray, angle_deg: float = 10.0
) -> np.ndarray | None:
    """(E, 2) sharp/boundary vertex pairs, or None if native lib missing
    (callers fall back to the numpy implementation in geometry.mesh)."""
    lib = get_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    cap = 3 * len(f) + 8
    out = np.empty((cap, 2), dtype=np.int32)
    n = lib.feature_edges(
        _cptr(v, ctypes.c_float), len(v), _cptr(f, ctypes.c_int), len(f),
        ctypes.c_float(angle_deg), _cptr(out, ctypes.c_int), cap,
    )
    if n < 0:
        return None
    return out[:n].copy()
