"""ctypes bindings for the native host-geometry library (libd3ga_native).

Builds on first use via `make` (g++; no pybind11 in this image). All
entry points have pure-numpy fallbacks elsewhere in the package, so a
missing compiler degrades gracefully.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libd3ga_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    _lib = ctypes.CDLL(_LIB_PATH)

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    _lib.knn_mean_sq_dist.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p]
    _lib.knn_query.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int, i32p]
    _lib.embed_points_in_tets.argtypes = [
        f32p, ctypes.c_int, f32p, ctypes.c_int, i32p, ctypes.c_int,
        ctypes.c_float, f32p, i32p, u8p,
    ]
    _lib.voxelize_mesh.argtypes = [
        f32p, ctypes.c_int, i32p, ctypes.c_int, f32p, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
    ]
    _lib.marching_tetrahedra.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
        ctypes.c_float, ctypes.c_float, f32p, ctypes.c_int,
    ]
    _lib.marching_tetrahedra.restype = ctypes.c_int
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def knn_mean_sq_dist_native(points: np.ndarray, k: int = 3) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(pts.shape[0], np.float32)
    lib.knn_mean_sq_dist(pts, pts.shape[0], k, out)
    return out


def knn_query_native(points: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    q = np.ascontiguousarray(queries, np.float32)
    out = np.empty((q.shape[0], k), np.int32)
    lib.knn_query(pts, pts.shape[0], q, q.shape[0], k, out)
    return out


def embed_points_in_tets_native(points, tet_points, tetras, eps=1e-6):
    lib = _load()
    p = np.ascontiguousarray(points, np.float32)
    tp = np.ascontiguousarray(tet_points, np.float32)
    tt = np.ascontiguousarray(tetras, np.int32)
    n = p.shape[0]
    bary = np.empty((n, 4), np.float32)
    tid = np.empty(n, np.int32)
    active = np.empty(n, np.uint8)
    lib.embed_points_in_tets(
        p, n, tp, tp.shape[0], tt, tt.shape[0], float(eps), bary, tid, active
    )
    return bary, tid, active.astype(bool)


def voxelize_mesh_native(verts, faces, origin, pitch, shape):
    lib = _load()
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    o = np.ascontiguousarray(origin, np.float32)
    nx, ny, nz = shape
    occ = np.empty(nx * ny * nz, np.uint8)
    lib.voxelize_mesh(v, v.shape[0], f, f.shape[0], o, float(pitch), nx, ny, nz, occ)
    return occ.reshape(nx, ny, nz)


def marching_tetrahedra_native(grid, origin, pitch, iso=0.5, max_tris=4_000_000):
    lib = _load()
    g = np.ascontiguousarray(grid, np.float32)
    o = np.ascontiguousarray(origin, np.float32)
    out = np.empty((max_tris, 3, 3), np.float32)
    n = lib.marching_tetrahedra(
        g, g.shape[0], g.shape[1], g.shape[2], o, float(pitch), float(iso),
        out.reshape(-1), max_tris,
    )
    tri_verts = out[:n].reshape(-1, 3)
    # weld duplicate vertices
    key = np.round(tri_verts / (pitch * 1e-4)).astype(np.int64)
    _, idx, inv = np.unique(key, axis=0, return_index=True, return_inverse=True)
    verts = tri_verts[idx]
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts, faces[ok]
