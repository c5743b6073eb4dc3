"""ctypes bindings for the native host ops (voxel downsample, grid kNN, FPS).

Native counterpart of the reference's Open3D C++ dependency surface
(data/kitti.py:148-180, 240-254).  The library is built with
``make -C cofii2p_tpu/native`` (auto-attempted on first import); every entry
point has a NumPy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libhost_ops.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.voxel_downsample.restype = ctypes.c_int64
    lib.voxel_downsample.argtypes = [
        f32p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, f32p, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.knn_search.restype = None
    lib.knn_search.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float, i32p,
    ]
    lib.farthest_point_sampling.restype = None
    lib.farthest_point_sampling.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def voxel_downsample(points: np.ndarray, attrs: np.ndarray | None, voxel: float):
    """Native voxel downsample; same contract as data.voxel.voxel_downsample."""
    lib = _load()
    if lib is None:
        from cofii2p_tpu.data.voxel import voxel_downsample as np_impl

        return np_impl(points, attrs, voxel)
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    a = 0 if attrs is None else attrs.shape[1]
    at = None if attrs is None else np.ascontiguousarray(attrs, np.float32)
    out_p = np.empty((n, 3), np.float32)
    out_a = np.empty((n, max(a, 1)), np.float32)
    m = lib.voxel_downsample(
        pts,
        None if at is None else at.ctypes.data_as(ctypes.c_void_p),
        n, a, voxel, out_p,
        out_a.ctypes.data_as(ctypes.c_void_p), n,
    )
    return out_p[:m].copy(), (None if attrs is None else out_a[:m, :a].copy())


def knn(queries: np.ndarray, database: np.ndarray, k: int, grid_cell: float = 0.0):
    """Exact kNN indices (nq, k) via the native grid index; padded with
    len(database) when the database has fewer than k points."""
    lib = _load()
    if lib is None:
        sq = (
            (queries[:, None, :] - database[None, :, :]) ** 2
        ).sum(-1)
        return np.argsort(sq, axis=-1)[:, :k].astype(np.int32)
    q = np.ascontiguousarray(queries, np.float32)
    d = np.ascontiguousarray(database, np.float32)
    out = np.empty((q.shape[0], k), np.int32)
    lib.knn_search(q, q.shape[0], d, d.shape[0], k, grid_cell, out)
    return out


def farthest_point_sampling(points: np.ndarray, k: int, start: int = 0):
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is None:
        out = [start]
        best = ((pts - pts[start]) ** 2).sum(-1)
        for _ in range(k - 1):
            nxt = int(np.argmax(best))
            out.append(nxt)
            best = np.minimum(best, ((pts - pts[nxt]) ** 2).sum(-1))
        return np.asarray(out, np.int32)
    out = np.empty((k,), np.int32)
    lib.farthest_point_sampling(pts, pts.shape[0], k, start, out)
    return out
