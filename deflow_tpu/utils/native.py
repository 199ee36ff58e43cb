"""ctypes loader for the native host ops (csrc/libpointops.so).

TPU equivalent of the reference's native data-path layer (its CUDA
extensions cover device ops — SURVEY.md §2.3; host-side it leans on torch
DataLoader worker fleets).  Build with ``make -C csrc``; everything here
degrades to numpy transparently when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "csrc", "libpointops.so"),
        os.environ.get("DEFLOW_POINTOPS_LIB", ""),
    ):
        if cand and os.path.exists(cand):
            return cand
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64 = ctypes.c_int64
    lib.select_pad.restype = i64
    lib.select_pad.argtypes = [f32p, u8p, i64, i64, f32p, i32p, u8p,
                               f32p, u8p, f32p, i32p, u8p]
    lib.se3_transform.restype = None
    lib.se3_transform.argtypes = [f32p, f64p, i64, f32p]
    lib.bin_points.restype = None
    lib.bin_points.argtypes = [f32p, i64, f32p, f32p, i32p, i32p, u8p]
    i32 = ctypes.c_int32
    lib.pillar_prep.restype = None
    lib.pillar_prep.argtypes = [f32p, u8p, i64, f32p, f32p, i32p, i32,
                                i32p, i32p, i32p, i32p]
    if hasattr(lib, "sorted_record"):
        lib.sorted_record.restype = None
        lib.sorted_record.argtypes = [f32p, i64, f32p, f32p, i32p, i32,
                                      i32p, i32p, f32p]
    if hasattr(lib, "gather_rows"):
        vp = ctypes.c_void_p
        lib.gather_rows.restype = None
        lib.gather_rows.argtypes = [vp, i32p, i64, i64, vp]
    if hasattr(lib, "chamfer_cell_prep"):
        lib.chamfer_cell_prep.restype = None
        lib.chamfer_cell_prep.argtypes = [f32p, u8p, u8p, i64,
                                          ctypes.c_float, f32p, i32, i32,
                                          f32p, i32p, i32p]
    _LIB = lib
    return lib


def _ptr(a: Optional[np.ndarray], ctype):
    if a is None:
        return ctypes.cast(None, ctypes.POINTER(ctype))
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def select_pad(
    pts: np.ndarray,
    ground: Optional[np.ndarray],
    max_points: int,
    flow: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    valid: Optional[np.ndarray] = None,
):
    """Fused ground-filter + pad-to-static.  Returns
    (pts [max,3], mask [max], flow?, labels?, valid?, n_kept)."""
    lib = get_lib()
    pts = np.ascontiguousarray(pts[:, :3], np.float32)
    n = len(pts)
    if lib is None:
        keep = np.ones(n, bool) if ground is None else ~ground.astype(bool)
        sel = np.flatnonzero(keep)[:max_points]
        out_p = np.zeros((max_points, 3), np.float32)
        out_m = np.zeros(max_points, bool)
        out_p[: len(sel)] = pts[sel]
        out_m[: len(sel)] = True
        gather = lambda a, z: (
            None if a is None else _pad_gather(a, sel, max_points, z))
        return (out_p, out_m, gather(flow, np.float32),
                gather(labels, np.int32), gather(valid, bool), int(keep.sum()))

    ground_c = (None if ground is None
                else np.ascontiguousarray(ground, np.uint8))
    flow_c = None if flow is None else np.ascontiguousarray(flow, np.float32)
    labels_c = None if labels is None else np.ascontiguousarray(labels, np.int32)
    valid_c = None if valid is None else np.ascontiguousarray(valid, np.uint8)

    out_p = np.zeros((max_points, 3), np.float32)
    out_m = np.zeros(max_points, np.uint8)
    out_f = None if flow is None else np.zeros((max_points, 3), np.float32)
    out_l = None if labels is None else np.zeros(max_points, np.int32)
    out_v = None if valid is None else np.zeros(max_points, np.uint8)
    kept = lib.select_pad(
        _ptr(pts, ctypes.c_float), _ptr(ground_c, ctypes.c_uint8),
        n, max_points,
        _ptr(flow_c, ctypes.c_float), _ptr(labels_c, ctypes.c_int32),
        _ptr(valid_c, ctypes.c_uint8),
        _ptr(out_p, ctypes.c_float), _ptr(out_m, ctypes.c_uint8),
        _ptr(out_f, ctypes.c_float), _ptr(out_l, ctypes.c_int32),
        _ptr(out_v, ctypes.c_uint8))
    return (out_p, out_m.astype(bool), out_f, out_l,
            None if out_v is None else out_v.astype(bool), int(kept))


def _pad_gather(a, sel, max_points, dtype):
    out = np.zeros((max_points,) + a.shape[1:], dtype)
    out[: len(sel)] = a[sel]
    return out


_POOL = None
_POOL_SIZE = 0
_POOL_LOCK = None


def shared_pool(num_workers: int):
    """Process-wide ThreadPoolExecutor for GIL-free host work (grows to the
    largest requested size; per-batch pool creation costs thread spawns on
    the hot loader path, and per-loader pools leak idle threads)."""
    global _POOL, _POOL_SIZE, _POOL_LOCK
    import threading
    from concurrent.futures import ThreadPoolExecutor

    if _POOL_LOCK is None:
        _POOL_LOCK = threading.Lock()
    with _POOL_LOCK:
        if _POOL is None or num_workers > _POOL_SIZE:
            if _POOL is not None:
                _POOL.shutdown(wait=False)
            _POOL = ThreadPoolExecutor(max_workers=int(num_workers))
            _POOL_SIZE = int(num_workers)
    return _POOL


def permute_rows(a: np.ndarray, order: np.ndarray) -> np.ndarray:
    """``a[order]`` for 1-D/2-D arrays — C++/OpenMP row gather (GIL-free via
    ctypes) with a numpy fallback.  Used by the sorted data pipeline, which
    permutes ~10 per-point arrays per sample."""
    lib = get_lib()
    a = np.ascontiguousarray(a)
    if lib is None or not hasattr(lib, "gather_rows") or a.ndim > 2:
        return a[order]
    order = np.ascontiguousarray(order, np.int32)
    out = np.empty((len(order),) + a.shape[1:], a.dtype)
    row_bytes = a.itemsize * (a.shape[1] if a.ndim == 2 else 1)
    lib.gather_rows(a.ctypes.data_as(ctypes.c_void_p),
                    _ptr(order, ctypes.c_int32), len(order), row_bytes,
                    out.ctypes.data_as(ctypes.c_void_p))
    return out


def se3_transform(pts: np.ndarray, pose: np.ndarray) -> np.ndarray:
    lib = get_lib()
    pts = np.ascontiguousarray(pts[:, :3], np.float32)
    if lib is None:
        return (pts @ pose[:3, :3].T.astype(np.float32)
                + pose[:3, 3].astype(np.float32))
    pose_c = np.ascontiguousarray(pose, np.float64)
    out = np.empty_like(pts)
    lib.se3_transform(_ptr(pts, ctypes.c_float), _ptr(pose_c, ctypes.c_double),
                      len(pts), _ptr(out, ctypes.c_float))
    return out


def bin_points(pts: np.ndarray, vmin, vsize, grid) -> Tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    pts = np.ascontiguousarray(pts[:, :3], np.float32)
    if lib is None:
        c = np.floor((pts - np.asarray(vmin, np.float32))
                     / np.asarray(vsize, np.float32)).astype(np.int32)
        ok = ((c >= 0) & (c < np.asarray(grid, np.int32))).all(axis=1)
        return c, ok
    coords = np.empty((len(pts), 3), np.int32)
    ok = np.empty(len(pts), np.uint8)
    lib.bin_points(
        _ptr(pts, ctypes.c_float), len(pts),
        _ptr(np.ascontiguousarray(vmin, np.float32), ctypes.c_float),
        _ptr(np.ascontiguousarray(vsize, np.float32), ctypes.c_float),
        _ptr(np.ascontiguousarray(grid, np.int32), ctypes.c_int32),
        _ptr(coords, ctypes.c_int32), _ptr(ok, ctypes.c_uint8))
    return coords, ok.astype(bool)


def _use_s2d(grid) -> bool:
    """s2d pillar-id order on even grids (mirrors VoxelConfig.use_s2d)."""
    return int(grid[0]) % 2 == 0 and int(grid[1]) % 2 == 0


def _encode_ids_np(cx, cy, grid):
    if _use_s2d(grid):
        cell = (cy >> 1) * (int(grid[0]) // 2) + (cx >> 1)
        return cell * 4 + (cy & 1) * 2 + (cx & 1)
    return cy * int(grid[0]) + cx


def _decode_ids_np(pid, grid):
    if _use_s2d(grid):
        ph = pid % 4
        cell = pid // 4
        w2 = int(grid[0]) // 2
        return (cell % w2) * 2 + ph % 2, (cell // w2) * 2 + ph // 2
    return pid % int(grid[0]), pid // int(grid[0])


def pillar_prep(pts: np.ndarray, mask: np.ndarray, vmin, vsize, grid):
    """Host-side pillar prep for one padded cloud: bin + stable sort.

    Returns (pillar_id [N], order [N], iperm [N], sorted_id [N]) int32 —
    the ragged bookkeeping the device would otherwise spend two argsorts on.
    Invalid/padding points carry the trash id ``grid[0]*grid[1]``; ids use
    the s2d order on even grids (ops/voxel.py encode_pillar_id).
    """
    pts = np.ascontiguousarray(pts[:, :3], np.float32)
    mask_c = np.ascontiguousarray(mask, np.uint8)
    n = len(pts)
    grid = np.ascontiguousarray(grid, np.int32)
    trash = int(grid[0]) * int(grid[1])
    s2d = int(_use_s2d(grid))
    lib = get_lib()
    if lib is None:
        vmin = np.asarray(vmin, np.float32)
        vsize = np.asarray(vsize, np.float32)
        rel = np.floor((pts - vmin) / vsize)
        ok = mask.astype(bool) & np.isfinite(pts).all(1) & (
            (rel >= 0) & (rel < grid)).all(1)
        c = np.where(ok[:, None], rel, 0).astype(np.int64)
        pid = np.where(ok, _encode_ids_np(c[:, 0], c[:, 1], grid),
                       trash).astype(np.int32)
        order = np.argsort(pid, kind="stable").astype(np.int32)
        iperm = np.empty_like(order)
        iperm[order] = np.arange(n, dtype=np.int32)
        return pid, order, iperm, pid[order]

    pid = np.empty(n, np.int32)
    order = np.empty(n, np.int32)
    iperm = np.empty(n, np.int32)
    sorted_id = np.empty(n, np.int32)
    lib.pillar_prep(
        _ptr(pts, ctypes.c_float), _ptr(mask_c, ctypes.c_uint8), n,
        _ptr(np.ascontiguousarray(vmin, np.float32), ctypes.c_float),
        _ptr(np.ascontiguousarray(vsize, np.float32), ctypes.c_float),
        _ptr(grid, ctypes.c_int32), s2d,
        _ptr(pid, ctypes.c_int32), _ptr(order, ctypes.c_int32),
        _ptr(iperm, ctypes.c_int32), _ptr(sorted_id, ctypes.c_int32))
    return pid, order, iperm, sorted_id


def sorted_record(pts: np.ndarray, order: np.ndarray, sorted_id: np.ndarray,
                  vmin, vsize, grid) -> np.ndarray:
    """Sorted 9-lane record [xyz | p−centroid | p−center] (ascending-id order,
    invalid rows zero).  Host-side centroids: a pure function of the points,
    so the device spends zero time on the embedder's centroid scatter+gather."""
    pts = np.ascontiguousarray(pts[:, :3], np.float32)
    n = len(pts)
    grid = np.ascontiguousarray(grid, np.int32)
    vmin = np.asarray(vmin, np.float32)
    vsize = np.asarray(vsize, np.float32)
    trash = int(grid[0]) * int(grid[1])
    lib = get_lib()
    if lib is not None and hasattr(lib, "sorted_record"):
        rec = np.empty((n, 9), np.float32)
        lib.sorted_record(
            _ptr(pts, ctypes.c_float), n,
            _ptr(np.ascontiguousarray(vmin), ctypes.c_float),
            _ptr(np.ascontiguousarray(vsize), ctypes.c_float),
            _ptr(grid, ctypes.c_int32), int(_use_s2d(grid)),
            _ptr(np.ascontiguousarray(order, np.int32), ctypes.c_int32),
            _ptr(np.ascontiguousarray(sorted_id, np.int32), ctypes.c_int32),
            _ptr(rec, ctypes.c_float))
        return rec

    valid = sorted_id < trash
    pts_s = pts[order]
    safe_id = np.where(valid, sorted_id, 0).astype(np.int64)
    counts = np.bincount(safe_id, weights=valid, minlength=trash)
    cent = np.stack([
        np.bincount(safe_id, weights=np.where(valid, pts_s[:, a], 0.0),
                    minlength=trash) for a in range(3)], axis=-1)
    cent /= np.maximum(counts, 1.0)[:, None]
    cluster = pts_s - cent[safe_id]
    gx, gy = _decode_ids_np(safe_id, grid)
    cx = gx.astype(np.float32)
    cy = gy.astype(np.float32)
    cz = np.clip(np.floor((pts_s[:, 2] - vmin[2]) / vsize[2]), 0, grid[2] - 1)
    center = np.stack([(cx + 0.5) * vsize[0] + vmin[0],
                       (cy + 0.5) * vsize[1] + vmin[1],
                       (cz + 0.5) * vsize[2] + vmin[2]], axis=-1)
    rec = np.concatenate([pts_s, cluster, pts_s - center], axis=-1)
    return np.where(valid[:, None], rec, 0.0).astype(np.float32)
