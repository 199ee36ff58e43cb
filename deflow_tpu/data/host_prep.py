"""Host-side ragged bookkeeping for the device (sort/bin offload).

TPU-first division of labor: the device runs only dense, static-shape math;
the host (C++/OpenMP via utils/native.py, numpy fallback) performs the
per-cloud ego compensation, pillar binning, and the stable sort + inverse
permutation that the device would otherwise spend two ~14 ms argsorts per
step on.  The host-computed pillar ids are the single source of truth, so no
host/device float-division agreement is required.

Adds to a collated host batch:
    pc0_transformed            [B, N, 3] f32  ego-compensated pc0
    pc{0,1}_ids                [B, N] int32   pillar id (num_pillars = trash)
    pc{0,1}_order              [B, N] int32   ascending-id permutation
    pc{0,1}_iperm              [B, N] int32   its inverse
    pc{0,1}_sorted             [B, N] int32   ids in sorted order
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from deflow_tpu.utils import native

HOST_PREP_KEYS = (
    "pc0_transformed",
    "pc0_ids", "pc0_order", "pc0_iperm", "pc0_sorted",
    "pc1_ids", "pc1_order", "pc1_iperm", "pc1_sorted",
    # sorted per-point record: [points | cluster | center-offsets] (9 lanes)
    # in ascending-id order.  Point coordinates (and pillar centroids) carry
    # no gradient, so shipping them sorted removes every device-side permute
    # AND the centroid scatter+gather pass from the embedder.
    "pc0_sorted_rec", "pc1_sorted_rec",
)

# SSL chamfer cell prep (host pc1 pre-sort): pc1 is flow-independent, so its
# 2 m-cell counting sort, per-cell start table, and slab lanes for the Pallas
# cell-sweep kernel (ops/pallas_sweep.py) can all come from the host —
# removing one 6-payload device sort + one searchsorted start-table build
# (~4 ms/step at 4x98304 on v5e) from every SSL step.  Attached only when
# the batch carries DUFO labels (the SSL pipelines).
CHAMFER_CELL_KEYS = ("pc1_cell_lanes", "pc1_cell_sid", "pc1_cell_start")


def chamfer_cell_prep(pts: np.ndarray, mask: np.ndarray, flag: np.ndarray,
                      cell: float = 2.0,
                      lo: Sequence[float] = (-51.2, -51.2),
                      hi: Sequence[float] = (51.2, 51.2)) -> Dict[str, np.ndarray]:
    """Per-sample chamfer cell sort for ``ops.chamfer._sweep_cloud_from_host``.

    Bins XY into ``cell``-meter cells (same clipped f32 floor-divide as
    ``chamfer._bin2d``), sorts rows by local cell id (stable — ties keep
    original order, matching the device ``lax.sort``), and emits:

    - ``lanes`` [5, N] f32: sorted x, y, z, flag, original-row.
    - ``sid``   [N] i32: sorted LOCAL cell ids, ``cy·gx + cx``; masked rows
      carry the per-sample sentinel ``(gy+1)·gx`` (sorts to the sample's
      tail; the device maps it to the global sentinel).
    - ``start`` [(gy+1)·gx + 1] i32: first sorted row with id >= c.

    Geometry must mirror ``chamfer._resolve_spec`` for the loss's truncate
    (cell = max(truncate, 0.5), ring = 1, lo/hi = ±51.2 defaults)."""
    gx = int(np.ceil((hi[0] - lo[0]) / cell - 1e-6))
    gy = int(np.ceil((hi[1] - lo[1]) / cell - 1e-6))
    kgap = (gy + 1) * gx
    lo32 = np.asarray(lo, np.float32)
    lib = native.get_lib()
    if lib is not None and hasattr(lib, "chamfer_cell_prep"):
        import ctypes

        n = len(pts)
        lanes = np.empty((5, n), np.float32)
        sid = np.empty((n,), np.int32)
        start = np.empty((kgap + 1,), np.int32)
        lib.chamfer_cell_prep(
            native._ptr(np.ascontiguousarray(pts, np.float32),
                        ctypes.c_float),
            native._ptr(np.ascontiguousarray(mask, np.uint8), ctypes.c_uint8),
            native._ptr(np.ascontiguousarray(flag, np.uint8), ctypes.c_uint8),
            n, ctypes.c_float(cell), native._ptr(lo32, ctypes.c_float),
            gx, gy,
            native._ptr(lanes, ctypes.c_float),
            native._ptr(sid, ctypes.c_int32),
            native._ptr(start, ctypes.c_int32))
        return {"lanes": lanes, "sid": sid, "start": start}
    rel = (pts[:, :2].astype(np.float32) - lo32) / np.float32(cell)
    cc = np.floor(rel).astype(np.int32)
    cx = np.clip(cc[:, 0], 0, gx - 1)
    cy = np.clip(cc[:, 1], 0, gy - 1)
    sid_local = np.where(mask, cy * gx + cx, kgap).astype(np.int32)
    order = np.argsort(sid_local, kind="stable")
    sid_sorted = sid_local[order]
    # zero masked-row coords (mirrors _ssl_nn's zeroed inputs; keeps NaN/inf
    # padding out of the kernel even though the w-lane makes them lose)
    p = np.where(mask[order][:, None], pts[order], 0.0).astype(np.float32)
    lanes = np.stack([p[:, 0], p[:, 1], p[:, 2],
                      flag[order].astype(np.float32),
                      order.astype(np.float32)])
    start = np.searchsorted(sid_sorted,
                            np.arange(kgap + 1, dtype=np.int32)).astype(np.int32)
    return {"lanes": lanes, "sid": sid_sorted, "start": start}


def prep_sample(
    pc0: np.ndarray, pc1: np.ndarray,
    pc0_mask: np.ndarray, pc1_mask: np.ndarray,
    pose0: np.ndarray, pose1: np.ndarray,
    voxel_size: Sequence[float], point_cloud_range: Sequence[float],
    ego_motion: np.ndarray = None,
) -> Dict[str, np.ndarray]:
    lo = np.asarray(point_cloud_range[:3], np.float32)
    hi = np.asarray(point_cloud_range[3:], np.float32)
    vs = np.asarray(voxel_size, np.float32)
    grid = np.round((hi - lo) / vs).astype(np.int32)

    if ego_motion is None:
        ego_motion = np.linalg.inv(np.asarray(pose1, np.float64)) @ np.asarray(
            pose0, np.float64)
    tpc0 = native.se3_transform(pc0, np.asarray(ego_motion, np.float64))

    out = {"pc0_transformed": tpc0}
    for tag, pts, mask in (("pc0", tpc0, pc0_mask), ("pc1", pc1, pc1_mask)):
        pid, order, iperm, sid = native.pillar_prep(pts, mask, lo, vs, grid)
        out[f"{tag}_ids"] = pid
        out[f"{tag}_order"] = order
        out[f"{tag}_iperm"] = iperm
        out[f"{tag}_sorted"] = sid
        # sorted [points | cluster | center-offsets] record — the full 9-lane
        # PFN input, centroids included (pure functions of the points: no
        # gradient, so the host owns them; the z bin only shapes the
        # continuous center feature, ids are z-free)
        out[f"{tag}_sorted_rec"] = native.sorted_record(
            pts, order, sid, lo, vs, grid)
    return out


# Per-point batch keys that ride pc0's (resp. pc1's) point order and must be
# co-permuted when the pipeline runs fully sorted.
_PC0_ALIGNED = ("pc0", "pc0_mask", "flow", "flow_is_valid",
                "flow_category_indices", "eval_mask", "dufo_label0")
_PC1_ALIGNED = ("pc1", "pc1_mask", "dufo_label1")


def attach_host_prep(
    batch: Dict[str, np.ndarray],
    voxel_size: Sequence[float],
    point_cloud_range: Sequence[float],
    sort: bool = False,
    num_workers: int = 0,
) -> Dict[str, np.ndarray]:
    """Augment a collated batch in place with host-prep arrays.

    ``sort=True`` — the fully-sorted pipeline: every per-point array
    (points, masks, labels) is permuted into ascending-pillar-id order on the
    host, so the device runs ZERO permutes anywhere (per-point losses are
    permutation-invariant sums).  ``pc{0,1}_order``/``iperm`` are then not
    shipped (the model treats their absence as "presorted"); the inverse
    permutation stays host-side under ``pc{0,1}_unsort`` for consumers that
    need original point order (``out_orig = out_sorted[unsort]``).

    ``num_workers > 1`` parallelizes across samples with threads: the hot
    per-sample work (SE(3), binning, counting sort, record build, row
    permutes) runs in the C++ library, which releases the GIL via ctypes, so
    threads scale ~linearly (the reference leans on torch DataLoader worker
    PROCESSES for the same reason — 1_train.sh:29 num_workers=16).
    """
    b = batch["pc0"].shape[0]

    def one(i):
        p = prep_sample(
            batch["pc0"][i], batch["pc1"][i],
            batch["pc0_mask"][i], batch["pc1_mask"][i],
            batch["pose0"][i], batch["pose1"][i],
            voxel_size, point_cloud_range,
            ego_motion=(batch["ego_motion"][i]
                        if "ego_motion" in batch else None),
        )
        if sort:
            from deflow_tpu.utils.native import permute_rows

            for keys, o in ((_PC0_ALIGNED, p["pc0_order"]),
                            (_PC1_ALIGNED, p["pc1_order"])):
                for k in keys:
                    if k in batch:
                        batch[k][i] = permute_rows(batch[k][i], o)
            p["pc0_transformed"] = permute_rows(
                p["pc0_transformed"], p["pc0_order"])
            for tag in ("pc0", "pc1"):
                p[f"{tag}_ids"] = p[f"{tag}_sorted"]
                p[f"{tag}_unsort"] = p.pop(f"{tag}_iperm")
                del p[f"{tag}_order"]
        if "dufo_label1" in batch:
            # SSL: pre-sort pc1 for the chamfer cell sweep (from the FINAL
            # device row order — post-permute when sort=True)
            cp = chamfer_cell_prep(
                batch["pc1"][i], batch["pc1_mask"][i],
                batch["pc1_mask"][i] & (batch["dufo_label1"][i] > 0))
            p["pc1_cell_lanes"] = cp["lanes"]
            p["pc1_cell_sid"] = cp["sid"]
            p["pc1_cell_start"] = cp["start"]
        return p

    if num_workers and num_workers > 1 and b > 1:
        from deflow_tpu.utils.native import shared_pool

        per = list(shared_pool(int(num_workers)).map(one, range(b)))
    else:
        per = [one(i) for i in range(b)]

    if sort:
        batch["pc0_unsort"] = np.stack([p["pc0_unsort"] for p in per])
        batch["pc1_unsort"] = np.stack([p["pc1_unsort"] for p in per])
    for k in HOST_PREP_KEYS + CHAMFER_CELL_KEYS:
        if k in per[0]:
            batch[k] = np.stack([p[k] for p in per])
    return batch


def host_prep_from_batch(batch) -> "dict | None":
    """Extract the model's ``host_prep`` kwarg from a (device) batch dict."""
    if "pc0_ids" not in batch:
        return None
    return {k: batch[k] for k in HOST_PREP_KEYS if k in batch}
