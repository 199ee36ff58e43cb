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
    # sorted per-point record: [points | center-offsets] in ascending-id
    # order.  Point coordinates carry no gradient, so shipping them sorted
    # removes every device-side permute from the embedder.
    "pc0_sorted_rec", "pc1_sorted_rec",
)


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
        # sorted [points | offsets] record (offsets = p − pillar center; the
        # z bin only shapes this continuous feature, ids are z-free)
        valid = sid < grid[0] * grid[1]
        pts_s = np.ascontiguousarray(pts[:, :3], np.float32)[order]
        cx = (sid % grid[0]).astype(np.float32)
        cy = (sid // grid[0]).astype(np.float32)
        cz = np.clip(np.floor((pts_s[:, 2] - lo[2]) / vs[2]), 0, grid[2] - 1)
        center = np.stack([(cx + 0.5) * vs[0] + lo[0],
                           (cy + 0.5) * vs[1] + lo[1],
                           (cz + 0.5) * vs[2] + lo[2]], axis=-1)
        off_s = np.where(valid[:, None], pts_s - center, 0.0)
        pts_s = np.where(valid[:, None], pts_s, 0.0)
        out[f"{tag}_sorted_rec"] = np.concatenate(
            [pts_s, off_s], axis=-1).astype(np.float32)
    return out


def attach_host_prep(
    batch: Dict[str, np.ndarray],
    voxel_size: Sequence[float],
    point_cloud_range: Sequence[float],
) -> Dict[str, np.ndarray]:
    """Augment a collated batch in place with host-prep arrays."""
    b = batch["pc0"].shape[0]
    per = [
        prep_sample(
            batch["pc0"][i], batch["pc1"][i],
            batch["pc0_mask"][i], batch["pc1_mask"][i],
            batch["pose0"][i], batch["pose1"][i],
            voxel_size, point_cloud_range,
            ego_motion=(batch["ego_motion"][i]
                        if "ego_motion" in batch else None),
        )
        for i in range(b)
    ]
    for k in HOST_PREP_KEYS:
        batch[k] = np.stack([p[k] for p in per])
    return batch


def host_prep_from_batch(batch) -> "dict | None":
    """Extract the model's ``host_prep`` kwarg from a (device) batch dict."""
    if "pc0_ids" not in batch:
        return None
    return {k: batch[k] for k in HOST_PREP_KEYS if k in batch}
