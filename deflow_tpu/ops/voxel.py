"""Dynamic pillar voxelization as static-shaped segment reductions.

The reference backs its ``DynamicEmbedder`` with mmcv's CUDA dynamic
voxelization + ``DynamicScatter`` ops (reference README.md:38, deflow.py:16):
points are binned into (z, y, x) pillar coordinates, out-of-range points are
dropped (hence ``pc0_valid_point_idxes``), per-point features are averaged per
pillar, and pillar features are scattered into a C x Y x X pseudoimage whose
(y, x) indices the decoder heads later gather from (reference
decoder.py:32-37).

TPU-first redesign: no ragged tensors, no compaction.  Every point keeps its
slot in a fixed-size ``[N, ...]`` buffer with a validity mask; out-of-range and
padding points are routed to a trash pillar (index ``num_pillars``) so every
op is a fixed-shape ``segment_sum``/gather that XLA can fuse and tile.  The
reference's per-sample Python loops (deflow.py:60) become ``vmap``.

Semantics matched to mmcv dynamic voxelization:
- pillar coordinate = floor((p - range_min) / voxel_size), valid iff
  0 <= coord < grid_size on all three axes (boundary points at range_max drop);
- cluster offset = point - mean of points in its pillar;
- center offset = point - geometric pillar center.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


# Rows reserved past ``num_pillars`` for the trash/padding segment.  The
# trash ID itself is always ``num_pillars``; reserving 8 rows (one f32
# sublane tile) instead of 1 keeps every per-sample pillar-table block
# 8-row aligned, so XLA's [B·(P+pad), C] ⇄ [B, P+pad, C] reshapes are free
# bitcasts instead of ~1 ms physical copies (measured on v5e).
TRASH_PAD = 8


@dataclass(frozen=True)
class VoxelConfig:
    """Static voxel-grid geometry (hashable -> usable as a jit static arg)."""

    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 6.0)
    point_cloud_range: Tuple[float, float, float, float, float, float] = (
        -51.2, -51.2, -3.0, 51.2, 51.2, 3.0,
    )

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        """(W_x, H_y, D_z) derived from range / voxel size.

        Derived rather than taken on faith from ``grid_feature_size`` so the
        reference's voxel-size ablations (1_train.sh:74 ``voxel_size=[0.1,..]``)
        stay geometrically consistent.
        """
        lo = self.point_cloud_range[:3]
        hi = self.point_cloud_range[3:]
        return tuple(
            int(round((h - l) / v)) for l, h, v in zip(lo, hi, self.voxel_size)
        )

    @property
    def num_pillars(self) -> int:
        w, h, _ = self.grid_size
        return w * h

    @property
    def pseudoimage_hw(self) -> Tuple[int, int]:
        w, h, _ = self.grid_size
        return (h, w)

    @property
    def use_s2d(self) -> bool:
        """Space-to-depth pillar-id order (the default on even grids).

        Pillar id of cell (y, x) = ((y>>1)·(W/2) + (x>>1))·4 + (y&1)·2+(x&1):
        the flat [num_pillars, C] pillar table then reshapes to the
        2x2-phase-folded pseudoimage [H/2, W/2, 4C] as a pure bitcast — no
        512² tensor or relayout ever exists on the device (the whole UNet
        stem/tail runs phase-folded).  Odd grids fall back to row-major.
        """
        w, h, _ = self.grid_size
        return w % 2 == 0 and h % 2 == 0

    @property
    def image_shape(self) -> Tuple[int, int, int]:
        """Pseudoimage shape per sample for C feature channels = (ih, iw, m)
        where the image is [ih, iw, m*C]."""
        h, w = self.pseudoimage_hw
        if self.use_s2d:
            return (h // 2, w // 2, 4)
        return (h, w, 1)


def encode_pillar_id(cy: jnp.ndarray, cx: jnp.ndarray, cfg: VoxelConfig):
    """Cell coords → pillar id under the config's id order."""
    w, h, _ = cfg.grid_size
    if cfg.use_s2d:
        cell = (cy // 2) * (w // 2) + cx // 2
        return cell * 4 + (cy % 2) * 2 + (cx % 2)
    return cy * w + cx


def decode_pillar_id(pid: jnp.ndarray, cfg: VoxelConfig):
    """Pillar id → (cy, cx) under the config's id order."""
    w, h, _ = cfg.grid_size
    if cfg.use_s2d:
        ph = pid % 4
        cell = pid // 4
        cy = (cell // (w // 2)) * 2 + ph // 2
        cx = (cell % (w // 2)) * 2 + ph % 2
        return cy, cx
    return pid // w, pid % w


class PillarInfo(NamedTuple):
    """Per-point pillar assignment for one sample (all arrays length N).

    The static-shape analog of the reference's per-sample ``voxel_info`` dict
    {points, point_idxes, point_offsets, voxel_coords} (deflow.py:97-101,
    decoder.py:65-66): positional masks replace compacted index lists.
    """

    pillar_id: jnp.ndarray     # [N] int32 in [0, num_pillars]; num_pillars = trash
    valid: jnp.ndarray         # [N] bool: in range AND not padding
    coords_yx: jnp.ndarray     # [N, 2] int32 (y, x); zeros where invalid
    offsets: jnp.ndarray       # [N, 3] f32 point - pillar center ("point_offsets")
    points: jnp.ndarray        # [N, 3] f32 input points, zeroed where invalid


def compute_pillar_info(
    points: jnp.ndarray, mask: jnp.ndarray, cfg: VoxelConfig
) -> PillarInfo:
    """Bin points ([N, 3]) into pillars; mask ([N] bool) marks real points."""
    w, h, d = cfg.grid_size
    vsz = jnp.asarray(cfg.voxel_size, dtype=points.dtype)
    lo = jnp.asarray(cfg.point_cloud_range[:3], dtype=points.dtype)

    safe_points = jnp.where(mask[:, None], points, 0.0)
    # The barrier stops XLA from constant-folding the divide into a
    # reciprocal multiply, which flips floor() at exact bin boundaries
    # (e.g. 79.2/0.8: true division 98.99999 -> bin 98, 79.2*1.25 = 99.0 ->
    # bin 99).  The reference CUDA voxelizer uses true IEEE f32 division;
    # binning must match it point-for-point.
    rel = (safe_points - lo) / jax.lax.optimization_barrier(vsz)
    coords = jnp.floor(rel).astype(jnp.int32)  # [N, 3] (x, y, z)
    in_range = (
        mask
        & (coords[:, 0] >= 0) & (coords[:, 0] < w)
        & (coords[:, 1] >= 0) & (coords[:, 1] < h)
        & (coords[:, 2] >= 0) & (coords[:, 2] < d)
        & jnp.all(jnp.isfinite(points), axis=-1)
    )

    cx = jnp.clip(coords[:, 0], 0, w - 1)
    cy = jnp.clip(coords[:, 1], 0, h - 1)
    cz = jnp.clip(coords[:, 2], 0, d - 1)
    pillar_id = jnp.where(in_range, encode_pillar_id(cy, cx, cfg),
                          cfg.num_pillars).astype(jnp.int32)

    center = (jnp.stack([cx, cy, cz], axis=-1).astype(points.dtype) + 0.5) * vsz + lo
    offsets = jnp.where(in_range[:, None], safe_points - center, 0.0)

    coords_yx = jnp.where(
        in_range[:, None], jnp.stack([cy, cx], axis=-1), 0
    ).astype(jnp.int32)
    clean_points = jnp.where(in_range[:, None], safe_points, 0.0)
    return PillarInfo(pillar_id, in_range, coords_yx, offsets, clean_points)


def pillar_info_from_ids(
    points: jnp.ndarray, mask: jnp.ndarray, ids: jnp.ndarray, cfg: VoxelConfig
) -> PillarInfo:
    """Rebuild PillarInfo from HOST-computed pillar ids (utils/native.py
    pillar_prep) — the ids are the single source of truth, so no device
    binning (and no host/device float-division agreement requirement).

    The z-bin used only for the continuous center-offset feature is recomputed
    from z on device (pillar ids are z-free; any last-ulp discrepancy moves a
    feature by ≤ one voxel of center, never a pillar assignment).
    """
    w, h, d = cfg.grid_size
    vsz = jnp.asarray(cfg.voxel_size, dtype=points.dtype)
    lo = jnp.asarray(cfg.point_cloud_range[:3], dtype=points.dtype)

    valid = mask & (ids < cfg.num_pillars)
    safe_ids = jnp.where(valid, ids, 0)
    cy, cx = decode_pillar_id(safe_ids, cfg)
    safe_points = jnp.where(valid[:, None], points, 0.0)
    cz = jnp.clip(
        jnp.floor((safe_points[:, 2] - lo[2])
                  / jax.lax.optimization_barrier(vsz[2])).astype(jnp.int32),
        0, d - 1)
    center = (jnp.stack([cx, cy, cz], axis=-1).astype(points.dtype) + 0.5) * vsz + lo
    offsets = jnp.where(valid[:, None], safe_points - center, 0.0)
    coords_yx = jnp.where(
        valid[:, None], jnp.stack([cy, cx], axis=-1), 0).astype(jnp.int32)
    pillar_id = jnp.where(valid, ids, cfg.num_pillars).astype(jnp.int32)
    return PillarInfo(pillar_id, valid, coords_yx, offsets, safe_points)


def make_presorted_plan(sorted_id: jnp.ndarray, num_segments: int):
    """Plan for features that arrive ALREADY ascending-id sorted (the host
    record path): order=None disables the device permute; pid doubles as the
    sorted flat ids for the backward gather.

    Trash points (per-sample id == num_segments - TRASH_PAD) are routed to
    the beyond-table sentinel so NO scatter tile ever accumulates them —
    ~45k masked one-hot MACs per AV2 sample otherwise land in a row that is
    sliced away (consumers mask by ``valid``, so reads never see them)."""
    if not _use_pallas():
        return None
    from deflow_tpu.ops.pallas_scatter import CHUNK, TILE_P, ScatterPlan, _round_up

    b, n = sorted_id.shape
    trash = num_segments - TRASH_PAD
    boff = (jnp.arange(b, dtype=jnp.int32) * num_segments)[:, None]
    sentinel = _round_up(b * num_segments, TILE_P) + 1
    flat_sorted = jnp.where(sorted_id < trash, sorted_id + boff,
                            sentinel).reshape(b * n)
    n_pad = _round_up(b * n, CHUNK)
    padded = jnp.pad(flat_sorted, (0, n_pad - b * n), constant_values=sentinel)
    return ScatterPlan(flat_sorted, None, padded.astype(jnp.int32))


def make_host_scatter_plan(order: jnp.ndarray, sorted_id: jnp.ndarray,
                           pillar_id: jnp.ndarray, num_segments: int):
    """Build a ScatterPlan from HOST-computed per-sample sort state
    ([B, N] arrays from utils/native.pillar_prep) — no device argsort.

    Per-sample sorts concatenate into the flat block-offset sort because the
    flat ids ``pid + b*num_segments`` are block-ordered by construction."""
    if not _use_pallas():
        return None
    from deflow_tpu.ops.pallas_scatter import CHUNK, TILE_P, ScatterPlan, _round_up

    b, n = order.shape
    trash = num_segments - TRASH_PAD
    boff_n = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    boff_s = (jnp.arange(b, dtype=jnp.int32) * num_segments)[:, None]
    sentinel = _round_up(b * num_segments, TILE_P) + 1
    flat_order = (order + boff_n).reshape(b * n)
    # trash → beyond-table sentinel: never accumulated (see make_presorted_plan)
    flat_sorted = jnp.where(sorted_id < trash, sorted_id + boff_s,
                            sentinel).reshape(b * n)
    flat_pid = jnp.where(pillar_id < trash, pillar_id + boff_s,
                         sentinel).reshape(b * n)
    n_pad = _round_up(b * n, CHUNK)
    flat_sorted = jnp.pad(flat_sorted, (0, n_pad - b * n),
                          constant_values=sentinel)
    return ScatterPlan(flat_pid, flat_order, flat_sorted.astype(jnp.int32))


def _use_pallas() -> bool:
    """Pallas scatter on TPU unless DEFLOW_PALLAS=0 (XLA fallback elsewhere)."""
    import os

    if os.environ.get("DEFLOW_PALLAS", "1") == "0":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _segment_sum(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Segment sum over the trash-extended pillar range.

    On TPU with large segment counts this dispatches to the Pallas
    sorted-scatter kernel (ops/pallas_scatter.py) — XLA's scatter-add lowers
    ~1000x off the bandwidth bound there.  Same contract and gradients.
    """
    if num_segments >= 8192 and data.ndim == 2 and _use_pallas():
        from deflow_tpu.ops.pallas_scatter import pillar_sum_scatter_pallas

        return pillar_sum_scatter_pallas(data, segment_ids, num_segments)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def make_batched_scatter_plan(segment_ids: jnp.ndarray, num_segments: int):
    """One reusable sort over the flattened batch ids (None off the TPU path).

    The embedder scatters twice per cloud over the same ids; the argsort
    dominates the op, so it is computed once and passed to both calls."""
    if not (_use_pallas() and segment_ids.shape[0] * num_segments >= 8192):
        return None
    from deflow_tpu.ops.pallas_scatter import make_scatter_plan

    b, n = segment_ids.shape
    offsets = (jnp.arange(b, dtype=segment_ids.dtype) * num_segments)[:, None]
    return make_scatter_plan((segment_ids + offsets).reshape(b * n),
                             b * num_segments)


def segment_sum_batched(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int, plan=None
) -> jnp.ndarray:
    """[B, N, C] × [B, N] → [B, num_segments, C] without vmapping the scatter.

    The batch is flattened into one segment-sum over B·num_segments segments
    (ids offset per sample) — one sort + one kernel launch instead of B, and
    the Pallas path keeps full control of its sequential grid."""
    b, n, c = data.shape
    if plan is not None:
        from deflow_tpu.ops.pallas_scatter import pillar_sum_scatter_pallas

        flat = pillar_sum_scatter_pallas(
            data.reshape(b * n, c), plan.pid, b * num_segments, plan=plan)
    else:
        offsets = (jnp.arange(b, dtype=segment_ids.dtype) * num_segments)[:, None]
        flat = _segment_sum(
            data.reshape(b * n, c),
            (segment_ids + offsets).reshape(b * n),
            b * num_segments,
        )
    return flat.reshape(b, num_segments, c)


def pillar_centroids(
    info: PillarInfo, cfg: VoxelConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pillar point count and centroid, gathered back per point.

    Returns ``(counts [N], cluster_offsets [N, 3])`` where cluster_offsets =
    point - centroid(points in same pillar) — the ``f_cluster`` feature of the
    pillar feature net.  One fused segment pass over [x, y, z, 1].
    """
    n = info.points.shape[0]
    ones = info.valid.astype(info.points.dtype)
    data = jnp.concatenate([info.points, ones[:, None]], axis=-1)  # [N, 4]
    sums = _segment_sum(data, info.pillar_id, cfg.num_pillars + TRASH_PAD)  # [P+1, 4]
    counts = sums[:, 3]
    centroid = sums[:, :3] / jax.lax.stop_gradient(
        jnp.maximum(counts, 1.0))[:, None]  # count cotangent dead at bool cast
    per_point_centroid = centroid[info.pillar_id]
    cluster = jnp.where(info.valid[:, None], info.points - per_point_centroid, 0.0)
    per_point_count = counts[info.pillar_id]
    return per_point_count, cluster


def _table_to_image(pillar_feats: jnp.ndarray, cfg: VoxelConfig) -> jnp.ndarray:
    """Flat id-ordered [num_pillars, C] table → pseudoimage.

    s2d id order: a pure reshape to the phase-folded [H/2, W/2, 4C] image
    (rows are cell-major, phase-minor by construction) — no 512² tensor or
    transpose ever materializes.  Row-major order: classic [H, W, C]."""
    ih, iw, m = cfg.image_shape
    c = pillar_feats.shape[-1]
    return pillar_feats.reshape(
        pillar_feats.shape[:-2] + (ih, iw, m * c))


def image_to_table(image: jnp.ndarray, cfg: VoxelConfig) -> jnp.ndarray:
    """Pseudoimage (s2d or row-major per cfg) → flat id-ordered [..., P, C]
    pillar table — the inverse of :func:`_table_to_image`, also reshape-only."""
    ih, iw, m = cfg.image_shape
    c = image.shape[-1] // m
    return image.reshape(image.shape[:-3] + (ih * iw * m, c))


def pillar_mean_scatter(
    feats: jnp.ndarray, info: PillarInfo, cfg: VoxelConfig
) -> jnp.ndarray:
    """Average per-point features into the pseudoimage (``cfg.image_shape``
    layout — phase-folded [H/2, W/2, 4C] on even grids).

    The TPU equivalent of mmcv ``DynamicScatter(mode='avg')`` +
    ``PointPillarsScatter`` (SURVEY.md §2.3 native component #1).  Empty
    pillars are exact zeros, matching the scatter-into-zeros semantics.
    """
    c = feats.shape[-1]
    feats = jnp.where(info.valid[:, None], feats, 0.0)
    ones = info.valid.astype(feats.dtype)
    data = jnp.concatenate([feats, ones[:, None]], axis=-1)
    sums = _segment_sum(data, info.pillar_id, cfg.num_pillars + TRASH_PAD)
    pillar_feats = sums[: cfg.num_pillars, :c] / jax.lax.stop_gradient(
        jnp.maximum(sums[: cfg.num_pillars, c:], 1.0))
    return _table_to_image(pillar_feats, cfg)


def _row_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched row gather [B, P, C] × [B, N] → [B, N, C].

    vmapped ``table[idx]`` lowers to an XLA gather with (1, C) slices;
    ``take_along_axis`` with broadcast indices lowers to a per-ELEMENT gather
    that measured 1.6 s for [4, 262k, 128] on v5e — never use it here."""
    return jax.vmap(lambda t, i: t[i])(table, idx)


def pillar_centroids_batched(
    info: PillarInfo, cfg: VoxelConfig, plan=None, compute_dtype=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched ``pillar_centroids`` ([B, N, ...] PillarInfo) via one flat
    segment pass — no vmap around the scatter.

    Works in pillar-CENTERED coordinates: ``cluster = p − centroid =
    offsets − mean(offsets)`` exactly, and offsets are bounded by half a
    voxel, so in bf16 compute mode the scatter runs natively in bf16
    (sub-mm absolute error) instead of the 6-pass f32 path."""
    dtype = compute_dtype or info.points.dtype
    off = info.offsets.astype(dtype)
    ones = info.valid.astype(dtype)
    data = jnp.concatenate([off, ones[..., None]], axis=-1)  # [B,N,4]
    sums = segment_sum_batched(data, info.pillar_id, cfg.num_pillars + TRASH_PAD, plan)
    counts = sums[..., 3].astype(jnp.float32)
    mean_off = (sums[..., :3].astype(jnp.float32)
                / jax.lax.stop_gradient(jnp.maximum(counts, 1.0))[..., None])
    per_point = _row_gather(
        jnp.concatenate([mean_off, counts[..., None]], axis=-1), info.pillar_id)
    cluster = jnp.where(
        info.valid[..., None],
        info.offsets.astype(jnp.float32) - per_point[..., :3], 0.0)
    return per_point[..., 3], cluster


def pillar_mean_scatter_batched(
    feats: jnp.ndarray, info: PillarInfo, cfg: VoxelConfig, plan=None
) -> jnp.ndarray:
    """Batched ``pillar_mean_scatter``: [B, N, C] → pseudoimage batch."""
    b, _, c = feats.shape
    feats = jnp.where(info.valid[..., None], feats, 0.0)
    ones = info.valid.astype(feats.dtype)
    data = jnp.concatenate([feats, ones[..., None]], axis=-1)
    sums = segment_sum_batched(data, info.pillar_id, cfg.num_pillars + TRASH_PAD, plan)
    pillar_feats = sums[:, : cfg.num_pillars, :c] / jax.lax.stop_gradient(
        jnp.maximum(sums[:, : cfg.num_pillars, c:], 1.0))
    return _table_to_image(pillar_feats, cfg)


def pillar_max_scatter(
    feats: jnp.ndarray, info: PillarInfo, cfg: VoxelConfig
) -> jnp.ndarray:
    """Max-reduce per-point features into the pseudoimage (cfg layout).

    The ``DynamicScatter(mode='max')`` variant.  Empty pillars are exact zeros
    (matching scatter-into-zero-canvas semantics); gradients flow to the
    argmax point per pillar (``segment_max``'s subgradient), matching
    torch_scatter/mmcv behavior.
    """
    neg = jnp.asarray(-3.0e38, feats.dtype)
    masked = jnp.where(info.valid[:, None], feats, neg)
    maxed = jax.ops.segment_max(
        masked, info.pillar_id, num_segments=cfg.num_pillars + TRASH_PAD
    )[: cfg.num_pillars]
    counts = _segment_sum(
        info.valid.astype(feats.dtype), info.pillar_id, cfg.num_pillars + TRASH_PAD
    )[: cfg.num_pillars]
    maxed = jnp.where(counts[:, None] > 0, maxed, 0.0)
    return _table_to_image(maxed, cfg)


def pseudoimage_gather(
    table: jnp.ndarray, pillar_id: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Gather per-point features from a flat id-ordered [P, C] pillar table
    ("unpillar").

    The static-shape form of the reference's advanced indexing
    ``pseudoimage[:, vc[:, 1], vc[:, 2]].T`` (decoder.py:34-37); invalid slots
    read as zeros.  Pass an image through :func:`image_to_table` first.
    """
    p = table.shape[0]
    out = table[jnp.clip(pillar_id, 0, p - 1)]
    return jnp.where(valid[:, None], out, 0.0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def voxelize_batch(points: jnp.ndarray, mask: jnp.ndarray, cfg: VoxelConfig):
    """Convenience: vmapped pillar info for a [B, N, 3] batch."""
    return jax.vmap(lambda p, m: compute_pillar_info(p, m, cfg))(points, mask)


def _float0_like(x):
    import numpy as _np

    return _np.zeros(x.shape, dtype=jax.dtypes.float0)


@jax.custom_vjp
def _gather_planned(image_flat, pillar_id, valid, plan):
    """Row gather whose VJP scatters through the Pallas kernel.

    XLA lowers the gather's natural backward (scatter-add of per-point
    cotangents into the pseudoimage) as badly as the forward voxelizer
    scatter; with the embedder's ScatterPlan already in hand, the backward
    reuses the sorted-scatter kernel for free.

    On the fully presorted path (``plan.order is None`` — host shipped the
    batch in ascending-id order) the FORWARD also leaves XLA: its row gather
    costs a fixed ~15 ns/row on v5e (descriptor-bound, ~6 ms at 393k rows);
    the sorted-sweep Pallas kernel (ops/pallas_gather.py) streams the pillar
    table once instead.
    """
    b, p, c = image_flat.shape
    if plan is not None and plan.order is None and _use_pallas():
        from deflow_tpu.ops.pallas_gather import sorted_rows_gather_pallas

        boff = (jnp.arange(b, dtype=jnp.int32) * p)[:, None]
        # Both PillarInfo producers guarantee pillar_id < num_pillars iff
        # valid, but fold `valid` into the sentinel anyway so a future
        # producer breaking that invariant can't silently read stale rows.
        flat_ids = jnp.where(valid & (pillar_id < p), pillar_id + boff,
                             jnp.int32(2**30)).reshape(b * pillar_id.shape[1])
        out = sorted_rows_gather_pallas(
            image_flat.reshape(b * p, c), flat_ids, b * p)
        return out.reshape(b, pillar_id.shape[1], c)
    idx = jnp.clip(pillar_id, 0, image_flat.shape[1] - 1)
    out = _row_gather(image_flat, idx)
    return jnp.where(valid[..., None], out, 0.0)


def _gather_planned_fwd(image_flat, pillar_id, valid, plan):
    out = _gather_planned(image_flat, pillar_id, valid, plan)
    return out, (pillar_id, valid, plan, image_flat.shape)


def _gather_planned_bwd(res, g):
    pillar_id, valid, plan, shape = res
    b, p, c = shape
    g = jnp.where(valid[..., None], g, 0.0)
    # route padding/invalid slots to the trash row p (discarded below)
    pid = jnp.where(valid, pillar_id, p)
    d_flat = segment_sum_batched(g, pid, p + TRASH_PAD, plan)[:, :p].astype(g.dtype)
    return (d_flat, _float0_like(pillar_id), _float0_like(valid),
            jax.tree.map(_float0_like, plan))


_gather_planned.defvjp(_gather_planned_fwd, _gather_planned_bwd)


def pseudoimage_gather_batched(
    table: jnp.ndarray, info: PillarInfo, plan=None
) -> jnp.ndarray:
    """Batched unpillar gather from flat pillar tables [B, P, C] → [B, N, C].

    With ``plan`` (the embedder's ScatterPlan over ``num_pillars + TRASH_PAD``
    segments) the backward scatter runs through the Pallas kernel; without it
    the plain XLA VJP applies.
    """
    if plan is None:
        return jax.vmap(pseudoimage_gather)(table, info.pillar_id, info.valid)
    return _gather_planned(table, info.pillar_id, info.valid, plan)
