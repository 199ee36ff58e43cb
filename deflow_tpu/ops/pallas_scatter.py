"""Pallas TPU kernel: pillar segment-sum scatter (native component #1).

The TPU replacement for mmcv's ``DynamicScatter`` CUDA op (SURVEY.md §2.3):
XLA lowers ``jax.ops.segment_sum`` of ~131k points into 262k pillars as a
serialized scatter (~80 ms/batch measured on v5e — orders of magnitude off
the bandwidth bound).  This kernel reformulates it TPU-natively:

1. points are sorted by pillar id (XLA sort, outside the kernel); the id is
   packed as an extra float32 lane column of the feature slab (exact for ids
   < 2^24 — a 262k-pillar grid is far below that), so every chunk needs ONE
   lane-aligned DMA;
2. the kernel grids over *output* pillar tiles (TILE_P contiguous pillar
   rows); a scalar-prefetched ``starts`` array (searchsorted of tile
   boundaries into the sorted ids) gives each tile its span in the sorted
   point buffer;
3. each tile streams the CHUNK-aligned slabs covering its span from HBM and
   accumulates ``one_hot(id − tile_base).T @ feats`` — an MXU matmul — into
   a VMEM accumulator, then writes its [TILE_P, C] tile exactly once.  The
   successor tile's first slab is prefetched double-buffered while the
   current tile computes, hiding the (dominant) DMA latency.

No scatter instruction exists anywhere; every output row is written once.
The backward pass of segment-sum w.r.t. features is a plain gather, so the
custom VJP stays in XLA.

Precision: f32 inputs use a HIGHEST-precision dot — the MXU's default path
rounds f32 operands to bf16 (measured 2e-2 absolute error on unit-scale
sums, far outside the parity budget).  bf16 inputs run the native MXU pass
(one-hot × bf16 products are exact, f32 accumulation in VMEM) and write
bf16 back to HBM — one 2^-9 rounding, half the slab traffic.

Semantics contract (tested against ``jax.ops.segment_sum``): ids outside
[0, num_pillars) (the trash/padding sentinel = num_pillars) contribute
nothing; empty pillars are exact zeros.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# output pillar rows per grid step.  Swept with the r2 one-hot (7 VPU
# passes/block): 1024 > 512 > 2048; the r5 lean one-hot (2 passes) scales
# its per-block cost with TILE_P much more gently, so the knob is exposed
# for re-sweeps (kernel cost is ~grid-step-count bound at 393k rows).
TILE_P = int(_os.environ.get("DEFLOW_SCATTER_TILE_P", 1024))
CHUNK = 256      # sorted points DMAd per inner iteration (swept: 256 > 512 > 128)
LANE = 128       # feature padding (TPU lane width); id shares the slab


def _make_kernel(id_lane, bf16_ids):
  def _scatter_kernel(starts_ref, packed_hbm, out_ref, fbuf, sems, slot_ref):
    k = pl.program_id(0)
    num_tiles = pl.num_programs(0)
    start = starts_ref[k]
    end = starts_ref[k + 1]
    first = start // CHUNK
    nchunks = jnp.where(end > start, (end - 1) // CHUNK - first + 1, 0)
    c_pad = out_ref.shape[1]

    def dma(s, chunk_idx):
        return pltpu.make_async_copy(
            packed_hbm.at[pl.ds(chunk_idx * CHUNK, CHUNK), :],
            fbuf.at[s], sems.at[s])

    # slot_ref carries which buffer holds THIS tile's first chunk (started
    # by the predecessor's prefetch, or right here for tile 0)
    @pl.when(k == 0)
    def _():
        slot_ref[0] = 0

        @pl.when(nchunks > 0)
        def _():
            dma(0, first).start()

    s0 = slot_ref[0]
    # successor's first chunk lands in the slot after this tile's last chunk
    # (3-slot rotation: for spans of ≤2 chunks — the common case — that slot
    # is free NOW, so the cross-tile prefetch overlaps this tile's compute)
    s_succ = jax.lax.rem(s0 + nchunks, 3)
    nstart = starts_ref[jnp.minimum(k + 1, num_tiles)]
    nend = starts_ref[jnp.minimum(k + 2, num_tiles)]
    do_prefetch = (k + 1 < num_tiles) & (nend > nstart)

    @pl.when(do_prefetch & (nchunks <= 2))
    def _():
        dma(s_succ, nstart // CHUNK).start()

    tile_base = k * TILE_P
    cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_P), 1)

    def point_ids(s):
        if not bf16_ids:
            return fbuf[s, :, id_lane].astype(jnp.int32)
        # bf16 can only hold ints ≤ 256 exactly; the id rides as three
        # base-128 digit lanes (each exact), recomposed here on the VPU.
        a = fbuf[s, :, id_lane].astype(jnp.int32)
        b = fbuf[s, :, id_lane + 1].astype(jnp.int32)
        c = fbuf[s, :, id_lane + 2].astype(jnp.int32)
        return (a * 16384 + b * 128 + c)

    def contrib(chunk_idx, s):
        del chunk_idx
        local = point_ids(s) - tile_base
        # NO span/row-range test: ids are sorted, so a DMA'd row whose id
        # falls in [tile_base, tile_base + TILE_P) IS in this tile's span by
        # construction; slab padding rows carry the sentinel id (f32 lane
        # and bf16 digits both built from the sentinel-padded sorted_pid)
        # and zero features, so they can never contribute.  The old
        # (gpos >= start) & (gpos < end) guard cost 4-5 extra full-width
        # VPU passes per [CHUNK, TILE_P] block.  Measured NEUTRAL in-step
        # on v5e (ssl 29.21 vs 29.15, supervised 37.64 vs 37.6) — the
        # kernel is grid-step/DMA-latency bound, not one-hot bound — but
        # kept: fewer passes shift the TILE_P tradeoff toward fewer, wider
        # tiles (DEFLOW_SCATTER_TILE_P is the A/B knob).
        onehot = (cols == local[:, None]).astype(fbuf.dtype)
        # bf16 inputs: one native MXU pass is exact (one-hot x bf16 products,
        # f32 accumulate).  f32 inputs: HIGHEST, since the default pass
        # rounds operands to bf16 (2e-2 abs err measured).
        return jax.lax.dot_general(
            onehot, fbuf[s, :, :c_pad],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.DEFAULT if bf16_ids
                       else jax.lax.Precision.HIGHEST),
        )  # [TILE_P, c_pad]

    def body(i, carry):
        acc, s = carry
        nxt = jax.lax.rem(s + 1, 3)

        # start the NEXT chunk's copy before computing this one (true
        # double buffering — start-then-wait would serialize the span)
        @pl.when(i + 1 < nchunks)
        def _():
            dma(nxt, first + i + 1).start()

        dma(s, first + i).wait()
        return acc + contrib(first + i, s), nxt

    acc = jnp.zeros((TILE_P, c_pad), jnp.float32)
    acc, _ = jax.lax.fori_loop(0, nchunks, body, (acc, s0))

    # long spans (>2 chunks) could not prefetch upfront without colliding
    # with their own rotation — start the successor's copy now instead
    @pl.when(do_prefetch & (nchunks > 2))
    def _():
        dma(s_succ, nstart // CHUNK).start()

    slot_ref[0] = s_succ
    out_ref[:] = acc.astype(out_ref.dtype)

  return _scatter_kernel


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pack(sorted_feats, sorted_pid, n, n_pad, c, c_pad):
    """Sorted feats + id → one slab in the FEATURE dtype.

    f32 slab: the id rides one lane (exact to 2^24).  bf16 slab: bf16 holds
    ints ≤ 256 exactly, so the id is decomposed into three base-128 digit
    lanes.  Either way the id lands at lane ``c`` when the digits fit inside
    the same 128-lane block (the common case), else a separate LANE block.

    Built with ONE lane-concatenate: ``.at[:, lane].set`` lowers to a full
    [n_pad, 128] dynamic-update-slice pass PER LANE (~0.85 ms each at 524k
    rows on v5e — measured as ~8 ms of pure slab rewrites per step).  The
    bf16 digits are likewise ONE [n, 3] expression: three separate [n, 1]
    columns each tile-pad to 128 physical lanes (XLA materialized them as a
    3-output kLoop fusion = 3×100 MB of padded writes at 393k rows)."""
    dtype = sorted_feats.dtype
    bf16 = dtype == jnp.bfloat16
    id_width = 3 if bf16 else 1
    pid32 = sorted_pid.astype(jnp.int32)
    if bf16:
        # base-128 digits, most significant first; pid < 2^21 so the top
        # digit needs no % (ids are nonnegative: sentinel = segs-pad + 1).
        # Materialized TRANSPOSED [3, n] (dense rows, 2.4 MB): a [n, 3] bf16
        # intermediate tiles each 3-lane row group up to 128 physical lanes
        # — XLA CSE'd it across the three scatters as 3x100 MB of padded
        # writes (fusion.339, 6.0 ms/step measured on v5e) — and the slab
        # concat absorbs the three [n, 1] strided column reads instead.
        div = jnp.asarray([16384, 128, 1], jnp.int32)
        digits_t = ((pid32[None, :] // div[:, None]) % 128).astype(dtype)
        digits = [digits_t[k][:, None] for k in range(3)]
    else:
        digits = [pid32.astype(dtype)[:, None]]
    sf = jnp.pad(sorted_feats, ((0, n_pad - n), (0, 0)))
    parts = [sf] + digits
    if c + id_width <= c_pad and c_pad == LANE:
        tail = c_pad - c - id_width
        if tail:
            parts.append(jnp.zeros((n_pad, tail), dtype))
        return jnp.concatenate(parts, axis=1), c
    parts.insert(1, jnp.zeros((n_pad, c_pad - c), dtype))
    parts.append(jnp.zeros((n_pad, LANE - id_width), dtype))
    return jnp.concatenate(parts, axis=1), c_pad


@functools.partial(jax.jit, static_argnames=("num_pillars", "c_pad", "id_lane"))
def _sorted_scatter(packed: jnp.ndarray, sorted_pid: jnp.ndarray,
                    num_pillars: int, c_pad: int, id_lane: int) -> jnp.ndarray:
    """Pallas call on sorted input.

    ``packed``: [N_pad, slab] f32 — features in lanes [0, id_lane), the pillar
    id (as float) at lane ``id_lane``, zeros beyond.  For C ≤ 126 the id fits
    inside one 128-lane slab, halving DMA volume vs a separate id block.
    """
    p_pad = _round_up(num_pillars, TILE_P)
    num_tiles = p_pad // TILE_P

    tile_bounds = jnp.arange(0, p_pad + TILE_P, TILE_P, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_pid, tile_bounds).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],   # packed slab, HBM
        out_specs=pl.BlockSpec(
            (TILE_P, c_pad), lambda k, *_: (k, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, CHUNK, packed.shape[1]), packed.dtype),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SMEM((1,), jnp.int32),   # double-buffer slot carry
        ],
    )
    # Accumulation is always f32 in VMEM; bf16 inputs round once on the HBM
    # write (2^-9 relative — below the bf16 feature resolution downstream)
    # and HALVE the dominant cost: the [p_pad, 128] output write + re-read.
    out_dtype = (jnp.bfloat16 if packed.dtype == jnp.bfloat16 else jnp.float32)
    out = pl.pallas_call(
        _make_kernel(id_lane, packed.dtype == jnp.bfloat16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p_pad, c_pad), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(starts, packed)
    return out[:num_pillars]


# lane-scatter: output segments per grid step (lane dim).  Swept on v5e with
# the lean one-hot (compare+convert only): at 393k segments the kernel is
# grid-step-overhead-bound (1537 steps at TILE_S=256); DEFLOW_SCATTER_TILE_S
# is the A/B knob.
TILE_S = int(_os.environ.get("DEFLOW_SCATTER_TILE_S", 256))
CHUNK_S = 256  # lane-scatter: sorted payload rows per DMA


def _make_lane_kernel(id_plane: int):
  def _lane_kernel(starts_ref, slab_hbm, out_ref, buf, sems, slot_ref):
    """Dense-lane segment-sum over a coordinate-major payload slab.

    The generic pillar kernel pads payload lanes to the 128-lane tile, so a
    4-lane chamfer-VJP payload pays a [N, 128] HBM slab (402 MB at 786k
    rows) and a 128-lane one-hot matmul — 32x useless work (measured
    7.75 ms + 3.93 ms slab build per SSL step).  This variant keeps the
    payload as [8, CHUNK_S] coordinate-major planes (the sweep kernel's
    slab trick): the HBM footprint is 8 dense lanes, and the one-hot
    contraction runs at 8 OUTPUT SUBLANES ([8, C] x [T, C]^T -> [8, T]) —
    64x fewer MACs for the same answer."""
    k = pl.program_id(0)
    num_tiles = pl.num_programs(0)
    start = starts_ref[k]
    end = starts_ref[k + 1]
    first = start // CHUNK_S
    nchunks = jnp.where(end > start, (end - 1) // CHUNK_S - first + 1, 0)

    def dma(s, chunk_idx):
        return pltpu.make_async_copy(
            slab_hbm.at[chunk_idx], buf.at[s], sems.at[s])

    @pl.when(k == 0)
    def _():
        slot_ref[0] = 0

        @pl.when(nchunks > 0)
        def _():
            dma(0, first).start()

    s0 = slot_ref[0]
    s_succ = jax.lax.rem(s0 + nchunks, 3)
    nstart = starts_ref[jnp.minimum(k + 1, num_tiles)]
    nend = starts_ref[jnp.minimum(k + 2, num_tiles)]
    do_prefetch = (k + 1 < num_tiles) & (nend > nstart)

    @pl.when(do_prefetch & (nchunks <= 2))
    def _():
        dma(s_succ, nstart // CHUNK_S).start()

    tile_base = k * TILE_S
    # one-hot TRANSPOSED [TILE_S, CHUNK_S]: rows = output segments, columns
    # = payload rows; built by broadcast compare against the id plane (no
    # in-kernel transpose of the [1, CHUNK_S] id row needed)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_S, CHUNK_S), 0)

    def contrib(chunk_idx, s):
        del chunk_idx
        ids = buf[s, id_plane:id_plane + 1, :].astype(jnp.int32)  # [1, C]
        # no span test: sorted ids make tile-range membership ⟺ span
        # membership, and slab padding rows ride the sentinel id plane
        # (see the pillar kernel's contrib for the full argument)
        onehot_t = (cols == ids - tile_base).astype(jnp.float32)  # [T, C]
        # payload is f32; one-hot entries are bf16-exact but the payload is
        # not — HIGHEST avoids the default pass's operand rounding
        return jax.lax.dot_general(
            buf[s], onehot_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [8, TILE_S]

    def body(i, carry):
        acc, s = carry
        nxt = jax.lax.rem(s + 1, 3)

        @pl.when(i + 1 < nchunks)
        def _():
            dma(nxt, first + i + 1).start()

        dma(s, first + i).wait()
        return acc + contrib(first + i, s), nxt

    acc = jnp.zeros((8, TILE_S), jnp.float32)
    acc, _ = jax.lax.fori_loop(0, nchunks, body, (acc, s0))

    @pl.when(do_prefetch & (nchunks > 2))
    def _():
        dma(s_succ, nstart // CHUNK_S).start()

    slot_ref[0] = s_succ
    out_ref[:] = acc

  return _lane_kernel


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_sum_lanes_pallas(lanes, sorted_pid, num_segments: int):
    """Segment-sum of ≤7 dense payload lanes by SORTED segment id.

    Args:
        lanes: tuple of [N] f32 arrays, one per payload lane, already sorted
            by segment id (out-of-range ids — e.g. a sentinel — contribute
            nothing).
        sorted_pid: [N] i32 ascending segment ids.
        num_segments: output length.
    Returns:
        [len(lanes), num_segments] f32 lane-plane sums.

    The payload rides a [nchunks, 8, CHUNK_S] coordinate-major slab (dense
    minor dim — no 128-lane HBM padding) with the id as one plane (exact in
    f32 below 2^24); the kernel grids over TILE_S-segment output tiles with
    the 3-slot DMA rotation.  vs routing the same scatter through the
    128-lane pillar kernel: ~11.7 ms -> ~2 ms at 786k rows / 4 lanes
    (measured, SSL chamfer VJP)."""
    nlanes = len(lanes)
    assert nlanes <= 7, "8-lane slab holds ≤7 payload lanes + the id"
    n = sorted_pid.shape[0]
    n_pad = _round_up(n, CHUNK_S)
    nchunks = n_pad // CHUNK_S
    s_pad = _round_up(num_segments, TILE_S)
    num_tiles = s_pad // TILE_S

    planes = [jnp.pad(l.astype(jnp.float32), (0, n_pad - n)) for l in lanes]
    id_plane = nlanes
    planes.append(jnp.pad(sorted_pid.astype(jnp.float32), (0, n_pad - n),
                          constant_values=float(s_pad + 1)))
    planes += [jnp.zeros((n_pad,), jnp.float32)] * (8 - len(planes))
    slab = jnp.concatenate(
        [p.reshape(nchunks, 1, CHUNK_S) for p in planes], axis=1)

    pid_padded = jnp.pad(sorted_pid, (0, n_pad - n),
                         constant_values=s_pad + 1)
    tile_bounds = jnp.arange(0, s_pad + TILE_S, TILE_S, dtype=jnp.int32)
    starts = jnp.searchsorted(pid_padded, tile_bounds).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (8, TILE_S), lambda k, *_: (0, k), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, 8, CHUNK_S), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        _make_lane_kernel(id_plane),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, s_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(starts, slab)
    return out[:nlanes, :num_segments]


class ScatterPlan(NamedTuple):
    """Reusable sort state for repeated scatters over the same pillar ids.

    The embedder scatters twice per cloud (centroids, then features); the
    argsort is the single most expensive part of the op (~14 ms at 524k
    points on v5e), so it is computed once and shared.
    """

    pid: jnp.ndarray          # [N]      original ids
    order: jnp.ndarray        # [N]      ascending-id permutation
    sorted_pid: jnp.ndarray   # [N_pad]  int32, sentinel-padded


def make_scatter_plan(pid: jnp.ndarray, num_pillars: int) -> ScatterPlan:
    n = pid.shape[0]
    n_pad = _round_up(n, CHUNK)
    sentinel = _round_up(num_pillars, TILE_P) + 1
    order = jnp.argsort(pid)
    sorted_pid = jnp.pad(pid[order], (0, n_pad - n), constant_values=sentinel)
    return ScatterPlan(pid, order, sorted_pid.astype(jnp.int32))


def pillar_sum_scatter_pallas(
    feats: jnp.ndarray, pid: jnp.ndarray, num_pillars: int,
    plan: "ScatterPlan | None" = None,
) -> jnp.ndarray:
    """Segment-sum ``feats [N, C]`` by ``pid [N]`` into ``[num_pillars, C]``.

    Drop-in for ``jax.ops.segment_sum(..., num_segments=num_pillars)`` where
    out-of-range ids land in a trash row that is discarded.  Differentiable
    (gather backward).  Accepts a leading batch dim (explicit unrolled loop —
    the kernel's cross-grid-step pipelining assumes it owns the grid).
    Pass ``plan`` (from :func:`make_scatter_plan`) to amortize the sort over
    repeated scatters on the same ids.
    """
    if feats.ndim == 3:
        return jnp.stack([
            _pillar_sum_scatter(feats[b], pid[b], num_pillars)
            for b in range(feats.shape[0])
        ])
    if plan is None:
        return _pillar_sum_scatter(feats, pid, num_pillars)
    return _planned_scatter(feats, plan, num_pillars)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _planned_scatter(feats, plan, num_pillars):
    in_dtype = feats.dtype
    feats = feats if feats.dtype == jnp.bfloat16 else feats.astype(jnp.float32)
    n, c = feats.shape
    n_pad = plan.sorted_pid.shape[0]
    c_pad = _round_up(max(c, 1), LANE)
    # plan.order None => features are ALREADY ascending-id sorted (host
    # record path) — no device permute.  (Do NOT index with None: x[None]
    # silently expand-dims.)
    src = feats if plan.order is None else feats[plan.order]
    packed, id_lane = _pack(src, plan.sorted_pid, n, n_pad, c, c_pad)
    out = _sorted_scatter(packed, plan.sorted_pid, num_pillars, c_pad, id_lane)
    return out[:, :c].astype(in_dtype)


def _planned_fwd(feats, plan, num_pillars):
    # plan.order is None ⟺ pid is the ascending host-sorted flat id array —
    # the backward gather can then ride the sorted-sweep Pallas kernel
    return _planned_scatter(feats, plan, num_pillars), (
        plan.pid, plan.order is None, feats.dtype == jnp.bfloat16)


def _planned_bwd(num_pillars, res, g):
    pid, presorted, primal_bf16 = res
    # cotangent of a bf16 primal is bf16 — upstream sometimes hands f32
    # (SSL graph), which doubles the gather traffic (4.45 vs 2.6 ms at 393k
    # rows, measured); normalize before the kernel
    if primal_bf16:
        g = g.astype(jnp.bfloat16)
    if presorted:
        from deflow_tpu.ops.pallas_gather import sorted_rows_gather_pallas

        return sorted_rows_gather_pallas(g, pid, num_pillars), None
    safe = jnp.clip(pid, 0, num_pillars - 1)
    gf = g[safe]
    gf = jnp.where((pid >= 0)[:, None] & (pid < num_pillars)[:, None], gf, 0.0)
    return gf.astype(g.dtype), None


_planned_scatter.defvjp(_planned_fwd, _planned_bwd)


def _norm_dtype(feats):
    """Kernel dtypes: bf16 stays bf16 (native pass is exact for one-hot
    products); anything else computes as f32."""
    return feats if feats.dtype == jnp.bfloat16 else feats.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _pillar_sum_scatter(feats, pid, num_pillars):
    feats = _norm_dtype(feats)
    n, c = feats.shape
    n_pad = _round_up(n, CHUNK)
    c_pad = _round_up(max(c, 1), LANE)
    sentinel = _round_up(num_pillars, TILE_P) + 1

    order = jnp.argsort(pid)
    sorted_pid = jnp.pad(pid[order], (0, n_pad - n), constant_values=sentinel)
    packed, id_lane = _pack(feats[order], sorted_pid, n, n_pad, c, c_pad)
    out = _sorted_scatter(packed, sorted_pid.astype(jnp.int32),
                          num_pillars, c_pad, id_lane)
    return out[:, :c].astype(feats.dtype)


def _fwd(feats, pid, num_pillars):
    return _pillar_sum_scatter(feats, pid, num_pillars), pid


def _bwd(num_pillars, pid, g):
    # d/dfeats of segment-sum = gather of the cotangent at each point's pillar;
    # out-of-range ids read zero.
    safe = jnp.clip(pid, 0, num_pillars - 1)
    gf = g[safe]
    gf = jnp.where((pid >= 0)[:, None] & (pid < num_pillars)[:, None], gf, 0.0)
    return gf.astype(g.dtype), None


_pillar_sum_scatter.defvjp(_fwd, _bwd)
