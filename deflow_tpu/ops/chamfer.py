"""Chamfer / nearest-neighbor distance between point sets.

TPU rebuild of the reference's brute-force ``chamfer3D`` CUDA extension
(reference README.md:39; SURVEY.md §2.3 native component #2), used by the
zeroflow/seflow-family losses and DUFO label generation.

Two backends with identical semantics (fixed by tests):

- **Pallas kernel** (ops/pallas_chamfer.py, TPU): query set resident in VMEM,
  fused distance + running min/argmin per tile — HBM traffic is one read of
  p and one write of (dist, idx).
- **XLA ``lax.scan``** (everywhere else): ``|p|^2 + |q|^2 - 2 p.q`` with the
  cross term on the MXU, min-reduction tiled over the reference axis.

Gradients ride a shared custom VJP built from the saved argmin indices — the
exact subgradient the CUDA extension's autograd uses (d|p - q*|^2 terms at
the matched pairs), with no need to differentiate through the search.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 3.0e38  # finite +inf stand-in (keeps bf16/f32 arithmetic NaN-free)

# below this many rows the XLA scatter-add beats the sort+kernel detour
_SCATTER_PALLAS_MIN = 1 << 16


class NNSpec(NamedTuple):
    """Static (hashable) nearest-neighbor search configuration.

    ``method``:
      - ``"brute"``: exact O(N·M) search (Pallas kernel on TPU, MXU-tiled
        ``lax.scan`` elsewhere).  ~13 ms at 16k² on v5e — quadratic, so
        unusable at the full 131k AV2 scale.
      - ``"grid"``: coarse-grid pruned search.  The target cloud is binned
        into ``cell``-meter XY cells (device-side counting sort); each query
        searches only the ``(2·ring+1)²`` neighboring cells.  On TPU this
        dispatches to the Pallas cell-sweep kernel (ops/pallas_sweep.py),
        which is EXACT for all true NN distances < ``ring·cell`` with NO
        per-cell capacity.  The XLA fallback additionally keeps at most
        ``capacity`` candidates per cell (dropped points only ever
        *overestimate* distances — but on realistic near-field-heavy AV2
        density the drops are large: 29.6% of points at capacity=128,
        12.3% at 256, measured via :func:`grid_overflow_stats` — treat the
        fallback as approximate at full scale).  Larger distances are
        reported as >= ``ring·cell`` lower bounds (possibly ``_BIG``).
        This is the contract truncated chamfer needs: pick ``ring·cell >=
        truncate`` and the loss is exact (kernel) on everything it can see.
    """

    method: str = "brute"
    tile: int = 2048          # brute: MXU tile over the reference cloud
    cell: float = 2.0         # grid: XY cell edge (m)
    capacity: int = 128       # grid: max candidate points kept per cell
    ring: int = 1             # grid: neighbor radius in cells
    lo: Tuple[float, float] = (-51.2, -51.2)   # grid: XY lower bound
    hi: Tuple[float, float] = (51.2, 51.2)     # grid: XY upper bound
    chunk: int = 2048         # grid: query points per scan step
    # SSL backward: static row budget for the DYNAMIC-term VJP work.  The
    # f-term gathers/scatters only have support on flagged rows (~5-20% of
    # AV2 clouds after DUFO labelling); an explicit cap compacts their VJP
    # to that many rows.  None = N (NO compaction — the r3 N//3 auto-cap
    # was measured to LOSE 3% on v5e: the compaction sort + row re-gathers
    # cost more than the full-width rows they delete).  Dynamic points
    # beyond an explicit cap lose their f-term GRADIENT contribution only
    # (forward loss values are never affected); cap >= the true dynamic
    # count is exact.
    dyn_cap: Optional[int] = None


def _min_dist_tiled(
    p: jnp.ndarray, q: jnp.ndarray, q_mask: jnp.ndarray, tile: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min squared distance (and argmin) from each p to the masked q set."""
    n = p.shape[0]
    m = q.shape[0]
    pad = (-m) % tile
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, 3), q.dtype)], axis=0)
        q_mask = jnp.concatenate([q_mask, jnp.zeros((pad,), q_mask.dtype)], axis=0)
    num_tiles = q.shape[0] // tile
    q_tiles = q.reshape(num_tiles, tile, 3)
    qm_tiles = q_mask.reshape(num_tiles, tile)

    p_sq = jnp.sum(p * p, axis=-1)  # [N]

    def body(carry, inp):
        best, best_idx = carry
        q_t, qm_t, t_idx = inp
        q_sq = jnp.sum(q_t * q_t, axis=-1)
        # [N, TILE] pairwise squared distances via MXU matmul
        # HIGHEST: the TPU default matmul pass rounds f32 operands to bf16,
        # which at ±51 m coordinate scale puts ~1e1 absolute error on the
        # squared distances (measured) — far outside chamfer tolerances.
        d = (
            p_sq[:, None]
            + q_sq[None, :]
            - 2.0 * jnp.dot(p, q_t.T, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        )
        d = jnp.where(qm_t[None, :], jnp.maximum(d, 0.0), _BIG)
        tile_min = jnp.min(d, axis=1)
        tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + t_idx * tile
        take = tile_min < best
        best = jnp.where(take, tile_min, best)
        best_idx = jnp.where(take, tile_arg, best_idx)
        return (best, best_idx), None

    init = (jnp.full((n,), _BIG, p.dtype), jnp.zeros((n,), jnp.int32))
    t_indices = jnp.arange(num_tiles, dtype=jnp.int32)
    (best, best_idx), _ = jax.lax.scan(body, init, (q_tiles, qm_tiles, t_indices))
    return best, best_idx


def _grid_dims(spec: NNSpec) -> Tuple[int, int]:
    gx = int(math.ceil((spec.hi[0] - spec.lo[0]) / spec.cell - 1e-6))
    gy = int(math.ceil((spec.hi[1] - spec.lo[1]) / spec.cell - 1e-6))
    return max(gx, 1), max(gy, 1)


def _bin2d(pts: jnp.ndarray, spec: NNSpec, gx: int, gy: int):
    """Clipped (cx, cy) cell coords of each point's XY position.

    The division rides an ``optimization_barrier`` for the same reason as
    ops/voxel.py: XLA's reciprocal-multiply folding flips ``floor`` at cell
    boundaries.
    """
    lo = jnp.asarray(spec.lo, jnp.float32)
    rel = (pts[:, :2].astype(jnp.float32) - lo) / jax.lax.optimization_barrier(
        jnp.float32(spec.cell))
    cc = jnp.floor(rel).astype(jnp.int32)
    return jnp.clip(cc[:, 0], 0, gx - 1), jnp.clip(cc[:, 1], 0, gy - 1)


def _grid_search(
    p: jnp.ndarray, q: jnp.ndarray, q_mask: jnp.ndarray,
    q_flag, spec: NNSpec,
):
    """Flat-batch coarse-grid NN search ([B, N, 3] x [B, M, 3]), exact below
    ``ring*cell`` (see NNSpec).

    Deliberately NOT vmapped: the batch is flattened with per-sample id
    offsets (one sort, one span table, one chunk scan), because vmapping the
    scan made XLA materialize ~90 ms of 4-D layout copies per SSL step and
    turned the table build into 1.4M-row element gathers.  Flat-batch
    specifics:

    - binning: flat id = local cell + b*(C+1) (slot C = per-sample sentinel
      for masked points, keeping each sample's block contiguous);
    - ONE multi-operand ``lax.sort`` carries x/y/z/flag/row-id payloads, so
      sorted positions need no gather at all;
    - capacity tables are built with one [B*C]-row ``lax.gather`` of
      ``(cap,)`` slices over the sorted columns (cells are contiguous spans
      after the sort) — a few thousand slices instead of B*C*K element
      gathers;
    - the 3x3 ring pre-concatenates via ``jnp.roll`` over the flat cell
      axis; rolls that cross a SAMPLE boundary are masked via a per-slot
      same-sample check (within-sample edge wraps only add far candidates,
      which can never win below the exactness radius).

    Returns (d_all [B,N], i_all [B,N]) and, when ``q_flag`` is given, also
    (d_flag, i_flag) restricted to flag-true candidates.  Indices are local
    to each sample's q rows; rows whose distance is ``_BIG`` carry
    meaningless indices (callers only consume idx where d is finite).
    """
    b, n, _ = p.shape
    m = q.shape[1]
    gx, gy = _grid_dims(spec)
    num_cells = gx * gy
    cap = spec.capacity
    dual = q_flag is not None
    stride = num_cells + 1                      # +1: per-sample sentinel slot

    # ---- binning + one payload sort (no position gathers)
    qf = q.reshape(b * m, 3).astype(jnp.float32)
    qx, qy = _bin2d(qf, spec, gx, gy)
    sidx_q = jnp.arange(b * m, dtype=jnp.int32) // m
    flat_ids = jnp.where(q_mask.reshape(-1), qy * gx + qx, num_cells) \
        + sidx_q * stride
    flag = (q_flag.reshape(-1).astype(jnp.float32) if dual
            else jnp.zeros((b * m,), jnp.float32))
    riota = jnp.arange(b * m, dtype=jnp.int32)
    sids, sx, sy, sz, sflag, sorder = jax.lax.sort(
        (flat_ids, qf[:, 0], qf[:, 1], qf[:, 2], flag, riota), num_keys=1)

    # ---- per-cell spans over the sorted flat ids
    cell_iota = (jnp.arange(b, dtype=jnp.int32)[:, None] * stride
                 + jnp.arange(num_cells, dtype=jnp.int32)[None, :]).reshape(-1)
    start = jnp.searchsorted(sids, cell_iota, side="left").astype(jnp.int32)
    end = jnp.searchsorted(sids, cell_iota, side="right").astype(jnp.int32)
    count = jnp.minimum(end - start, cap)                    # overflow drop

    # ---- capacity tables: [B*C] contiguous K-slices of the sorted columns.
    # Explicit lax.gather with slice_sizes=(cap,): one K-row slice per cell
    # (a vmapped dynamic_slice here lowers to a 10816-iteration while loop of
    # dynamic-update-slices — ~100 ms/step, measured).
    gdn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))

    def table(col):
        colp = jnp.concatenate([col, jnp.zeros((cap,), col.dtype)])
        return jax.lax.gather(colp, start[:, None], gdn, slice_sizes=(cap,),
                              mode=jax.lax.GatherScatterMode.CLIP)

    rows = [table(sx), table(sy), table(sz)] + ([table(sflag)] if dual else [])
    pos_t = jnp.stack(rows, axis=1)                          # [B*C, R, K]
    idx_t = table(sorder)                                    # [B*C, K] flat rows

    # ---- ring pre-concat over the flat cell axis
    r = spec.ring
    offs = np.stack(np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                                indexing="ij"), -1).reshape(-1, 2)
    flat_offs = offs[:, 0] * gx + offs[:, 1]
    nb_k = len(offs)
    nr = pos_t.shape[1]
    # 2-D [B*C, R*NB*K] lane layout: the in-loop slab gather then produces a
    # plain 2-D tensor whose R-planes are STATIC lane slices (the 3-D form
    # cost an extra ~9 ms/direction layout copy per scan step, measured)
    ring_pos = jnp.concatenate(
        [jnp.roll(pos_t, -int(o), axis=0) for o in flat_offs],
        axis=-1).reshape(b * num_cells, nr * nb_k * cap)
    ring_cnt = jnp.stack([jnp.roll(count, -int(o)) for o in flat_offs], -1)
    samp = jnp.arange(b * num_cells, dtype=jnp.int32) // num_cells
    ring_same = jnp.stack(
        [jnp.roll(samp, -int(o)) == samp for o in flat_offs], -1)
    ring_cnt = jnp.where(ring_same, ring_cnt, 0)             # [B*C, NB]
    flat_offs_arr = jnp.asarray(flat_offs, jnp.int32)

    # ---- chunked query scan
    chunk = spec.chunk
    pad = (-(b * n)) % chunk
    pf = p.reshape(b * n, 3).astype(jnp.float32)
    if pad:
        pf = jnp.concatenate([pf, jnp.zeros((pad, 3), jnp.float32)])
    qrows = jnp.arange(pf.shape[0], dtype=jnp.int32)
    nbk_cap = nb_k * cap

    def body(_, inp):
        pts, rows_g = inp                                    # [chunk,3],[chunk]
        sb = jnp.minimum(rows_g // n, b - 1)
        cx, cy = _bin2d(pts, spec, gx, gy)
        c = sb * num_cells + cy * gx + cx                    # [chunk]
        slab = ring_pos[c]                                   # [chunk,R*NB*K]
        plane = lambda i: jax.lax.slice_in_dim(
            slab, i * nbk_cap, (i + 1) * nbk_cap, axis=1)
        cnt = ring_cnt[c]
        ok = (jnp.arange(cap)[None, None, :] < cnt[:, :, None]
              ).reshape(chunk, nb_k * cap)
        dx = pts[:, 0][:, None] - plane(0)
        dy = pts[:, 1][:, None] - plane(1)
        dz = pts[:, 2][:, None] - plane(2)
        d = dx * dx + dy * dy + dz * dz

        def reduce(mask):
            dm = jnp.where(mask, d, _BIG)
            best = jnp.min(dm, axis=1)
            arg = jnp.argmin(dm, axis=1)
            cs = jnp.mod(c + flat_offs_arr[arg // cap], b * num_cells)
            bi = idx_t[cs, arg % cap] - sb * m               # sample-local
            return best, bi

        out = reduce(ok)
        if dual:
            out = out + reduce(ok & (plane(3) > 0.5))
        return _, out

    nchunks = pf.shape[0] // chunk
    _, outs = jax.lax.scan(
        body, None, (pf.reshape(nchunks, chunk, 3),
                     qrows.reshape(nchunks, chunk)))
    cut = lambda x: x.reshape(-1)[: b * n].reshape(b, n)
    return tuple(cut(x) for x in outs)


class _SweepCloud(NamedTuple):
    """One cloud payload-sorted by gap-row flat cell id (see pallas_sweep)."""

    sid: jnp.ndarray       # [B*N] i32 ascending flat cell ids
    sx: jnp.ndarray        # [B*N] f32 sorted coordinates
    sy: jnp.ndarray
    sz: jnp.ndarray
    sflag: jnp.ndarray     # [B*N] f32 sorted dynamic flags
    sglobal: jnp.ndarray   # [B*N] f32 original global rows (b*N + i)
    start: jnp.ndarray     # [C_total + 1] i32 per-cell span starts
    n: int                 # points per sample
    c_total: int           # B * (gy+1) * gx


def _sweep_sort(pts, mask, flag, spec: NNSpec) -> _SweepCloud:
    """Bin + ONE payload sort into the kernel's gap-row cell order.

    Flat id = (b·(gy+1) + cy)·gx + cx — one empty gap ROW between samples, so
    the kernel's |Δrow| ≤ 1 test is simultaneously the ring test and the
    sample-isolation test.  Masked points get the one-past-the-end sentinel
    (they sort to the global tail; all-sentinel query chunks do zero work)."""
    b, n, _ = pts.shape
    gx, gy = _grid_dims(spec)
    c_total = b * (gy + 1) * gx
    pf = pts.reshape(b * n, 3).astype(jnp.float32)
    cx, cy = _bin2d(pf, spec, gx, gy)
    sidx = jnp.arange(b * n, dtype=jnp.int32) // n
    mflat = mask.reshape(-1)
    ids = jnp.where(mflat, (sidx * (gy + 1) + cy) * gx + cx, c_total)
    # masked rows carry +2e19 SENTINEL coordinates (d overflows to inf):
    # the kernel's CLEAN chunks skip the w-lane validity passes and rely on
    # coordinate sentinels alone for masked/padding rows (see
    # pallas_sweep.cell_sweep_pallas ``dirty``)
    pf = jnp.where(mflat[:, None], pf, jnp.float32(2e19))
    flagf = (flag.reshape(-1).astype(jnp.float32) if flag is not None
             else jnp.zeros((b * n,), jnp.float32))
    grows = jnp.arange(b * n, dtype=jnp.float32)
    sid, sx, sy, sz, sflag, sglobal = jax.lax.sort(
        (ids, pf[:, 0], pf[:, 1], pf[:, 2], flagf, grows), num_keys=1)
    start = jnp.searchsorted(
        sid, jnp.arange(c_total + 1, dtype=jnp.int32)).astype(jnp.int32)
    return _SweepCloud(sid, sx, sy, sz, sflag, sglobal, start, n, c_total)


def _sweep_cloud_from_host(lanes: jnp.ndarray, sid_local: jnp.ndarray,
                           start: jnp.ndarray, spec: NNSpec) -> _SweepCloud:
    """Assemble a :class:`_SweepCloud` from host-side chamfer cell prep
    (data/host_prep.py ``chamfer_cell_prep``) — no device sort, no
    searchsorted start-table build (~4 ms/step at 4x98304 on v5e).

    Args: lanes [B, 5, N] f32 (sorted x, y, z, flag, orig-row per sample),
    sid_local [B, N] i32 local cell ids (masked rows = the per-sample
    sentinel ``kgap``), start [B, kgap+1] i32 per-sample row offsets.

    Layout difference vs :func:`_sweep_sort`: masked rows sit at each
    SAMPLE's tail instead of the global tail (their sid maps to the global
    sentinel, so the kernel's w-lane still makes them lose everywhere), and
    the start table is exact per sample — a window dipping across a sample
    boundary walks the neighbor sample's masked tail, which the w-lane
    likewise defuses (chunk-granular windows already admit such rows).
    """
    b, _, n = lanes.shape
    gx, gy = _grid_dims(spec)
    kgap = (gy + 1) * gx
    c_total = b * kgap
    assert start.shape[-1] == kgap + 1, (
        f"host chamfer prep grid mismatch: start table {start.shape[-1] - 1} "
        f"cells vs spec {(gx, gy)} -> {kgap}")
    flat = lambda k: lanes[:, k, :].reshape(b * n)
    s_of_row = jnp.arange(b * n, dtype=jnp.int32) // n
    loc = sid_local.reshape(b * n)
    sid = jnp.where(loc >= kgap, c_total, loc + s_of_row * kgap)
    # masked tail rows → +2e19 sentinel coordinates (the host ships zeros;
    # clean sweep chunks have no w-lane pass to defuse them — see
    # _sweep_sort).  Three [B·N] flat selects: ~µs at 4×98304.
    mrow = loc < kgap
    sent = lambda v: jnp.where(mrow, v, jnp.float32(2e19))
    sglobal = flat(4) + (s_of_row * n).astype(jnp.float32)
    start_g = (start[:, :kgap]
               + (jnp.arange(b, dtype=jnp.int32) * n)[:, None]).reshape(-1)
    start_g = jnp.concatenate(
        [start_g, jnp.full((1,), b * n, jnp.int32)]).astype(jnp.int32)
    return _SweepCloud(sid, sent(flat(0)), sent(flat(1)), sent(flat(2)),
                       flat(3), sglobal, start_g, n, c_total)


def _sweep_call(qc: _SweepCloud, cc: _SweepCloud, spec: NNSpec, dual: bool):
    """One sweep direction through the Pallas kernel, in SORTED-query order:
    returns out [NQ_pad, 8] with lanes (d_all, i_all, d_flag, i_flag, 0…),
    i = sample-local candidate rows.  Callers that need original row order
    unsort via ``qc.sglobal`` (see :func:`_sweep_dir`).

    DEAD END (round 5, measured): a second Pallas pass re-streaming the
    same ring windows to gather each match's coordinates for the SSL VJP
    (one-hot MXU contraction against a 16-lane bf16 slab of exact 3-way
    coordinate splits + base-128 row digits, j-range-intersected windows,
    single live direction via a static grad-direction spec hint).  It replaced
    the backward's two descriptor-bound [B·N, 3] neighbor-gather fusions
    (3.4 + 2.7 ms at 4×98304, bw_eff ≈ 0) but measured NET −0.5 to −1.4
    pairs/s on v5e (ssl4 28.7 vs 29.2 best variant): the dense one-hot
    contraction pays K=CHUNK_C MXU work per query for a sparse selection
    (~2.2 µs/block at [2·256, 512]·128) plus ~NQ/CHUNK_Q grid steps of
    fixed cost — a ~5 ms floor — and the 11-lane unsort + slab build eat
    the rest.  With the in-kernel carry lanes (r4, 2 variants) and the
    fused sorted-space sums (r5) this is the FOURTH dead reformulation of
    the w-term gathers; their ~6 ms descriptor floor stands."""
    from deflow_tpu.ops.pallas_sweep import (
        CHUNK_C, CHUNK_Q, cell_sweep_pallas)

    gx = _grid_dims(spec)[0]
    bn = qc.sid.shape[0]
    b = bn // qc.n
    nq_pad = -(-bn // CHUNK_Q) * CHUNK_Q
    # flat cells per sample (incl. the gap row): sid // kgap = sample index.
    # w = sample·wstep is the kernel's 4th coordinate — Δw = 0 exactly
    # within a sample, Δw² ≥ (ring·cell)² across (cross-sample pairs lose
    # everywhere the exactness contract speaks), and the ±2e19 masked/
    # padding sentinels overflow d to inf (pallas_sweep module docstring).
    kgap = qc.c_total // b
    wstep = jnp.float32(max(1000.0, math.ceil(spec.ring * spec.cell * 2.0)))

    # ---- query slab [NQ_pad, 8]: x, y, z, w (kernel reads lanes 0-3 only)
    sid_pad = jnp.pad(qc.sid, (0, nq_pad - bn), constant_values=qc.c_total)
    qw = jnp.where(sid_pad >= qc.c_total, jnp.float32(2e19),
                   (sid_pad // kgap).astype(jnp.float32) * wstep)
    zero_q = jnp.zeros((nq_pad,), jnp.float32)
    padf = lambda v: jnp.pad(v, (0, nq_pad - bn))
    q_slab = jnp.stack([padf(qc.sx), padf(qc.sy), padf(qc.sz),
                        qw, zero_q, zero_q, zero_q, zero_q], axis=1)

    # ---- candidate slab [NC_chunks, 8, CHUNK_C], coordinate-major planes
    nc = cc.sid.shape[0]
    nc_pad = -(-nc // CHUNK_C) * CHUNK_C
    ncc = nc_pad // CHUNK_C
    ckgap = cc.c_total // b
    cw = jnp.where(cc.sid >= cc.c_total, jnp.float32(-2e19),
                   (cc.sid // ckgap).astype(jnp.float32) * wstep)
    fpen = jnp.where(cc.sflag > 0.5, 0.0, _BIG)
    corig = (cc.sglobal.astype(jnp.int32) % cc.n).astype(jnp.float32)
    lanes = [
        # padding rows: +2e19 coordinate sentinels (d = inf on clean chunks
        # with no w-lane; redundant with the w sentinel on dirty ones)
        jnp.pad(cc.sx, (0, nc_pad - nc), constant_values=jnp.float32(2e19)),
        jnp.pad(cc.sy, (0, nc_pad - nc), constant_values=jnp.float32(2e19)),
        jnp.pad(cc.sz, (0, nc_pad - nc), constant_values=jnp.float32(2e19)),
        jnp.pad(cw, (0, nc_pad - nc), constant_values=jnp.float32(-2e19)),
        jnp.pad(fpen, (0, nc_pad - nc), constant_values=_BIG),
        jnp.pad(corig, (0, nc_pad - nc), constant_values=-1.0),
        jnp.zeros((nc_pad,), jnp.float32),
        jnp.zeros((nc_pad,), jnp.float32),
    ]
    c_slab = jnp.concatenate(
        [l.reshape(ncc, 1, CHUNK_C) for l in lanes], axis=1)

    # ---- ring-row windows per query chunk.  Explicit min/max (not
    # first/last): the host-prepped layout interleaves per-sample masked
    # tails (global-sentinel sid) with the next sample's real rows, so a
    # boundary chunk is not globally ascending — max must EXCLUDE sentinels
    # or the window would span to the end of the slab.
    sid_chunks = sid_pad.reshape(nq_pad // CHUNK_Q, CHUNK_Q)
    qmin = jnp.min(sid_chunks, axis=1)
    qmax = jnp.max(jnp.where(sid_chunks >= qc.c_total, -1, sid_chunks), axis=1)
    # all-sentinel chunk: qmin = c_total (clipped), qmax = -1 -> rhi <= rlo
    # -> zero windows (same no-op as the sorted path's sentinel tail)
    # The three ring-row windows can OVERLAP at block granularity (a chunk
    # spanning ≥ a full cell row in sparse regions, or clip pile-ups at the
    # grid edge).  Dedup sequentially (window block starts/ends are
    # monotone in j): the sweep's min-reduce only wasted passes on repeats,
    # but the match-coord gather ACCUMULATES — a block visited twice would
    # double the gathered row.
    cs_cols, cn_cols = [], []
    end = jnp.zeros_like(qmin)
    blk_lo = jnp.full_like(qmin, 2**30)
    blk_hi = jnp.zeros_like(qmin)
    for j in (-1, 0, 1):
        wlo = jnp.clip(qmin + j * gx - 1, 0, cc.c_total - 1)
        whi = jnp.clip(qmax + j * gx + 1, 0, cc.c_total - 1)
        rlo = cc.start[wlo]
        rhi = cc.start[whi + 1]
        clo = jnp.maximum(rlo // CHUNK_C, end)
        chi = -(-rhi // CHUNK_C)
        n_j = jnp.where(rhi > rlo, jnp.maximum(chi - clo, 0), 0)
        end = jnp.where(n_j > 0, chi, end)
        blk_lo = jnp.where(n_j > 0, jnp.minimum(blk_lo, clo), blk_lo)
        blk_hi = jnp.where(n_j > 0, jnp.maximum(blk_hi, chi), blk_hi)
        cs_cols.append(clo)
        cn_cols.append(n_j)
    cs = jnp.stack(cs_cols, axis=1).astype(jnp.int32)
    cn = jnp.stack(cn_cols, axis=1).astype(jnp.int32)

    # ---- clean/dirty per query chunk (row-space window check).  A chunk is
    # CLEAN when all its queries share one sample AND every fetched block
    # row (including CHUNK_C quantization slack) lies inside that sample's
    # own row range — then no other sample's real rows can appear and the
    # kernel may skip the w-lane validity passes (masked/padding rows carry
    # ±2e19 coordinate sentinels).  Sample boundaries touch ~2-6% of chunks.
    sq = qmin // kgap
    sqx = qmax // kgap
    row_lo = cc.start[jnp.minimum(sq * kgap, cc.c_total)]
    row_hi = cc.start[jnp.minimum((sq + 1) * kgap, cc.c_total)]
    clean = ((sq == sqx) & (blk_lo * CHUNK_C >= row_lo)
             & (blk_hi * CHUNK_C <= row_hi))
    dirty = 1 - clean.astype(jnp.int32)

    return cell_sweep_pallas(q_slab, c_slab, cs, cn, dirty, dual)


def _sweep_dir(qc: _SweepCloud, cc: _SweepCloud, spec: NNSpec, dual: bool):
    """:func:`_sweep_call` + unsort to ORIGINAL query rows: per-row
    (d_all [B,N], i_all, d_flag, i_flag) with i = sample-local candidate
    rows (−1 / garbage where d is the no-candidate sentinel)."""
    out = _sweep_call(qc, cc, spec, dual)
    bn = qc.sid.shape[0]
    b = bn // qc.n
    nq_pad = out.shape[0]
    # ---- unsort: one payload sort keyed by the carried original rows
    key = jnp.pad(qc.sglobal.astype(jnp.int32), (0, nq_pad - bn),
                  constant_values=jnp.int32(2**30))
    cut = lambda x: x[:bn].reshape(b, qc.n)
    _, d_a, i_a, d_f, i_f = jax.lax.sort(
        (key, out[:, 0], out[:, 1], out[:, 2], out[:, 3]), num_keys=1)
    return (cut(d_a), cut(i_a).astype(jnp.int32),
            cut(d_f), cut(i_f).astype(jnp.int32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _chamfer_nn_grid(pc0, pc1, mask0, mask1, spec):
    """Batched bidirectional grid NN: (d0, d1, i0, i1), each [B, *]."""
    if _use_pallas():
        c0 = _sweep_sort(pc0, mask0, None, spec)
        c1 = _sweep_sort(pc1, mask1, None, spec)
        d0, i0, _, _ = _sweep_dir(c0, c1, spec, dual=False)
        d1, i1, _, _ = _sweep_dir(c1, c0, spec, dual=False)
    else:
        d0, i0 = _grid_search(pc0, pc1, mask1, None, spec)
        d1, i1 = _grid_search(pc1, pc0, mask0, None, spec)
    d0 = jnp.where(mask0, d0, 0.0)
    d1 = jnp.where(mask1, d1, 0.0)
    return d0, d1, i0, i1


def _chamfer_nn_grid_fwd(pc0, pc1, mask0, mask1, spec):
    out = _chamfer_nn_grid(pc0, pc1, mask0, mask1, spec)
    d0, d1, i0, i1 = out
    return out, (pc0, pc1, mask0, mask1, i0, i1)


def _take_rows(x, i):
    """[B, M, 3] gathered at [B, N] per-sample indices -> [B, N, 3]."""
    return jnp.take_along_axis(x, jnp.clip(i, 0, x.shape[1] - 1)[..., None],
                               axis=1)


def _scatter_lanes(i, w, n_rows):
    """Segment scatter-add: ``out[b, i[b, k], :] += w[b, k, :]`` into
    ``[B, n_rows, L]`` zeros, out-of-range indices dropped.

    XLA lowers the scatter-add at ~40 ns/row (15.8 ms at 393k rows,
    measured) — on TPU it is reformulated as sort-by-index + the presorted
    Pallas segment-sum kernel (~4 ms): duplicate indices become segment
    spans, exactly the kernel's contract.  The kernel's cost is the
    [segments, 128-lane] output write, so extra payload lanes (L=4 for the
    mirror-term g-sum) ride free."""
    b, m, lanes = w.shape
    if not (_use_pallas() and b * m >= _SCATTER_PALLAS_MIN):
        zeros = jnp.zeros((b, n_rows, lanes), w.dtype)
        return jax.vmap(lambda ii, ww: zeros[0].at[ii].add(ww, mode="drop"))(
            i, w)
    off = (jnp.arange(b, dtype=jnp.int32) * n_rows)[:, None]
    flat_i = jnp.where((i >= 0) & (i < n_rows), i + off, -1).reshape(b * m)
    added = _scatter_lanes_flat(flat_i, w.reshape(b * m, lanes), b * n_rows)
    return jnp.moveaxis(added.reshape(lanes, b, n_rows), 0, -1).astype(w.dtype)


def _scatter_lanes_flat(flat_i, w, segs: int):
    """Flat-space segment scatter-add: ``out[flat_i[k], l] += w[k, l]`` into
    [lanes, segs] zeros; rows with flat_i outside [0, segs) are dropped.
    One payload sort + the presorted Pallas lane segment-sum (see
    :func:`_scatter_lanes`)."""
    from deflow_tpu.ops.pallas_scatter import (
        TILE_S, _round_up, segment_sum_lanes_pallas)

    m, lanes = w.shape
    sentinel = _round_up(segs, TILE_S) + 1
    flat_i = jnp.where((flat_i >= 0) & (flat_i < segs), flat_i, sentinel)
    wf = w.astype(jnp.float32)
    sorted_cols = jax.lax.sort(
        (flat_i,) + tuple(wf[:, k] for k in range(lanes)), num_keys=1)
    return segment_sum_lanes_pallas(sorted_cols[1:], sorted_cols[0], segs)


def _scatter_rows(base, i, w):
    """base[b].at[i[b]].add(w[b]) with out-of-range drop (see _scatter_lanes)."""
    return base + _scatter_lanes(i, w, base.shape[1]).astype(base.dtype)


def _mirror_payload(g, masked_g_rows, pts):
    """Payload lanes for the GATHER-FREE mirror scatter term.

    Scattering ``-w = -2g_j (q_j - p[i_j])`` at rows ``i_j`` needs a gather
    of ``p`` at ``i`` only to subtract it back at its own row — algebra
    removes it: scatter ``(-2g_j·q_j, 2g_j)`` as 4 payload lanes and add
    ``p · (scattered g-sum)`` elementwise afterwards.  Kills one
    descriptor-bound [B·N]-row gather per term (~5-6 ms each at 4x98304 on
    v5e) at the cost of one extra (free) scatter lane."""
    gm = jnp.where(masked_g_rows, 2.0 * g, 0.0)
    return jnp.concatenate([-gm[..., None] * pts, gm[..., None]], axis=-1)


def _chamfer_nn_grid_bwd(spec, res, cts):
    """Matched-pair subgradient (the CUDA extension autograd), batched.

    The own-row terms ``w = 2g (p - q*[i])`` need the neighbor gather; the
    MIRROR terms (scattered into the other cloud) do not — they ride the
    gather-free 4-lane form (see :func:`_mirror_payload`).  d_pc0/d_pc1 stay
    separate scatter calls so XLA dead-code-eliminates an unused direction
    (SeFlow only differentiates the warped side)."""
    pc0, pc1, mask0, mask1, i0, i1 = res
    g0, g1, _, _ = cts

    both0 = (mask0 & jnp.any(mask1, axis=-1, keepdims=True))[..., None]
    both1 = (mask1 & jnp.any(mask0, axis=-1, keepdims=True))[..., None]
    diff0 = jnp.where(both0, pc0 - _take_rows(pc1, i0), 0.0)
    diff1 = jnp.where(both1, pc1 - _take_rows(pc0, i1), 0.0)
    w0 = (2.0 * g0)[..., None] * diff0
    w1 = (2.0 * g1)[..., None] * diff1
    s0 = _scatter_lanes(i1, _mirror_payload(g1, both1[..., 0], pc1),
                        pc0.shape[1])
    s1 = _scatter_lanes(i0, _mirror_payload(g0, both0[..., 0], pc0),
                        pc1.shape[1])
    d_pc0 = w0 + s0[..., :3] + pc0 * s0[..., 3:]
    d_pc1 = w1 + s1[..., :3] + pc1 * s1[..., 3:]
    zero_m0 = jnp.zeros(mask0.shape, dtype=jax.dtypes.float0)
    zero_m1 = jnp.zeros(mask1.shape, dtype=jax.dtypes.float0)
    return d_pc0, d_pc1, zero_m0, zero_m1


_chamfer_nn_grid.defvjp(_chamfer_nn_grid_fwd, _chamfer_nn_grid_bwd)


def _ssl_nn_impl(pc0, pc1, mask0, mask1, flag0, flag1, spec, host_c1=None):
    """Shared body of :func:`_ssl_nn` / :func:`_ssl_nn_hosted`."""
    if _use_pallas():
        c0 = _sweep_sort(pc0, mask0, flag0, spec)
        c1 = (_sweep_cloud_from_host(*host_c1, spec) if host_c1 is not None
              else _sweep_sort(pc1, mask1, flag1, spec))
        d0a, i0a, d0f, i0f = _sweep_dir(c0, c1, spec, dual=True)
        d1a, i1a, d1f, i1f = _sweep_dir(c1, c0, spec, dual=True)
    else:
        d0a, i0a, d0f, i0f = _grid_search(pc0, pc1, mask1, flag1, spec)
        d1a, i1a, d1f, i1f = _grid_search(pc1, pc0, mask0, flag0, spec)
    d0a = jnp.where(mask0, d0a, 0.0)
    d1a = jnp.where(mask1, d1a, 0.0)
    d0f = jnp.where(mask0 & flag0, d0f, 0.0)
    d1f = jnp.where(mask1 & flag1, d1f, 0.0)
    return d0a, d1a, d0f, d1f, i0a, i1a, i0f, i1f


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _ssl_nn(pc0, pc1, mask0, mask1, flag0, flag1, spec):
    """Fused SeFlow NN set (batched): bidirectional all-candidates AND
    dynamic-only chamfer in one grid sweep per direction (vs four sweeps for
    two separate ``chamfer_distance`` calls)."""
    return _ssl_nn_impl(pc0, pc1, mask0, mask1, flag0, flag1, spec)


def _ssl_nn_fwd(pc0, pc1, mask0, mask1, flag0, flag1, spec):
    out = _ssl_nn(pc0, pc1, mask0, mask1, flag0, flag1, spec)
    _, _, _, _, i0a, i1a, i0f, i1f = out
    return out, (pc0, pc1, mask0, mask1, flag0, flag1, i0a, i1a, i0f, i1f)


def _dyn_cap_for(spec: "NNSpec", n: int) -> int:
    """Default is NO compaction: the N//3 auto-cap was measured to LOSE on
    v5e (SSL 22.30 vs 23.04 pairs/s/chip @4x98304 — the compaction sort +
    take_along_axis gathers cost more than the full-width f-term rows they
    delete), and an explicit cap silently truncates f-term gradients beyond
    it.  Set ``dyn_cap`` only with telemetry (dyn_cap_overflow_stats)."""
    cap = spec.dyn_cap
    if cap is None:
        cap = n
    return min(cap, n)


def _compact_idx(flag: jnp.ndarray, cap: int) -> jnp.ndarray:
    """[B, N] bool → [B, cap] i32 listing flag-set row indices first (stable
    original order); the padded tail indexes non-flag rows (whose f-term is
    identically zero).  One packed single-lane sort — ~1 ms at 4×98304 vs
    the ~6 ms of full-width gather fusions it deletes."""
    b, n = flag.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    keys = jnp.where(flag, iota, iota + n)
    return jax.lax.sort(keys, dimension=-1)[:, :cap] % n


def _ssl_nn_bwd(spec, res, cts):
    """Matched-pair subgradients of all four distance sets (the brute
    extension's autograd, extended to the dynamic-only terms).

    Only the OWN-ROW terms ``2g (p - q*[i])`` gather the matched neighbor;
    the mirror terms scattered into the other cloud are gather-free (4-lane
    payload + elementwise g-sum correction, :func:`_mirror_payload`) — that
    removes two descriptor-bound [B·N]-row gathers per live direction.
    Each direction still rides ONE sorted segment-sum (the kernel cost is
    the [B·N, 128-lane] output write), and d_pc0/d_pc1 stay SEPARATE calls
    on purpose: in SeFlow training only the warped-pc0 side carries
    gradient, and XLA dead-code-eliminates the unused direction entirely
    (measured: the pre-merge trace shows only one direction's pipeline).

    The dynamic (f) terms optionally run COMPACTED to ``spec.dyn_cap`` rows:
    their gathers/scatters are descriptor-bound (~cost per ROW regardless of
    row bytes), and only flagged rows carry nonzero gradient."""
    pc0, pc1, m0, m1, f0, f1, i0a, i1a, i0f, i1f = res
    g0a, g1a, g0f, g1f = cts[:4]

    def w_term(g, pq, qp, idx, row_ok):
        diff = jnp.where(row_ok[..., None], pq - _take_rows(qp, idx), 0.0)
        return (2.0 * g)[..., None] * diff

    any1 = jnp.any(m1, axis=-1, keepdims=True)
    any0 = jnp.any(m0, axis=-1, keepdims=True)
    anyf1 = jnp.any(m1 & f1, axis=-1, keepdims=True)
    anyf0 = jnp.any(m0 & f0, axis=-1, keepdims=True)
    w0a = w_term(g0a, pc0, pc1, i0a, m0 & any1)
    w1a = w_term(g1a, pc1, pc0, i1a, m1 & any0)
    p1a = _mirror_payload(g1a, m1 & any0, pc1)
    p0a = _mirror_payload(g0a, m0 & any1, pc0)

    n, m = pc0.shape[1], pc1.shape[1]
    cap0 = _dyn_cap_for(spec, n)
    cap1 = _dyn_cap_for(spec, m)
    glane0 = lambda w: jnp.concatenate(
        [w, jnp.zeros(w.shape[:-1] + (1,), w.dtype)], axis=-1)
    if cap0 < n or cap1 < m:
        tr = lambda x, i: jnp.take_along_axis(x, i, axis=1)
        s0 = _compact_idx(m0 & f0, cap0)
        s1 = _compact_idx(m1 & f1, cap1)
        w0f = w_term(tr(g0f, s0), _take_rows(pc0, s0), pc1, tr(i0f, s0),
                     tr(m0 & f0, s0) & anyf1)
        w1f = w_term(tr(g1f, s1), _take_rows(pc1, s1), pc0, tr(i1f, s1),
                     tr(m1 & f1, s1) & anyf0)
        p1f = _mirror_payload(tr(g1f, s1), tr(m1 & f1, s1) & anyf0,
                              _take_rows(pc1, s1))
        p0f = _mirror_payload(tr(g0f, s0), tr(m0 & f0, s0) & anyf1,
                              _take_rows(pc0, s0))
        su0 = _scatter_lanes(
            jnp.concatenate([i1a, s0, tr(i1f, s1)], axis=1),
            jnp.concatenate([p1a, glane0(w0f), p1f], axis=1), n)
        su1 = _scatter_lanes(
            jnp.concatenate([i0a, s1, tr(i0f, s0)], axis=1),
            jnp.concatenate([p0a, glane0(w1f), p0f], axis=1), m)
        d_pc0 = w0a + su0[..., :3] + pc0 * su0[..., 3:]
        d_pc1 = w1a + su1[..., :3] + pc1 * su1[..., 3:]
    else:
        w0f = w_term(g0f, pc0, pc1, i0f, (m0 & f0) & anyf1)
        w1f = w_term(g1f, pc1, pc0, i1f, (m1 & f1) & anyf0)
        p1f = _mirror_payload(g1f, (m1 & f1) & anyf0, pc1)
        p0f = _mirror_payload(g0f, (m0 & f0) & anyf1, pc0)
        su0 = _scatter_lanes(jnp.concatenate([i1a, i1f], axis=1),
                             jnp.concatenate([p1a, p1f], axis=1), n)
        su1 = _scatter_lanes(jnp.concatenate([i0a, i0f], axis=1),
                             jnp.concatenate([p0a, p0f], axis=1), m)
        d_pc0 = w0a + w0f + su0[..., :3] + pc0 * su0[..., 3:]
        d_pc1 = w1a + w1f + su1[..., :3] + pc1 * su1[..., 3:]
    zeros = [jnp.zeros(x.shape, dtype=jax.dtypes.float0)
             for x in (res[2], res[3], res[4], res[5])]
    return (d_pc0, d_pc1, *zeros)


_ssl_nn.defvjp(_ssl_nn_fwd, _ssl_nn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _ssl_nn_hosted(pc0, pc1, mask0, mask1, flag0, flag1,
                   lanes, sid, start, spec):
    """:func:`_ssl_nn` with pc1's cell sort shipped from the host
    (data/host_prep.py ``chamfer_cell_prep``): pc1 is flow-independent, so
    its device sort + start-table searchsorted are pure overhead.  The
    backward is identical (matched-pair subgradients in original row
    space); the host arrays carry no gradient."""
    return _ssl_nn_impl(pc0, pc1, mask0, mask1, flag0, flag1, spec,
                        host_c1=(lanes, sid, start))


def _ssl_nn_hosted_fwd(pc0, pc1, mask0, mask1, flag0, flag1,
                       lanes, sid, start, spec):
    out = _ssl_nn_hosted(pc0, pc1, mask0, mask1, flag0, flag1,
                         lanes, sid, start, spec)
    _, _, _, _, i0a, i1a, i0f, i1f = out
    return out, (pc0, pc1, mask0, mask1, flag0, flag1, i0a, i1a, i0f, i1f,
                 lanes.shape, sid.shape, start.shape)


def _ssl_nn_hosted_bwd(spec, res, cts):
    *core, lanes_shape, sid_shape, start_shape = res
    d_pc0, d_pc1, zm0, zm1, zf0, zf1 = _ssl_nn_bwd(spec, tuple(core), cts)
    f0 = lambda s: jnp.zeros(s, dtype=jax.dtypes.float0)
    return (d_pc0, d_pc1, zm0, zm1, zf0, zf1,
            jnp.zeros(lanes_shape, jnp.float32), f0(sid_shape),
            f0(start_shape))


_ssl_nn_hosted.defvjp(_ssl_nn_hosted_fwd, _ssl_nn_hosted_bwd)



def ssl_chamfer_distances(
    pc0: jnp.ndarray,
    pc1: jnp.ndarray,
    mask0: jnp.ndarray,
    mask1: jnp.ndarray,
    dyn0: jnp.ndarray,
    dyn1: jnp.ndarray,
    truncate: float = 2.0,
    spec: Optional[NNSpec] = None,
    host_c1=None,
):
    """Fused SeFlow chamfer: (d0_all, d1_all, d0_dyn, d1_dyn) squared NN
    distances, where the *_dyn pair restricts BOTH queries and candidates to
    the dynamic subsets.  Equivalent to two truncated ``chamfer_distance``
    grid calls at ~55% of the cost (one binning + one sweep per direction).
    Exact below ``ring*cell >= truncate`` modulo cell-capacity overflow.

    ``host_c1``: optional (lanes [B,5,N], sid [B,N], start [B,K+1]) from the
    loader's ``chamfer_cell_prep`` — pc1's cell sort precomputed on the host
    (geometry must match ``spec``; see losses.seflow_loss for the gate).
    """
    if spec is None:
        spec = _resolve_spec("grid", pc0.shape[-2], pc1.shape[-2],
                             truncate, None)
    batched = pc0.ndim == 3
    up = (lambda x: x) if batched else (lambda x: x[None])
    args = [jnp.where(up(mask0)[..., None], up(pc0), 0.0).astype(jnp.float32),
            jnp.where(up(mask1)[..., None], up(pc1), 0.0).astype(jnp.float32),
            up(mask0), up(mask1), up(dyn0), up(dyn1)]
    if host_c1 is not None:
        out = _ssl_nn_hosted(*args, *host_c1, spec)[:4]
    else:
        out = _ssl_nn(*args, spec)[:4]
    return tuple(x if batched else x[0] for x in out)


def dyn_cap_overflow_stats(flags: jnp.ndarray, n: Optional[int] = None,
                           spec: Optional[NNSpec] = None):
    """Telemetry for ``NNSpec.dyn_cap`` (the compacted f-term VJP budget).

    ``flags``: [B, N] bool dynamic masks (``m & (dufo > 0)``).  Returns
    (max_count, cap, overflowing_sample_fraction) — when any sample's
    dynamic count exceeds the cap, that sample's EXTRA dynamic points lose
    their f-term gradient contribution (forward loss is never affected).
    Run this over a dataset sample to size an explicit cap against the
    real DUFO label density before enabling compaction.
    """
    if spec is None:
        spec = NNSpec(method="grid")
    cap = _dyn_cap_for(spec, n or flags.shape[-1])
    counts = jnp.sum(flags, axis=-1)
    return (jnp.max(counts), cap,
            jnp.mean((counts > cap).astype(jnp.float32)))


def grid_overflow_stats(pts: jnp.ndarray, mask: jnp.ndarray,
                        spec: Optional[NNSpec] = None):
    """Capacity-overflow telemetry for the XLA grid backend (VERDICT r2 #5).

    The XLA fallback (``_grid_search``) keeps at most ``spec.capacity``
    candidates per cell and silently drops the rest (only ever
    *overestimating* distances); the Pallas cell-sweep path has no capacity
    at all.  This measures how much the fallback would drop on a given
    cloud: returns ``(dropped_fraction, overflowing_cell_fraction,
    max_cell_count)`` — each a scalar jnp array.
    """
    if spec is None:
        spec = NNSpec(method="grid")
    batched = pts.ndim == 3
    if not batched:
        pts, mask = pts[None], mask[None]
    b, n, _ = pts.shape
    gx, gy = _grid_dims(spec)
    num_cells = gx * gy
    pf = pts.reshape(b * n, 3).astype(jnp.float32)
    cx, cy = _bin2d(pf, spec, gx, gy)
    sidx = jnp.arange(b * n, dtype=jnp.int32) // n
    ids = jnp.where(mask.reshape(-1), sidx * num_cells + cy * gx + cx,
                    b * num_cells)
    counts = jnp.bincount(ids, length=b * num_cells + 1)[:-1]
    over = jnp.maximum(counts - spec.capacity, 0)
    total = jnp.maximum(jnp.sum(mask), 1)
    return (jnp.sum(over) / total,
            jnp.mean((counts > spec.capacity) & (counts > 0)),
            jnp.max(counts))


def _use_pallas() -> bool:
    from deflow_tpu.ops.voxel import _use_pallas as up

    return up()


def _nn_search(p, q, q_mask, spec: NNSpec):
    """Brute backend dispatch: (dist [N] f32 squared, idx [N] i32).

    (The grid method never reaches here — ``chamfer_distance`` routes it to
    the flat-batch ``_chamfer_nn_grid``.)"""
    if _use_pallas():
        from deflow_tpu.ops.pallas_chamfer import chamfer_min_pallas

        return chamfer_min_pallas(p, q, q_mask)
    return _min_dist_tiled(p, q, q_mask, spec.tile)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _chamfer_nn(pc0, pc1, mask0, mask1, spec):
    """Bidirectional masked NN: (d0 [N], d1 [M], i0 [N], i1 [M])."""
    d0, i0 = _nn_search(pc0, pc1, mask1, spec)
    d1, i1 = _nn_search(pc1, pc0, mask0, spec)
    d0 = jnp.where(mask0, d0, 0.0)
    d1 = jnp.where(mask1, d1, 0.0)
    return d0, d1, i0, i1


def _chamfer_nn_fwd(pc0, pc1, mask0, mask1, spec):
    out = _chamfer_nn(pc0, pc1, mask0, mask1, spec)
    d0, d1, i0, i1 = out
    return out, (pc0, pc1, mask0, mask1, i0, i1)


def _chamfer_nn_bwd(spec, res, cts):
    """Subgradient at the matched pairs (what the CUDA extension's autograd
    computes): d|p - q*|^2/dp = 2 (p - q*), with the mirror term scattered
    into the matched rows of the other cloud."""
    pc0, pc1, mask0, mask1, i0, i1 = res
    g0, g1, _, _ = cts  # no gradients through the integer indices

    both0 = (mask0 & jnp.any(mask1))[..., None]
    both1 = (mask1 & jnp.any(mask0))[..., None]
    diff0 = jnp.where(both0, pc0 - pc1[i0], 0.0)     # [N, 3]
    diff1 = jnp.where(both1, pc1 - pc0[i1], 0.0)     # [M, 3]
    w0 = (2.0 * g0)[..., None] * diff0
    w1 = (2.0 * g1)[..., None] * diff1

    d_pc0 = w0.at[i1].add(-w1, mode="drop")
    d_pc1 = w1.at[i0].add(-w0, mode="drop")
    zero_m0 = jnp.zeros_like(mask0, dtype=jax.dtypes.float0)
    zero_m1 = jnp.zeros_like(mask1, dtype=jax.dtypes.float0)
    return d_pc0, d_pc1, zero_m0, zero_m1


_chamfer_nn.defvjp(_chamfer_nn_fwd, _chamfer_nn_bwd)


# full-scale AV2 clouds cross this; 16k² brute ≈ 13 ms on v5e and grows
# quadratically, while the grid pass stays ~linear in N+M
_AUTO_GRID_PAIRS = 1 << 28  # 16384²


def _resolve_spec(method: str, n: int, m: int, truncate: Optional[float],
                  spec: Optional[NNSpec]) -> NNSpec:
    if spec is not None:
        return spec
    if method == "auto":
        method = ("grid" if truncate is not None and n * m > _AUTO_GRID_PAIRS
                  else "brute")
    if method == "grid":
        # ring·cell >= truncate keeps the truncated loss exact: any true NN
        # farther than ring·cell is clipped to truncate² regardless
        cell = max(float(truncate or 2.0), 0.5)
        return NNSpec(method="grid", cell=cell, ring=1)
    return NNSpec(method=method)


def chamfer_distance(
    pc0: jnp.ndarray,
    pc1: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    tile: int = 2048,
    return_idx: bool = False,
    method: str = "brute",
    truncate: Optional[float] = None,
    spec: Optional[NNSpec] = None,
):
    """Bidirectional squared nearest-neighbor distances.

    Args:
        pc0: [N, 3] or [B, N, 3]; pc1: [M, 3] or [B, M, 3]; mask0/mask1 mark
        real (non-padding) points.
        method: ``"brute"`` (exact), ``"grid"`` (coarse-grid pruned — exact
        only below the grid radius, see :class:`NNSpec`), or ``"auto"``
        (grid iff ``truncate`` is given and the pair count is large).
        spec: full :class:`NNSpec` override (wins over method/tile/truncate).
    Returns:
        (dist0, dist1) squared NN distances (0 where masked out), and
        optionally the matching (idx0, idx1).  Matches the reference CUDA
        extension's (dist1, dist2, idx1, idx2) contract.  Differentiable via
        the matched-pair subgradient.
    """
    batched = pc0.ndim == 3
    if mask0 is None:
        mask0 = jnp.ones(pc0.shape[:-1], bool)
    if mask1 is None:
        mask1 = jnp.ones(pc1.shape[:-1], bool)
    pc0 = jnp.where(mask0[..., None], pc0, 0.0).astype(jnp.float32)
    pc1 = jnp.where(mask1[..., None], pc1, 0.0).astype(jnp.float32)

    rspec = _resolve_spec(method, pc0.shape[-2], pc1.shape[-2], truncate, spec)
    if rspec.method == "brute" and tile != 2048:
        rspec = rspec._replace(tile=tile)
    if rspec.method == "grid":
        # flat-batch implementation (handles [B, N, 3] natively; see
        # _grid_search for why it is not vmapped)
        up = (lambda x: x) if batched else (lambda x: x[None])
        out = _chamfer_nn_grid(up(pc0), up(pc1), up(mask0), up(mask1), rspec)
        d0, d1, i0, i1 = (x if batched else x[0] for x in out)
    elif batched:
        fn = functools.partial(_chamfer_nn, spec=rspec)
        d0, d1, i0, i1 = jax.vmap(fn)(pc0, pc1, mask0, mask1)
    else:
        d0, d1, i0, i1 = _chamfer_nn(pc0, pc1, mask0, mask1, rspec)
    if return_idx:
        return d0, d1, i0, i1
    return d0, d1


def truncated_chamfer_loss(
    pc0: jnp.ndarray,
    pc1: jnp.ndarray,
    mask0: jnp.ndarray,
    mask1: jnp.ndarray,
    truncate: float = 2.0,
    method: str = "auto",
) -> jnp.ndarray:
    """Mean truncated chamfer (distances above ``truncate`` meters clipped).

    The self-supervised (SeFlow-lineage) training signal built on the chamfer
    extension.  ``method="auto"`` switches to the coarse-grid search at full
    AV2 scale — exact for this loss (clipping hides everything beyond the
    grid radius) modulo per-cell capacity overflow.
    """
    d0, d1 = chamfer_distance(pc0, pc1, mask0, mask1,
                              method=method, truncate=truncate)
    t2 = truncate * truncate
    d0 = jnp.minimum(d0, t2)
    d1 = jnp.minimum(d1, t2)
    n0 = jnp.maximum(jnp.sum(mask0), 1)
    n1 = jnp.maximum(jnp.sum(mask1), 1)
    return jnp.sum(d0) / n0 + jnp.sum(d1) / n1
