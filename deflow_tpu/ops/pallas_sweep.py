"""Pallas TPU kernel: cell-sweep grid nearest-neighbor (SSL chamfer core).

The third-generation TPU backend for the reference's brute-force ``chamfer3D``
CUDA extension (reference README.md:39) at full AV2 scale.  The XLA grid
backend (ops/chamfer.py ``_grid_search``) is already ~linear, but its three
cost centers are XLA lowering artifacts, not algorithmic:

- capacity-table builds: ``lax.gather`` with ``slice_sizes=(cap,)`` lowers to
  a 10k-iteration while-loop of dynamic-update-slices (~6 ms × 10 tables);
- ring-concat rows: 9 rolls + concat materialize an 18 KB row per CELL;
- the query scan row-gathers one 18 KB ring row per QUERY chunk element
  (~7.2 GB/step of descriptor-bound gather traffic).

This kernel keeps the candidates as ONE sorted flat array and sweeps it:

1. both clouds are payload-sorted by a flat cell id with a GAP ROW per
   sample (stride ``(gy+1)·gx``), so a chunk of ``CHUNK_Q`` consecutive
   sorted queries spans a contiguous cell range [qmin, qmax] whose 3×3 ring
   is THREE contiguous candidate-row spans (rows qmin−gx−1…qmax−gx+1 / ±0 /
   +gx), found by searchsorted outside the kernel and passed as
   scalar-prefetch chunk ranges.  There is NO per-cell capacity: the kernel
   is exact below ``ring·cell`` with no overflow drops (the XLA backend's
   ``capacity=128`` caveat disappears on this path);
2. candidate VALIDITY is folded into the DISTANCE, not tested per pair
   (the v1 kernel's ``|Δrow| ≤ 1 & |Δcol| ≤ 1`` ring/sample test cost 8 of
   its 22 full-width VPU passes per candidate chunk): a 4th coordinate lane
   ``w = sample·wstep`` with ``wstep = max(1000, 2·ring·cell)`` (exact small
   floats, set by the producer chamfer._sweep_dir; masked/padding rows
   ``∓2e19``) makes cross-sample and padding pairs lose by construction
   (``Δw² ≥ (2·ring·cell)² > radius²`` — cross-sample pairs lose everywhere
   the exactness contract speaks; same-sample ``Δw = 0`` exactly so in-ring
   distances are bit-identical), while ring-overreach candidates admitted by the window
   spans (|Δcol| ≥ 2, row wraps) carry REAL coordinates at least one cell
   away — their ``d ≥ cell² ≥ truncate²`` can only tighten the reported
   min toward the true NN, never below ``ring·cell`` when the true NN is
   farther (truncated chamfer and its matched-pair VJP are unchanged: the
   loss clips at ``t2 ≤ cell²`` and g = 0 there);
3. the kernel DMAs ``[8, CHUNK_C]`` candidate blocks (coordinate-major lanes:
   x/y/z/w/flag-penalty/orig-row planes) HBM→VMEM with the 3-slot rotation
   the scatter/gather kernels use, and tracks per-query running
   (min d², argmin orig row) — plus the flag-restricted pair for the fused
   dual-mask SSL loss, whose flag select is likewise precomputed as an
   additive penalty lane (``d_flag = d + fpen``, ``fpen ∈ {0, 3e38}`` —
   adding 0.0 is exact, and ``d + 3e38`` rounds to ≥ the ``_BIG`` no-
   candidate sentinel) — entirely on the VPU in f32 (no MXU, no precision
   caveats).  16 full-width VPU passes per [CHUNK_Q, CHUNK_C] block on
   DIRTY chunks; CLEAN chunks (windows provably confined to the query's own
   sample rows — the caller's row-space check, ~94-98% of chunks) skip the
   3 w-lane passes and run 13, relying on ±2e19 coordinate sentinels for
   masked/padding rows (d overflows to inf).

Total HBM traffic ≈ (一 sweep of the candidate slab per ~gx query chunks)
≈ 100 MB/direction vs 7.2 GB of ring-row gathers — and the span-table while
loops vanish because there are no tables.

Results come back in sorted-query order; the caller unsorts with one payload
sort keyed by the carried original row ids (see chamfer.py ``_sweep_dir``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Swept on v5e (standalone _ssl_nn @4x98304, v2 16-pass kernel): CHUNK_C
# (256→512) is fwd 25.19→22.85 ms uniform / 37.1→29.8 skewed (the dense
# regime is DMA-per-block bound; 512-row blocks halve the fixed cost),
# 1024 tips back (25.6 — window rows quantize up); CHUNK_Q 512 loses badly
# (29.7), 128 loses (24.1 grad-side).  (256, 512) is the shipped default.
# Env knobs exist for sweeps only — the caller's slab/window layout adapts.
CHUNK_Q = int(os.environ.get("DEFLOW_SWEEP_CHUNK_Q", 256))  # queries/grid step
CHUNK_C = int(os.environ.get("DEFLOW_SWEEP_CHUNK_C", 512))  # cand rows/DMA
_BIG = 3.0e38

# candidate slab lane order (coordinate-major planes); w = sample-isolation
# coordinate, fpen = additive dual-mask penalty (0 flagged / _BIG not)
_CX, _CY, _CZ, _CW, _CFPEN, _CORIG = range(6)
_CLANES = 8
# query slab lane order
_QX, _QY, _QZ, _QW = range(4)
_QLANES = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(dual: bool):
    def _sweep_kernel(cs_ref, cn_ref, first_ref, total_ref, dirty_ref,
                      q_ref, c_hbm, out_ref, wbuf, sems, slot_ref):
        k = pl.program_id(0)
        nk = pl.num_programs(0)
        total = total_ref[k]

        def dma(s, idx):
            return pltpu.make_async_copy(c_hbm.at[idx], wbuf.at[s], sems.at[s])

        def chunk_idx(t):
            """Map flat iteration t to the candidate chunk index across the
            three ring-row windows (scalar select chain).  cs/cn are FLAT
            [3·nk] arrays: 2-D SMEM operands pad their minor dim to 128
            (a [nk, 3] i32 prefetch costs 512·nk bytes of 1 MB SMEM)."""
            c0 = cn_ref[3 * k]
            c01 = c0 + cn_ref[3 * k + 1]
            return jnp.where(
                t < c0, cs_ref[3 * k] + t,
                jnp.where(t < c01, cs_ref[3 * k + 1] + (t - c0),
                          cs_ref[3 * k + 2] + (t - c01)))

        @pl.when(k == 0)
        def _():
            slot_ref[0] = 0

            @pl.when(total > 0)
            def _():
                dma(0, first_ref[k]).start()

        s0 = slot_ref[0]
        # successor's first block lands after this chunk's last block
        # (3-slot rotation; ≤2-block chunks prefetch across the grid step)
        s_succ = jax.lax.rem(s0 + total, 3)
        kn = jnp.minimum(k + 1, nk - 1)
        do_pref = (k + 1 < nk) & (total_ref[kn] > 0)

        @pl.when(do_pref & (total <= 2))
        def _():
            dma(s_succ, first_ref[kn]).start()

        # query lanes, sublane-major [CHUNK_Q, 1]
        qx = q_ref[:, _QX:_QX + 1]
        qy = q_ref[:, _QY:_QY + 1]
        qz = q_ref[:, _QZ:_QZ + 1]
        qw = q_ref[:, _QW:_QW + 1]

        def contrib(s, carry, with_w):
            cb = wbuf[s]                                   # [8, CHUNK_C]
            dx = qx - cb[_CX:_CX + 1, :]                   # [CHUNK_Q, CHUNK_C]
            dy = qy - cb[_CY:_CY + 1, :]
            dz = qz - cb[_CZ:_CZ + 1, :]
            da = dx * dx + dy * dy + dz * dz
            if with_w:
                # the w lane IS the validity test on DIRTY chunks (windows
                # that cross sample row ranges): Δw = 0 exactly for same-
                # sample pairs (sum grouping keeps d bit-identical to 3-D),
                # ≥ 2·ring·cell across samples, overflow-to-inf against
                # padding rows.  CLEAN chunks (~94-98%, flagged by the
                # caller's row-space window check) skip its 3 VPU passes:
                # their windows only admit same-sample or sentinel-
                # coordinate (masked/padding, ±2e19 → d = inf) rows.
                dw = qw - cb[_CW:_CW + 1, :]
                da = da + dw * dw
            crow = cb[_CORIG:_CORIG + 1, :]

            def best_of(dm, b, bi):
                m = jnp.min(dm, axis=1, keepdims=True)     # [CHUNK_Q, 1]
                i = jnp.max(jnp.where(dm <= m, crow, -1.0),
                            axis=1, keepdims=True)
                take = m < b
                return jnp.where(take, m, b), jnp.where(take, i, bi)

            ba, bia, bf, bif = carry
            ba, bia = best_of(da, ba, bia)
            if dual:
                bf, bif = best_of(da + cb[_CFPEN:_CFPEN + 1, :], bf, bif)
            return ba, bia, bf, bif

        def sweep(with_w):
            def body(t, carry):
                *best, s = carry
                nxt = jax.lax.rem(s + 1, 3)

                @pl.when(t + 1 < total)
                def _():
                    dma(nxt, chunk_idx(t + 1)).start()

                dma(s, chunk_idx(t)).wait()
                return (*contrib(s, tuple(best), with_w), nxt)

            big = jnp.full((CHUNK_Q, 1), _BIG, jnp.float32)
            neg = jnp.full((CHUNK_Q, 1), -1.0, jnp.float32)
            return jax.lax.fori_loop(
                0, total, body, (big, neg, big, neg, s0))

        ba, bia, bf, bif, _ = jax.lax.cond(
            dirty_ref[k] > 0, lambda: sweep(True), lambda: sweep(False))

        @pl.when(do_pref & (total > 2))
        def _():
            dma(s_succ, first_ref[kn]).start()

        slot_ref[0] = s_succ
        out_ref[:] = jnp.concatenate(
            [ba, bia, bf, bif, jnp.zeros((CHUNK_Q, 4), jnp.float32)], axis=1)

    return _sweep_kernel


@functools.partial(jax.jit, static_argnames=("dual",))
def cell_sweep_pallas(q_slab: jnp.ndarray, c_slab: jnp.ndarray,
                      cs: jnp.ndarray, cn: jnp.ndarray,
                      dirty: jnp.ndarray | None = None, dual: bool = True):
    """Low-level sweep call.

    Args:
        q_slab: [NQ_pad, 8] f32, NQ_pad % CHUNK_Q == 0 — sorted queries,
            lanes (x, y, z, w, …); w is the sample-isolation coordinate
            (sample·wstep, wstep = max(1000, 2·ring·cell) — see
            chamfer._sweep_dir — as exact small floats; masked/sentinel:
            +2e19).
        c_slab: [NC_chunks, 8, CHUNK_C] f32 — sorted candidates, coordinate-
            major planes (x, y, z, w, fpen, orig_row); w as above with
            masked/padding rows −2e19, fpen = 0 where dual-flagged else
            ``_BIG``.
        cs: [NQ_pad/CHUNK_Q, 3] i32 — per query chunk, candidate-chunk start
            index of each ring-row window.
        cn: [NQ_pad/CHUNK_Q, 3] i32 — candidate-chunk count per window.
        dirty: [NQ_pad/CHUNK_Q] i32 — 1 where the chunk's windows can admit
            OTHER-SAMPLE candidate rows (the w-lane validity passes run only
            there; see chamfer._sweep_call).  None = all dirty (the always-
            correct conservative default: w defuses every foreign row).
            CALLER CONTRACT for 0-chunks: every window row is either the
            query's own sample or carries ±2e19 sentinel coordinates.
    Returns:
        [NQ_pad, 8] f32: lanes (d_all, i_all, d_flag, i_flag, 0…) per sorted
        query; d = squared NN distance (``3e38`` when no candidate), i = the
        matched candidate's orig_row lane (−1 when none).
    """
    nq_pad = q_slab.shape[0]
    num_chunks = nq_pad // CHUNK_Q
    total = jnp.sum(cn, axis=1).astype(jnp.int32)
    if dirty is None:
        dirty = jnp.ones((num_chunks,), jnp.int32)
    # first DMA block = start of the first non-empty window
    first = jnp.where(cn[:, 0] > 0, cs[:, 0],
                      jnp.where(cn[:, 1] > 0, cs[:, 1], cs[:, 2]))
    first = jnp.clip(first, 0, c_slab.shape[0] - 1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((CHUNK_Q, _QLANES), lambda k, *_: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),          # candidates, HBM
        ],
        out_specs=pl.BlockSpec(
            (CHUNK_Q, 8), lambda k, *_: (k, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, _CLANES, CHUNK_C), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SMEM((1,), jnp.int32),                   # DMA slot carry
        ],
    )
    return pl.pallas_call(
        _make_kernel(dual),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq_pad, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(cs.astype(jnp.int32).reshape(-1), cn.astype(jnp.int32).reshape(-1),
      first, total, dirty.astype(jnp.int32), q_slab, c_slab)
