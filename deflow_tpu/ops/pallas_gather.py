"""Pallas TPU kernel: sorted row gather (the unpillar / scatter-VJP hot op).

XLA lowers ``table[ids]`` row gathers at a fixed ~15 ns per ROW on v5e
regardless of row width (descriptor-bound): the three flat gathers in the
train step (decoder unpillar forward + the two embedder scatter-VJP gathers,
reference decoder.py:34-37 / mmcv DynamicScatter backward) cost ~16 ms at
393k rows each.  With HOST-SORTED ascending ids (the production
``attach_host_prep(sort=True)`` path) the gather has sequential structure XLA
cannot see:

1. grid over *output* point chunks (CHUNK_N sorted rows each).  Ascending ids
   mean each chunk's rows live in ONE contiguous table-row window
   ``[min_id, max_id]`` — scalar-prefetched as W-aligned window indices;
2. each chunk streams its windows ([W, C] table slabs) HBM→VMEM with the same
   3-slot DMA rotation as the scatter kernel (successor chunk's first window
   prefetches while the current chunk computes);
3. rows materialize as ``one_hot(id − window_base) @ window`` — an MXU
   matmul — so no per-row copy instruction exists anywhere.  Across chunks
   the windows sweep the table monotonically: total traffic ≈ one table read
   + one output write, the bandwidth bound.

Ids ≥ ``num_rows`` (per-sample trash sentinels, padding) read exact zeros —
the same contract as the clip+mask XLA path.  Sample-boundary chunks (tail
sentinels of sample b followed by the first ids of sample b+1) stay correct:
the window spans the contiguous flat-id gap, sentinels match no window row.

Precision mirrors the scatter kernel: bf16 tables use the native MXU pass
(one-hot × bf16 products are exact), f32 tables force HIGHEST.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK_N = 1024   # sorted output rows per grid step (matches XLA's T(1024)
                 # tiling for the 1D s32 ids operand — Mosaic requires it)
W = 512          # table rows per window DMA (swept: 512 ~ 1024)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(num_rows: int, f32: bool, bound_check: bool):
    def _gather_kernel(j0_ref, nwin_ref, ids_ref, tbl_hbm, out_ref,
                       wbuf, sems, slot_ref):
        k = pl.program_id(0)
        nk = pl.num_programs(0)
        j0 = j0_ref[k]
        nwin = nwin_ref[k]
        c_pad = out_ref.shape[1]

        def dma(s, j):
            return pltpu.make_async_copy(tbl_hbm.at[j], wbuf.at[s], sems.at[s])

        @pl.when(k == 0)
        def _():
            slot_ref[0] = 0

            @pl.when(nwin > 0)
            def _():
                dma(0, j0).start()

        s0 = slot_ref[0]
        # successor's first window lands after this chunk's last window
        # (3-slot rotation; 1-2 window chunks — the common case — prefetch
        # across the grid step, overlapping DMA with this chunk's compute)
        s_succ = jax.lax.rem(s0 + nwin, 3)
        kn = jnp.minimum(k + 1, nk - 1)
        do_pref = (k + 1 < nk) & (nwin_ref[kn] > 0)

        @pl.when(do_pref & (nwin <= 2))
        def _():
            dma(s_succ, j0_ref[kn]).start()

        ids = ids_ref[:]                                   # [CHUNK_N] int32
        cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK_N, W), 1)

        def contrib(j, s):
            # minor-dim insert only on the i32 ids (Mosaic forbids it on i1)
            idc = ids[:, None]
            keep = cols == idc - j * W
            if bound_check:
                # only when the table has REAL rows beyond num_rows; with
                # num_rows == table rows (every in-tree caller) ids in
                # [num_rows, r_pad) land on zero-padded rows (zeros = the
                # contract) and ids ≥ r_pad are beyond every window — the
                # extra full-width AND pass is pure waste
                keep = keep & (idc < num_rows)
            onehot = keep.astype(wbuf.dtype)
            return jax.lax.dot_general(
                onehot, wbuf[s],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST if f32
                           else jax.lax.Precision.DEFAULT),
            )                                              # [CHUNK_N, c_pad]

        def body(i, carry):
            acc, s = carry
            nxt = jax.lax.rem(s + 1, 3)

            @pl.when(i + 1 < nwin)
            def _():
                dma(nxt, j0 + i + 1).start()

            dma(s, j0 + i).wait()
            return acc + contrib(j0 + i, s), nxt

        acc = jnp.zeros((CHUNK_N, c_pad), jnp.float32)
        acc, _ = jax.lax.fori_loop(0, nwin, body, (acc, s0))

        @pl.when(do_pref & (nwin > 2))
        def _():
            dma(s_succ, j0_ref[kn]).start()

        slot_ref[0] = s_succ
        out_ref[:] = acc.astype(out_ref.dtype)

    return _gather_kernel


@functools.partial(jax.jit, static_argnames=("num_rows", "bound_check"))
def _sorted_gather(table: jnp.ndarray, flat_ids: jnp.ndarray,
                   num_rows: int, bound_check: bool) -> jnp.ndarray:
    """``table [R_pad, C]`` (R_pad % W == 0), ascending ``flat_ids [M_pad]``
    (M_pad % CHUNK_N == 0; ids ≥ num_rows are sentinels) → [M_pad, C]."""
    r_pad, c = table.shape
    m_pad = flat_ids.shape[0]
    num_chunks = m_pad // CHUNK_N
    jmax = r_pad // W - 1

    idsr = flat_ids.reshape(num_chunks, CHUNK_N)
    realr = idsr < num_rows
    big = jnp.int32(2**30)
    lo = jnp.min(jnp.where(realr, idsr, big), axis=1)
    hi = jnp.max(jnp.where(realr, idsr, -1), axis=1)
    any_real = jnp.any(realr, axis=1)
    j0 = jnp.clip(lo // W, 0, jmax).astype(jnp.int32)
    nwin = jnp.where(any_real,
                     jnp.clip(hi // W, 0, jmax) - j0 + 1, 0).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((CHUNK_N,), lambda k, *_: (k,),
                         memory_space=pltpu.VMEM),      # ids
            pl.BlockSpec(memory_space=pltpu.ANY),       # table windows, HBM
        ],
        out_specs=pl.BlockSpec(
            (CHUNK_N, c), lambda k, *_: (k, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, W, c), table.dtype),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SMEM((1,), jnp.int32),                # DMA slot carry
        ],
    )
    return pl.pallas_call(
        _make_kernel(num_rows, table.dtype != jnp.bfloat16, bound_check),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, c), table.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(j0, nwin, flat_ids, table.reshape(r_pad // W, W, c))


def sorted_rows_gather_pallas(
    table: jnp.ndarray, flat_ids: jnp.ndarray, num_rows: int | None = None,
) -> jnp.ndarray:
    """Gather ``table[flat_ids]`` with ids in ascending order (sentinel runs
    ≥ ``num_rows`` allowed anywhere); out-of-range ids read zeros.

    NOT differentiable on its own — callers pair it with the sorted-scatter
    kernel in a custom VJP (gather and segment-sum are each other's
    transpose).  Pads rows/ids to kernel granularity and slices back.
    """
    r, c = table.shape
    m = flat_ids.shape[0]
    num_rows = r if num_rows is None else num_rows
    r_pad = _round_up(r, W)
    c_pad = _round_up(c, 128)   # window DMA slices must be lane-tile aligned
    m_pad = _round_up(m, CHUNK_N)
    if r_pad != r or c_pad != c:
        table = jnp.pad(table, ((0, r_pad - r), (0, c_pad - c)))
    if m_pad != m:
        flat_ids = jnp.pad(flat_ids, (0, m_pad - m),
                           constant_values=jnp.int32(2**30))
    out = _sorted_gather(table, flat_ids.astype(jnp.int32), num_rows,
                         bound_check=num_rows < r)
    return out[:m, :c]
