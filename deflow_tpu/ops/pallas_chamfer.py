"""Pallas TPU kernel: brute-force nearest-neighbor (chamfer) distances.

TPU rebuild of the reference's ``chamfer3D`` CUDA extension (reference
README.md:39; SURVEY.md §2.3 native component #2).  The XLA ``lax.scan``
formulation in ops/chamfer.py round-trips every [N, TILE] distance tile
through HBM; this kernel keeps the query set resident in VMEM (transposed
[8, M] slab, ~4 MB at 131k points) and fuses distance + running min/argmin
per p-tile, so HBM traffic is one read of p and one write of (dist, idx) —
the op is pure compute.

Shape of the compute per grid step (one TILE_N slice of p):
    d[i, j] = |p_i|^2 + |q_j|^2 - 2 p_i . q_j        (cross term on the MXU,
                                                      K = 8 sublanes)
    best    = min_j d[i, j],  argmin tracked alongside (exact to 2^24 as f32)

Masking contract: the CALLER folds invalid q points to a far sentinel
coordinate (so their distances are astronomically large) and masks invalid
p rows of the output.  Exactness: distances are f32; ties break toward the
lower index (matches ``jnp.argmin``).

Like the CUDA extension, this is O(N*M) — tens of ms at 131k x 131k.  The
chamfer consumers (SeFlow-family SSL losses) are throughput-bound on it on
any backend; see ops/chamfer.py for the dispatch policy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 1024   # query rows per grid step
CHUNK_M = 1024  # reference points processed per inner iteration
_FAR = 1.0e6    # sentinel coordinate for masked reference points


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _chamfer_kernel(p_ref, qt_ref, out_ref):
    """p_ref [TILE_N, 8] lanes (x,y,z,|p|²,...); qt_ref [8, M_pad] sublanes
    (x,y,z,|q|²,...); out_ref [TILE_N, 128] lanes (dist, idx, ...)."""
    m_pad = qt_ref.shape[1]
    px = p_ref[:, 0:1]
    py = p_ref[:, 1:2]
    pz = p_ref[:, 2:3]
    p2 = p_ref[:, 3:4]

    def body(j, carry):
        best, bidx = carry
        sl = pl.ds(j * CHUNK_M, CHUNK_M)
        qx = qt_ref[0:1, sl]
        qy = qt_ref[1:2, sl]
        qz = qt_ref[2:3, sl]
        q2 = qt_ref[3:4, sl]
        # cross terms as broadcast outer products on the VPU
        d = p2 + q2 - 2.0 * (px * qx + py * qy + pz * qz)
        tile_min = jnp.min(d, axis=1, keepdims=True)
        local = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None] + j * CHUNK_M
        take = tile_min < best
        return (jnp.where(take, tile_min, best),
                jnp.where(take, local, bidx))

    best0 = jnp.full((TILE_N, 1), 3.0e38, jnp.float32)
    bidx0 = jnp.zeros((TILE_N, 1), jnp.int32)
    best, bidx = jax.lax.fori_loop(0, m_pad // CHUNK_M, body, (best0, bidx0))
    # single full-lane store (".at[].set" would lower to an unsupported
    # scatter primitive in Mosaic)
    pad = jnp.zeros((TILE_N, out_ref.shape[1] - 2), jnp.float32)
    out_ref[:] = jnp.concatenate(
        [jnp.maximum(best, 0.0), bidx.astype(jnp.float32), pad], axis=1)


@functools.partial(jax.jit, static_argnames=())
def _chamfer_min_single(p: jnp.ndarray, q: jnp.ndarray):
    """min/argmin squared distance from each p row to the q set.

    p [N, 3] f32, q [M, 3] f32 (masked q pre-folded to the _FAR sentinel).
    Returns (dist [N] f32, idx [N] i32).
    """
    n, m = p.shape[0], q.shape[0]
    n_pad = _round_up(n, TILE_N)
    m_pad = _round_up(m, CHUNK_M)

    p = p.astype(jnp.float32)
    q = q.astype(jnp.float32)
    p_slab = jnp.zeros((n_pad, 8), jnp.float32)
    p_slab = p_slab.at[:n, :3].set(p)
    p_slab = p_slab.at[:n, 3].set(jnp.sum(p * p, axis=-1))
    qt = jnp.full((8, m_pad), _FAR, jnp.float32)
    qt = qt.at[:3, :m].set(q.T)
    q2 = jnp.sum(q * q, axis=-1)
    qt = qt.at[3, :m].set(q2)
    qt = qt.at[3, m:].set(3.0e38)  # padded q: infinite distance

    out = pl.pallas_call(
        _chamfer_kernel,
        grid=(n_pad // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, 8), lambda k: (k, 0)),
            pl.BlockSpec((8, m_pad), lambda k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_N, 128), lambda k: (k, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(p_slab, qt)
    return out[:n, 0], out[:n, 1].astype(jnp.int32)


def chamfer_min_pallas(p: jnp.ndarray, q: jnp.ndarray,
                       q_mask: jnp.ndarray):
    """Masked nearest-neighbor search, Pallas path.

    p [..., N, 3]; q [..., M, 3]; q_mask [..., M] bool.  Leading batch dims
    run as an unrolled loop (each sample owns the full grid).  Returns
    (dist [..., N] f32 squared distances, idx [..., N] i32).
    """
    q = jnp.where(q_mask[..., None], q, _FAR)
    if p.ndim == 3:
        outs = [_chamfer_min_single(p[b], q[b]) for b in range(p.shape[0])]
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]))
    return _chamfer_min_single(p, q)
