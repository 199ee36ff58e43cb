"""Chamfer / nearest-neighbor distance between point sets.

TPU rebuild of the reference's brute-force ``chamfer3D`` CUDA extension
(reference README.md:39; SURVEY.md §2.3 native component #2), used by the
zeroflow/seflow-family losses and DUFO label generation.

Design: the N x M pairwise-distance problem is expressed as
``|p|^2 + |q|^2 - 2 p.q`` so the dominant term is a matmul that lands on the
MXU, and the min-reduction is tiled over the M axis with ``lax.scan`` to bound
memory at ``N x TILE`` instead of ``N x M``.  Masked (padding) points are
excluded with +inf sentinels on the query side and zeroed contributions on the
reduction side.  A Pallas double-buffered variant can replace `_min_dist_tiled`
after profiling; semantics are fixed by the tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = 3.0e38  # finite +inf stand-in (keeps bf16/f32 arithmetic NaN-free)


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
        d = (
            p_sq[:, None]
            + q_sq[None, :]
            - 2.0 * jnp.dot(p, q_t.T, preferred_element_type=jnp.float32)
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


@functools.partial(jax.jit, static_argnames=("tile", "return_idx"))
def chamfer_distance(
    pc0: jnp.ndarray,
    pc1: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    tile: int = 2048,
    return_idx: bool = False,
):
    """Bidirectional squared nearest-neighbor distances.

    Args:
        pc0: [N, 3]; pc1: [M, 3]; mask0/mask1 mark real (non-padding) points.
    Returns:
        (dist0 [N], dist1 [M]) squared NN distances (0 where masked out), and
        optionally the matching (idx0, idx1).  Matches the reference CUDA
        extension's (dist1, dist2, idx1, idx2) contract.
    """
    if mask0 is None:
        mask0 = jnp.ones(pc0.shape[:1], bool)
    if mask1 is None:
        mask1 = jnp.ones(pc1.shape[:1], bool)
    pc0 = jnp.where(mask0[:, None], pc0, 0.0).astype(jnp.float32)
    pc1 = jnp.where(mask1[:, None], pc1, 0.0).astype(jnp.float32)

    d0, i0 = _min_dist_tiled(pc0, pc1, mask1, tile)
    d1, i1 = _min_dist_tiled(pc1, pc0, mask0, tile)
    d0 = jnp.where(mask0, d0, 0.0)
    d1 = jnp.where(mask1, d1, 0.0)
    if return_idx:
        return d0, d1, i0, i1
    return d0, d1


def truncated_chamfer_loss(
    pc0: jnp.ndarray,
    pc1: jnp.ndarray,
    mask0: jnp.ndarray,
    mask1: jnp.ndarray,
    truncate: float = 2.0,
) -> jnp.ndarray:
    """Mean truncated chamfer (distances above ``truncate`` meters clipped).

    The self-supervised (SeFlow-lineage) training signal built on the chamfer
    extension.
    """
    d0, d1 = chamfer_distance(pc0, pc1, mask0, mask1)
    t2 = truncate * truncate
    d0 = jnp.minimum(d0, t2)
    d1 = jnp.minimum(d1, t2)
    n0 = jnp.maximum(jnp.sum(mask0), 1)
    n1 = jnp.maximum(jnp.sum(mask1), 1)
    return jnp.sum(d0) / n0 + jnp.sum(d1) / n1
