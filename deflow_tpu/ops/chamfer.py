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


def _use_pallas() -> bool:
    from deflow_tpu.ops.voxel import _use_pallas as up

    return up()


def _nn_search(p, q, q_mask, tile):
    """Backend dispatch: (dist [N] f32 squared, idx [N] i32)."""
    if _use_pallas():
        from deflow_tpu.ops.pallas_chamfer import chamfer_min_pallas

        return chamfer_min_pallas(p, q, q_mask)
    return _min_dist_tiled(p, q, q_mask, tile)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _chamfer_nn(pc0, pc1, mask0, mask1, tile):
    """Bidirectional masked NN: (d0 [N], d1 [M], i0 [N], i1 [M])."""
    d0, i0 = _nn_search(pc0, pc1, mask1, tile)
    d1, i1 = _nn_search(pc1, pc0, mask0, tile)
    d0 = jnp.where(mask0, d0, 0.0)
    d1 = jnp.where(mask1, d1, 0.0)
    return d0, d1, i0, i1


def _chamfer_nn_fwd(pc0, pc1, mask0, mask1, tile):
    out = _chamfer_nn(pc0, pc1, mask0, mask1, tile)
    d0, d1, i0, i1 = out
    return out, (pc0, pc1, mask0, mask1, i0, i1)


def _chamfer_nn_bwd(tile, res, cts):
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
        pc0: [N, 3] or [B, N, 3]; pc1: [M, 3] or [B, M, 3]; mask0/mask1 mark
        real (non-padding) points.
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

    fn = functools.partial(_chamfer_nn, tile=tile)
    if batched:
        d0, d1, i0, i1 = jax.vmap(fn)(pc0, pc1, mask0, mask1)
    else:
        d0, d1, i0, i1 = fn(pc0, pc1, mask0, mask1)
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
