"""SE(3) pose utilities for ego-motion compensation.

The reference compensates ego motion before voxelization: ``pose_0to1 =
cal_pose0to1(pose0, pose1)`` then rigidly transforms pc0 into frame 1 and keeps
``pose_flow = transform_pc0 - pc0`` (reference deflow.py:55-78).  Poses are
ego->city 4x4 matrices, so ``pose_0to1 = inv(pose1) @ pose0`` with the inverse
formed analytically from the rotation transpose (numerically exact for SE(3),
no general matrix inverse on device).
"""

from __future__ import annotations

import jax.numpy as jnp


def _se3_inverse(pose: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of a 4x4 SE(3) matrix (..., 4, 4)."""
    rot_t = jnp.swapaxes(pose[..., :3, :3], -1, -2)
    trans = pose[..., :3, 3]
    inv_trans = -jnp.einsum("...ij,...j->...i", rot_t, trans)
    top = jnp.concatenate([rot_t, inv_trans[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), pose.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def cal_pose0to1(pose0: jnp.ndarray, pose1: jnp.ndarray) -> jnp.ndarray:
    """Relative pose mapping frame-0 ego coordinates into frame 1.

    Mirrors the reference helper used at deflow.py:67 (ego->city poses).
    Supports leading batch dims.
    """
    return _se3_inverse(pose1) @ pose0


def transform_points(points: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 rigid transform to (..., N, 3) points.

    ``p @ R^T + t`` exactly as the reference applies pose_0to1
    (deflow.py:72).
    """
    rot = pose[..., :3, :3]
    trans = pose[..., :3, 3]
    return jnp.einsum("...nj,...ij->...ni", points, rot) + trans[..., None, :]
