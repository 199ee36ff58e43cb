"""Voxelizer op tests: golden numpy cross-checks (SURVEY.md §4 test pyramid)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deflow_tpu.ops import (
    VoxelConfig,
    compute_pillar_info,
    pillar_centroids,
    pillar_mean_scatter,
    pseudoimage_gather,
    cal_pose0to1,
    transform_points,
)

CFG = VoxelConfig(voxel_size=(0.2, 0.2, 6.0),
                  point_cloud_range=(-51.2, -51.2, -3.0, 51.2, 51.2, 3.0))


def _numpy_voxelize(points, mask, cfg):
    """Independent dense reference: returns (pillar ids, valid, pseudoimage of means)."""
    w, h, d = cfg.grid_size
    # Binning is specified in f32 (the on-device dtype; the reference's CUDA
    # voxelizer also bins in f32) — an f64 oracle disagrees on bin boundaries.
    lo = np.array(cfg.point_cloud_range[:3], dtype=np.float32)
    vs = np.array(cfg.voxel_size, dtype=np.float32)
    coords = np.floor((points.astype(np.float32) - lo) / vs).astype(np.int64)
    valid = mask.copy()
    for axis, g in enumerate((w, h, d)):
        valid &= (coords[:, axis] >= 0) & (coords[:, axis] < g)
    cx, cy = coords[:, 0], coords[:, 1]
    if cfg.use_s2d:  # s2d id order: cell-major, 2x2-phase-minor
        enc = ((cy // 2) * (w // 2) + cx // 2) * 4 + (cy % 2) * 2 + (cx % 2)
    else:
        enc = cy * w + cx
    pid = np.where(valid, enc, w * h)
    return pid, valid, coords


def test_grid_size_derivation():
    assert CFG.grid_size == (512, 512, 1)
    assert CFG.num_pillars == 512 * 512
    small = VoxelConfig(voxel_size=(0.4, 0.4, 6.0),
                        point_cloud_range=(-51.2, -51.2, -3, 51.2, 51.2, 3))
    assert small.grid_size == (256, 256, 1)


def test_pillar_binning_matches_numpy():
    rng = np.random.default_rng(0)
    n = 4096
    pts = rng.uniform(-60, 60, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-4, 4, size=n)
    mask = np.ones(n, bool)
    mask[-200:] = False  # padding tail
    pts[-200:] = np.nan   # padding is garbage on purpose

    info = compute_pillar_info(jnp.asarray(pts), jnp.asarray(mask), CFG)
    pid_ref, valid_ref, coords_ref = _numpy_voxelize(np.nan_to_num(pts), mask, CFG)

    np.testing.assert_array_equal(np.asarray(info.valid), valid_ref)
    np.testing.assert_array_equal(np.asarray(info.pillar_id), pid_ref)
    yx = np.asarray(info.coords_yx)
    np.testing.assert_array_equal(yx[valid_ref, 0], coords_ref[valid_ref, 1])
    np.testing.assert_array_equal(yx[valid_ref, 1], coords_ref[valid_ref, 0])


def test_boundary_semantics():
    # floor-binning: exactly at range-min is kept, exactly at range-max drops
    pts = np.array([
        [-51.2, -51.2, -3.0],   # min corner -> pillar (0, 0)
        [51.2, 51.2, 2.999],    # at x/y max -> dropped
        [51.1999, 51.1999, 0.0],  # just inside -> pillar (511, 511)
        [0.0, 0.0, 3.0],        # z == max -> dropped
    ], dtype=np.float32)
    mask = np.ones(4, bool)
    info = compute_pillar_info(jnp.asarray(pts), jnp.asarray(mask), CFG)
    valid = np.asarray(info.valid)
    assert valid.tolist() == [True, False, True, False]
    # s2d id order: cell (0,0) phase (0,0) → 0; cell (255,255) phase (1,1)
    assert int(info.pillar_id[0]) == 0
    assert int(info.pillar_id[2]) == (255 * 256 + 255) * 4 + 3


def test_offsets_are_point_minus_pillar_center():
    pts = np.array([[0.05, -0.15, 1.0]], dtype=np.float32)
    info = compute_pillar_info(jnp.asarray(pts), jnp.ones(1, bool), CFG)
    # pillar center: x bin floor((0.05+51.2)/.2)=256 -> center -51.2+(256+.5)*.2 = 0.1
    # y bin floor((-0.15+51.2)/.2)=255 -> center -51.2+255.5*.2 = -0.1
    # z bin 0 -> center -3 + 0.5*6 = 0
    np.testing.assert_allclose(
        np.asarray(info.offsets[0]), [0.05 - 0.1, -0.15 + 0.1, 1.0], atol=1e-5
    )


def test_centroids_and_mean_scatter_match_dense():
    rng = np.random.default_rng(1)
    n, c = 2048, 8
    pts = rng.uniform(-50, 50, size=(n, 3)).astype(np.float32)
    mask = rng.random(n) > 0.1
    feats = rng.normal(size=(n, c)).astype(np.float32)

    info = compute_pillar_info(jnp.asarray(pts), jnp.asarray(mask), CFG)
    counts, cluster = pillar_centroids(info, CFG)
    img = pillar_mean_scatter(jnp.asarray(feats), info, CFG)

    pid = np.asarray(info.pillar_id)
    valid = np.asarray(info.valid)
    h, w = CFG.pseudoimage_hw
    dense = np.zeros((h * w, c))
    cnt = np.zeros(h * w)
    for i in np.nonzero(valid)[0]:
        dense[pid[i]] += feats[i]
        cnt[pid[i]] += 1
    dense[cnt > 0] /= cnt[cnt > 0, None]
    np.testing.assert_allclose(np.asarray(img).reshape(h * w, c), dense, atol=1e-4)

    # per-point counts / centroid offsets
    cents = np.zeros((h * w, 3))
    for i in np.nonzero(valid)[0]:
        cents[pid[i]] += pts[i]
    cents[cnt > 0] /= cnt[cnt > 0, None]
    for i in np.nonzero(valid)[0]:
        np.testing.assert_allclose(np.asarray(cluster)[i], pts[i] - cents[pid[i]], atol=1e-4)
        assert int(np.asarray(counts)[i]) == int(cnt[pid[i]])
    # invalid points contribute nothing and read zeros
    assert np.all(np.asarray(cluster)[~valid] == 0)


def test_gather_roundtrip():
    """Unpillar gather from the flat id-ordered table; cross-checked against
    the (y, x) cell coordinates through image_to_table."""
    from deflow_tpu.ops.voxel import encode_pillar_id, image_to_table

    rng = np.random.default_rng(2)
    c = 4
    ih, iw, m = CFG.image_shape
    img = rng.normal(size=(ih, iw, m * c)).astype(np.float32)
    table = np.asarray(image_to_table(jnp.asarray(img), CFG))
    pts = rng.uniform(-50, 50, size=(512, 3)).astype(np.float32)
    mask = rng.random(512) > 0.2
    info = compute_pillar_info(jnp.asarray(pts), jnp.asarray(mask), CFG)
    out = np.asarray(pseudoimage_gather(
        jnp.asarray(table), info.pillar_id, info.valid))
    yx = np.asarray(info.coords_yx)
    valid = np.asarray(info.valid)
    for i in range(512):
        pid = int(encode_pillar_id(yx[i, 0], yx[i, 1], CFG))
        expect = table[pid] if valid[i] else np.zeros(c)
        np.testing.assert_allclose(out[i], expect, atol=1e-6)


def test_scatter_gather_gradients_flow():
    """Gradient flows through mean-scatter to per-point features (training path)."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(-50, 50, size=(256, 3)).astype(np.float32)
    mask = np.ones(256, bool)
    info = compute_pillar_info(jnp.asarray(pts), jnp.asarray(mask), CFG)

    def f(feats):
        img = pillar_mean_scatter(feats, info, CFG)
        return jnp.sum(img ** 2)

    feats = jnp.asarray(rng.normal(size=(256, 4)).astype(np.float32))
    g = jax.grad(f)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_pose0to1_and_transform():
    rng = np.random.default_rng(4)
    # random SE3 poses
    def rand_pose():
        a = rng.normal(size=3)
        theta = np.linalg.norm(a); k = a / theta
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
        T = np.eye(4); T[:3, :3] = R; T[:3, 3] = rng.normal(size=3) * 10
        return T.astype(np.float64)

    p0, p1 = rand_pose(), rand_pose()
    got = np.asarray(cal_pose0to1(jnp.asarray(p0), jnp.asarray(p1)))
    expect = np.linalg.inv(p1) @ p0
    np.testing.assert_allclose(got, expect, atol=1e-5)

    pts = rng.normal(size=(16, 3))
    moved = np.asarray(transform_points(jnp.asarray(pts), jnp.asarray(expect)))
    expect_pts = pts @ expect[:3, :3].T + expect[:3, 3]
    np.testing.assert_allclose(moved, expect_pts, atol=1e-5)


def test_chamfer_matches_bruteforce():
    from deflow_tpu.ops import chamfer_distance
    rng = np.random.default_rng(5)
    n, m = 300, 500
    p = rng.normal(size=(n, 3)).astype(np.float32)
    q = rng.normal(size=(m, 3)).astype(np.float32)
    mp = rng.random(n) > 0.1
    mq = rng.random(m) > 0.1
    d0, d1, i0, i1 = chamfer_distance(jnp.asarray(p), jnp.asarray(q),
                                      jnp.asarray(mp), jnp.asarray(mq),
                                      tile=128, return_idx=True)
    full = ((p[:, None, :] - q[None, :, :]) ** 2).sum(-1)
    full[:, ~mq] = np.inf
    np.testing.assert_allclose(np.asarray(d0)[mp], full.min(1)[mp], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i0)[mp], full.argmin(1)[mp])
    assert np.all(np.asarray(d0)[~mp] == 0)
    fullT = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    fullT[:, ~mp] = np.inf
    np.testing.assert_allclose(np.asarray(d1)[mq], fullT.min(1)[mq], rtol=1e-4, atol=1e-4)
