"""Native (C++/ctypes) host-op tests: equivalence with the numpy fallback."""

import numpy as np
import pytest

from deflow_tpu.utils import native


requires_lib = pytest.mark.skipif(native.get_lib() is None,
                                  reason="libpointops.so not built")


@requires_lib
def test_select_pad_matches_numpy():
    rng = np.random.default_rng(0)
    n, m = 5000, 4096
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    ground = (rng.random(n) < 0.2).astype(np.uint8)
    flow = rng.normal(size=(n, 3)).astype(np.float32)
    labels = rng.integers(0, 30, n).astype(np.int32)
    valid = rng.random(n) < 0.9

    got = native.select_pad(pts, ground, m, flow=flow, labels=labels, valid=valid)

    keep = ~ground.astype(bool)
    sel = np.flatnonzero(keep)[:m]
    np.testing.assert_array_equal(got[0][: len(sel)], pts[sel])
    assert got[1].sum() == len(sel)
    np.testing.assert_array_equal(got[2][: len(sel)], flow[sel])
    np.testing.assert_array_equal(got[3][: len(sel)], labels[sel])
    np.testing.assert_array_equal(got[4][: len(sel)], valid[sel])
    assert got[5] == keep.sum()
    # padding zeroed
    assert np.all(got[0][len(sel):] == 0) and not got[1][len(sel):].any()


@requires_lib
def test_select_pad_crop():
    pts = np.arange(300, dtype=np.float32).reshape(100, 3)
    out_p, out_m, *_, kept = native.select_pad(pts, None, 10)
    assert kept == 100 and out_m.all() and out_m.shape == (10,)
    np.testing.assert_array_equal(out_p, pts[:10])


@requires_lib
def test_se3_transform_matches_numpy():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    pose = np.eye(4)
    pose[:3, 3] = [1, -2, 3]
    theta = 0.3
    pose[:2, :2] = [[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]]
    got = native.se3_transform(pts, pose)
    want = pts @ pose[:3, :3].T + pose[:3, 3]
    np.testing.assert_allclose(got, want, atol=1e-5)


@requires_lib
def test_bin_points_matches_voxel_semantics():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-60, 60, (4096, 3)).astype(np.float32)
    vmin = np.array([-51.2, -51.2, -3.0], np.float32)
    vsize = np.array([0.2, 0.2, 6.0], np.float32)
    grid = np.array([512, 512, 1], np.int32)
    coords, ok = native.bin_points(pts, vmin, vsize, grid)
    c_ref = np.floor((pts - vmin) / vsize).astype(np.int64)
    ok_ref = ((c_ref >= 0) & (c_ref < grid)).all(axis=1)
    np.testing.assert_array_equal(ok, ok_ref)
    np.testing.assert_array_equal(coords[ok], c_ref[ok])


def test_pillar_prep_matches_numpy():
    rng = np.random.default_rng(3)
    n = 4096
    pts = rng.uniform(-60, 60, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-4, 4, n)
    mask = np.ones(n, bool); mask[-100:] = False
    pts[-100:] = np.nan
    vmin = [-51.2, -51.2, -3.0]; vsize = [0.2, 0.2, 6.0]; grid = [512, 512, 1]

    pid, order, iperm, sid = native.pillar_prep(pts, mask, vmin, vsize, grid)

    # reference binning (f32)
    rel = np.floor((np.nan_to_num(pts) - np.asarray(vmin, np.float32))
                   / np.asarray(vsize, np.float32))
    ok = mask & ((rel >= 0) & (rel < np.asarray(grid))).all(1)
    c = rel.astype(np.int64)
    cx, cy = c[:, 0], c[:, 1]
    # s2d id order on the even 512-grid (matches ops/voxel.encode_pillar_id)
    enc = ((cy // 2) * 256 + cx // 2) * 4 + (cy % 2) * 2 + (cx % 2)
    want_pid = np.where(ok, enc, 512 * 512)
    np.testing.assert_array_equal(pid, want_pid)

    # order sorts stably, iperm inverts, sorted_id consistent
    assert (np.diff(pid[order]) >= 0).all()
    np.testing.assert_array_equal(order[iperm], np.arange(n))
    np.testing.assert_array_equal(iperm[order], np.arange(n))
    np.testing.assert_array_equal(sid, pid[order])
    # stability: equal ids keep original relative order
    same = pid[order]
    for b in np.unique(same[:50]):
        idxs = order[same == b]
        assert (np.diff(idxs) > 0).all()


def test_pillar_prep_device_bin_agreement():
    """Host binning and device compute_pillar_info agree on ids (CPU device;
    both use IEEE f32 ops — the training path ships host ids to the TPU so
    exactness there is not required, but agreement here validates semantics)."""
    import jax.numpy as jnp
    from deflow_tpu.ops.voxel import VoxelConfig, compute_pillar_info
    rng = np.random.default_rng(4)
    n = 4096
    pts = rng.uniform(-52, 52, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3.2, 3.2, n)
    mask = np.ones(n, bool)
    cfg = VoxelConfig()
    info = compute_pillar_info(jnp.asarray(pts), jnp.asarray(mask), cfg)
    pid, *_ = native.pillar_prep(pts, mask, cfg.point_cloud_range[:3],
                                 cfg.voxel_size, list(cfg.grid_size))
    np.testing.assert_array_equal(pid, np.asarray(info.pillar_id))
