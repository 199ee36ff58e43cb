"""extract_av2 preprocessing tests: synthetic raw AV2 sensor layout → .h5 →
HDF5Dataset, with flow-label and ground-mask consistency checks."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from deflow_tpu.dataprocess.extract_av2 import (
    GroundHeightMap, compute_flow, main as extract_main, make_se3,
    points_in_cuboid, quat_to_rot,
)


def _yaw_quat(yaw):
    return np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)


def _write_raw_log(log_dir, num_frames=3, n_pts=2048, seed=0):
    """Minimal AV2 sensor-format log: poses, lidar sweeps, annotations, map."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(log_dir, "sensors", "lidar"), exist_ok=True)
    os.makedirs(os.path.join(log_dir, "map"), exist_ok=True)

    ts = [1_000_000_000 + i * 100_000_000 for i in range(num_frames)]
    # ego drives +x at 10 m/s
    poses = []
    for i, t in enumerate(ts):
        qw, qx, qy, qz = _yaw_quat(0.0)
        poses.append(dict(timestamp_ns=t, qw=qw, qx=qx, qy=qy, qz=qz,
                          tx_m=10.0 * 0.1 * i, ty_m=0.0, tz_m=0.0))
    pd.DataFrame(poses).to_feather(
        os.path.join(log_dir, "city_SE3_egovehicle.feather"))

    # static city-frame world + one car moving +y at 5 m/s
    world = rng.uniform(-30, 30, (n_pts, 3))
    world[:, 2] = rng.uniform(0.5, 3.0, n_pts)
    world[: n_pts // 8, 2] = rng.uniform(-0.1, 0.2, n_pts // 8)  # ground points
    car_center0 = np.array([5.0, 3.0, 1.0])
    car_vel = np.array([0.0, 5.0, 0.0])
    car_pts = car_center0 + rng.uniform(-1, 1, (128, 3)) * [2.0, 0.9, 0.7]

    annos = []
    for i, t in enumerate(ts):
        ego_x = 10.0 * 0.1 * i
        center_city = car_center0 + car_vel * 0.1 * i
        qw, qx, qy, qz = _yaw_quat(0.0)
        annos.append(dict(timestamp_ns=t, track_uuid="car-1",
                          category="REGULAR_VEHICLE",
                          qw=qw, qx=qx, qy=qy, qz=qz,
                          tx_m=center_city[0] - ego_x, ty_m=center_city[1],
                          tz_m=center_city[2],
                          length_m=4.2, width_m=2.0, height_m=1.6,
                          num_interior_pts=128))
        car_city = car_pts + car_vel * 0.1 * i
        pts_city = np.concatenate([world, car_city])
        pts_ego = pts_city - [ego_x, 0, 0]
        pd.DataFrame({
            "x": pts_ego[:, 0].astype(np.float32),
            "y": pts_ego[:, 1].astype(np.float32),
            "z": pts_ego[:, 2].astype(np.float32),
            "intensity": np.zeros(len(pts_ego), np.uint8),
        }).to_feather(os.path.join(log_dir, "sensors", "lidar", f"{t}.feather"))
    pd.DataFrame(annos).to_feather(os.path.join(log_dir, "annotations.feather"))

    # flat ground raster at z=0 covering [-100, 100]^2 at 0.3 m/px
    h = np.zeros((667, 667), np.float32)
    np.save(os.path.join(
        log_dir, "map", "log___ground_height_surface____TEST.npy"), h)
    with open(os.path.join(log_dir, "map", "log___img_Sim2_city.json"), "w") as f:
        json.dump({"R": [1, 0, 0, 1], "t": [100.0, 100.0], "s": 1 / 0.3}, f)
    return ts


@pytest.fixture(scope="module")
def extracted(tmp_path_factory):
    root = tmp_path_factory.mktemp("av2raw")
    argo = root / "argo"
    log_dir = argo / "sensor" / "val" / "log0001"
    ts = _write_raw_log(str(log_dir))
    out = root / "prep"
    extract_main(["--argo_dir", str(argo), "--output_dir", str(out),
                  "--data_mode", "val", "--nproc", "1"])
    return str(out / "val"), ts


def test_h5_schema(extracted):
    import h5py
    out_dir, ts = extracted
    path = os.path.join(out_dir, "log0001.h5")
    assert os.path.exists(path)
    with h5py.File(path, "r") as f:
        assert sorted(map(int, f.keys())) == ts
        g = f[str(ts[0])]
        for key in ("lidar", "pose", "ground_mask", "flow", "flow_is_valid",
                    "flow_category_indices", "ego_motion"):
            assert key in g, key
        # last frame has no labels (no t+1)
        assert "flow" not in f[str(ts[-1])]


def test_flow_labels(extracted):
    import h5py
    out_dir, ts = extracted
    with h5py.File(os.path.join(out_dir, "log0001.h5"), "r") as f:
        g = f[str(ts[0])]
        pc = g["lidar"][:]
        flow = g["flow"][:]
        cats = g["flow_category_indices"][:]
        rel = g["ego_motion"][:]
        pose_flow = pc @ rel[:3, :3].T + rel[:3, 3] - pc

        bg = cats == 0
        np.testing.assert_allclose(flow[bg], pose_flow[bg], atol=1e-4)
        car = cats == 19  # REGULAR_VEHICLE
        assert car.sum() > 50
        # car moves +y at 5 m/s → flow_y − pose_flow_y ≈ 0.5 m
        resid = flow[car] - pose_flow[car]
        np.testing.assert_allclose(resid[:, 1], 0.5, atol=1e-3)
        np.testing.assert_allclose(resid[:, 0], 0.0, atol=1e-3)


def test_ground_mask(extracted):
    import h5py
    out_dir, ts = extracted
    with h5py.File(os.path.join(out_dir, "log0001.h5"), "r") as f:
        g = f[str(ts[0])]
        gm = g["ground_mask"][:]
        z = g["lidar"][:, 2]
        # world z ∈ [0.3, 3]; tolerance 0.3 → only z ≈ 0.3 points flagged
        assert gm.sum() > 0
        assert z[gm].max() <= 0.3 + 1e-5


def test_points_in_cuboid_rotation():
    pose = make_se3(quat_to_rot(*(np.cos(np.pi / 8), 0, 0, np.sin(np.pi / 8))),
                    np.array([2.0, 0.0, 0.0]))
    dims = np.array([4.0, 2.0, 2.0])
    pts = np.array([[2.0, 0.0, 0.0],      # center → inside
                    [2.0 + 1.9 * np.cos(np.pi / 4), 1.9 * np.sin(np.pi / 4), 0.0],
                    [2.0 + 1.9, 0.0, 0.0]])  # along x but box rotated 45° → outside
    inside = points_in_cuboid(pts, pose, dims)
    assert inside.tolist() == [True, True, False]


def test_vanished_object_invalidates():
    pc = np.array([[1.0, 0.0, 0.0], [20.0, 0.0, 0.0]])
    rel = np.eye(4)
    box = make_se3(np.eye(3), np.array([1.0, 0, 0]))
    annos0 = {"u1": (box, np.array([2.0, 2.0, 2.0]), "BUS")}
    flow, valid, cats = compute_flow(pc, rel, annos0, {})
    assert not valid[0] and valid[1]
    assert cats[0] == 7  # BUS
