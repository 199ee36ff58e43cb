"""DUFO dynamic-label generation test on the synthetic scene."""

import os

import h5py
import numpy as np

from deflow_tpu.data import make_scene
from deflow_tpu.dataprocess.process import label_scene, main as process_main


def test_dufo_labels_moving_actor(tmp_path):
    path = make_scene(str(tmp_path / "scene.h5"), num_frames=6,
                      points_per_frame=4096, labeled=True, seed=3)
    label_scene(path, window=6)
    with h5py.File(path, "r") as f:
        ts = sorted(f.keys(), key=int)
        hits = []
        for t in ts:
            g = f[t]
            lab = g["dufo_label"][:]
            cats = (g["flow_category_indices"][:]
                    if "flow_category_indices" in g else None)
            assert lab.shape[0] == g["lidar"].shape[0]
            if cats is not None:
                dyn_rate_fg = lab[cats > 0].mean()
                dyn_rate_bg = lab[cats == 0].mean()
                hits.append((dyn_rate_fg, dyn_rate_bg))
        fg = np.mean([h[0] for h in hits])
        bg = np.mean([h[1] for h in hits])
        # moving actors should be flagged far more often than static world
        assert fg > 0.3, f"foreground dynamic rate too low: {fg}"
        assert bg < 0.15, f"background false-positive rate too high: {bg}"


def test_process_cli_sharding(tmp_path):
    for i in range(3):
        make_scene(str(tmp_path / f"s{i}.h5"), num_frames=3,
                   points_per_frame=512, labeled=False, seed=i)
    process_main(["--data_dir", str(tmp_path), "--scene_range", "0,-1",
                  "--interval", "2", "--window", "3"])
    labeled = []
    for i in range(3):
        with h5py.File(str(tmp_path / f"s{i}.h5"), "r") as f:
            ts = sorted(f.keys())[0]
            labeled.append("dufo_label" in f[ts])
    assert labeled == [True, False, True]  # stride-2 shard
