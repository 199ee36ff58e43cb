"""The reference's exact ablation override strings (1_train.sh:39-78) must
compose and build a consistent model; plus submission-writer and visualizer
smoke tests."""

import os
import zipfile

import numpy as np
import pytest

from deflow_tpu.config import compose
from deflow_tpu.models import build_model


@pytest.mark.parametrize("overrides,expect", [
    (["model=deflow", "model.target.num_iters=2"], ("gru", 2, (512, 512))),
    (["model=deflow", "model.target.num_iters=16"], ("gru", 16, (512, 512))),
    (["model=deflow", "model.target.decoder_option=linear"],
     ("linear", 4, (512, 512))),
    (["model=fastflow3d", "voxel_size=[0.1, 0.1, 6]"],
     ("linear", 0, (1024, 1024))),
    (["model=fastflow3d", "voxel_size=[0.4, 0.4, 6]"],
     ("linear", 0, (256, 256))),
])
def test_reference_ablation_clis(overrides, expect):
    cfg = compose("config", overrides)
    model = build_model(cfg.model, precision="fp32")
    dec, iters, grid = expect
    assert model.decoder_option == dec
    assert model.num_iters == iters
    assert tuple(model.grid_feature_size) == grid


def test_submission_zip(tmp_path):
    from deflow_tpu.data import HDF5Dataset, make_split
    from deflow_tpu import trainer as T
    from deflow_tpu.entry.evaluate import write_submission
    import pandas as pd

    root = str(tmp_path)
    make_split(root, "test", num_scenes=1, num_frames=3,
               points_per_frame=600, labeled=False, with_eval_mask=True)
    ds = HDF5Dataset(os.path.join(root, "test"), max_points=1024,
                     with_labels=False)
    cfg = compose("config", ["batch_size=2", "max_points=1024",
                             "voxel_size=[1.6,1.6,6]",
                             "model.target.grid_feature_size=[64,64]",
                             "model.target.num_iters=2", "precision=fp32"])
    model = build_model(cfg.model, precision="fp32")
    mesh = T.create_mesh()
    s = ds[0]
    sample = {k: (np.asarray(v)[None] if isinstance(v, np.ndarray) else v)
              for k, v in s.items()}
    state = T.init_state(model, cfg, sample, seed=0)
    import jax
    state = jax.device_put(state, T.replicated(mesh))
    eval_step = T.jit_eval_step(T.make_eval_step(model), mesh)

    zip_path = write_submission(eval_step, state, ds, cfg, mesh,
                                out_dir=str(tmp_path / "sub"), version=2)
    assert os.path.exists(zip_path)
    with zipfile.ZipFile(zip_path) as zf:
        names = zf.namelist()
        assert len(names) == 2  # 3 frames -> 2 pairs
        with zf.open(names[0]) as f:
            df = pd.read_feather(f)
    assert list(df.columns) == ["flow_tx_m", "flow_ty_m", "flow_tz_m",
                                "is_dynamic"]
    assert df["flow_tx_m"].dtype == np.float16
    ds.close()


def test_visualizer_renders_png(tmp_path):
    from deflow_tpu.data import make_scene
    from tools.visualization import render_frame_png, _frame_arrays
    import h5py

    path = make_scene(str(tmp_path / "s.h5"), num_frames=2,
                      points_per_frame=800, labeled=True)
    with h5py.File(path) as f:
        ts = sorted(f.keys(), key=int)[0]
        pc, flow, pose_flow = _frame_arrays(f[ts], "flow")
    out = str(tmp_path / "frame.png")
    render_frame_png(pc, flow, pose_flow, out, title="smoke")
    assert os.path.getsize(out) > 10000
