"""The reference's exact ablation override strings (1_train.sh:39-78) must
compose and build a consistent model; plus submission-writer and visualizer
smoke tests."""

import os
import pathlib
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


@pytest.mark.slow
def test_submission_zip(tmp_path):
    """Pins the OFFICIAL leaderboard schemas [T3]:

    v1 (av2-api ``make_submission_archive``): per-frame feather named
    ``<log_id>/<timestamp>.feather``; rows = exactly the eval-mask point set
    of the RAW sweep; columns ``flow_tx_m/ty/tz_m`` float16 + ``is_dynamic``
    bool — in that order.

    v2 (2024 bucketed leaderboard, bucketed_scene_flow_eval): rows = ALL raw
    sweep points; columns ``is_valid`` bool + ``flow_tx_m/ty/tz_m`` float16.

    Expected per-frame counts are recomputed straight from the .h5 file, not
    from the dataset's cropped view.  Column names, arrow dtypes, the entry
    naming pattern and the row-selection rules come from the spec-derived
    golden ``tests/golden/submission_schema.json`` (DATA, not code — the
    writer and this test cannot drift together; VERDICT r4 #8).
    """
    import json
    import re

    from deflow_tpu.data import HDF5Dataset, make_split
    from deflow_tpu import trainer as T
    from deflow_tpu.entry.evaluate import write_submission
    import h5py
    import pandas as pd
    import pyarrow.feather as paf

    golden = json.loads(
        (pathlib.Path(__file__).parent / "golden" /
         "submission_schema.json").read_text())

    root = str(tmp_path)
    split = make_split(root, "test", num_scenes=1, num_frames=3,
                       points_per_frame=600, labeled=False,
                       with_eval_mask=True)
    # ground truth about the raw sweeps, straight from the file
    scene = os.path.join(split, os.listdir(split)[0])
    raw = {}
    with h5py.File(scene) as f:
        for ts in sorted(f.keys(), key=int):
            raw[ts] = (len(f[ts]["lidar"]), f[ts]["eval_mask"][:].astype(bool))

    # max_points=128 << 600 forces a crop, so the writer must fall back to
    # pose flow for dropped points rather than under-count rows
    ds = HDF5Dataset(split, max_points=128, with_labels=False,
                     submission_meta=True)
    cfg = compose("config", ["batch_size=2", "max_points=128",
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

    for version in (1, 2):
        zip_path = write_submission(eval_step, state, ds, cfg, mesh,
                                    out_dir=str(tmp_path / "sub"),
                                    version=version)
        spec = golden[f"v{version}"]
        with zipfile.ZipFile(zip_path) as zf:
            names = sorted(zf.namelist())
            assert len(names) == 2  # 3 frames -> 2 pairs
            for name in names:
                assert re.match(golden["entry_name_pattern"], name), name
                scene_id, fname = name.split("/")
                ts = fname[: -len(".feather")]
                assert scene_id == os.path.basename(scene)[: -len(".h5")]
                n_raw, eval_mask = raw[ts]
                with zf.open(name) as f:
                    tbl = paf.read_table(f)
                # golden-pinned column names (in order) and arrow dtypes
                assert tbl.column_names == [c["name"] for c in spec["columns"]]
                assert [str(t) for t in tbl.schema.types] == [
                    c["pyarrow_type"] for c in spec["columns"]]
                df = tbl.to_pandas()
                # golden-pinned row-selection rule
                expected_rows = {"eval_mask_points": int(eval_mask.sum()),
                                 "all_raw_sweep_points": n_raw}
                assert len(df) == expected_rows[spec["row_selection"]]
                if version == 2:
                    np.testing.assert_array_equal(
                        df["is_valid"].to_numpy(), eval_mask)
                for c in ("flow_tx_m", "flow_ty_m", "flow_tz_m"):
                    assert df[c].dtype == np.float16
                assert np.isfinite(df["flow_tx_m"].to_numpy(np.float32)).all()
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
