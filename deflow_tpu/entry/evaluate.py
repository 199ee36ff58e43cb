"""``eval.py`` entry point (reference README.md:88-96, 2_eval.sh:33-43).

``av2_mode=val``  → prints the official 3-way table (+ bucketed v2 table).
``av2_mode=test`` → writes the leaderboard submission zip and prints its path.
"""

from __future__ import annotations

import os
import zipfile
from typing import Dict, Optional

import jax
import numpy as np

from deflow_tpu.config import Config, from_cli
from deflow_tpu.data import DataLoader, HDF5Dataset
from deflow_tpu.metrics import BucketedEPE, ThreewayEPE
from deflow_tpu.models import build_model
from deflow_tpu import trainer as T


def _pose_flow_np(sample_pc0, sample_mask, ego_motion):
    moved = sample_pc0 @ ego_motion[:3, :3].T + ego_motion[:3, 3]
    return np.where(sample_mask[:, None], moved - sample_pc0, 0.0)


def run_validation(eval_step, state, val_ds, cfg, mesh) -> Dict[str, float]:
    """Shared val sweep: streams batches through the jitted eval step and the
    numpy metric accumulators."""
    batch_size = int(cfg.batch_size)
    n_dev = mesh.devices.size if mesh is not None else 1
    batch_size = max(n_dev, batch_size - batch_size % n_dev)
    loader = DataLoader(val_ds, batch_size, shuffle=False, drop_last=False)

    three = ThreewayEPE()
    bucketed = BucketedEPE()
    for host_batch in loader:
        bsz = len(host_batch["scene_id"])
        pad = (-bsz) % n_dev
        if pad:  # pad the last ragged batch with repeats; drop rows after
            for k, v in list(host_batch.items()):
                if isinstance(v, np.ndarray):
                    host_batch[k] = np.concatenate([v, v[-1:].repeat(pad, 0)])
        batch = T.device_batch(host_batch, mesh)
        out = jax.device_get(eval_step(state.params, state.batch_stats, batch))
        for b in range(bsz):
            mask = host_batch["pc0_mask"][b] & host_batch["flow_is_valid"][b]
            if "eval_mask" in host_batch:
                mask &= host_batch["eval_mask"][b]
            args = (
                out["pred_flow"][b], host_batch["flow"][b],
                host_batch["flow_category_indices"][b], out["pose_flow"][b], mask,
            )
            three.update(*args)
            bucketed.update(*args)
    metrics = dict(three.compute())
    metrics.update(bucketed.compute())
    return metrics


def write_submission(
    eval_step, state, test_ds, cfg, mesh, out_dir: str, version: int = 2
) -> str:
    """Leaderboard submission writer (reference README.md:89-91): one feather
    per (log, timestamp) with is_valid + flow columns, zipped."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    batch_size = max(1, int(cfg.batch_size))
    n_dev = mesh.devices.size if mesh is not None else 1
    batch_size = max(n_dev, batch_size - batch_size % n_dev)
    loader = DataLoader(test_ds, batch_size, shuffle=False, drop_last=False)

    zip_path = os.path.join(out_dir, f"submission_v{version}.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for host_batch in loader:
            bsz = len(host_batch["scene_id"])
            pad = (-bsz) % n_dev
            if pad:
                for k, v in list(host_batch.items()):
                    if isinstance(v, np.ndarray):
                        host_batch[k] = np.concatenate([v, v[-1:].repeat(pad, 0)])
            batch = T.device_batch(host_batch, mesh)
            out = jax.device_get(eval_step(state.params, state.batch_stats, batch))
            for b in range(bsz):
                n = int(host_batch["pc0_mask"][b].sum())
                flow = out["pred_flow"][b][:n].astype(np.float16)
                # Official av2 submission schema: float16 flow columns, plus
                # is_dynamic for leaderboard v2 (reference README.md:90-91).
                df = pd.DataFrame({
                    "flow_tx_m": flow[:, 0],
                    "flow_ty_m": flow[:, 1],
                    "flow_tz_m": flow[:, 2],
                })
                if version >= 2:
                    df["is_dynamic"] = (
                        np.linalg.norm(
                            out["pred_flow"][b][:n] - out["pose_flow"][b][:n],
                            axis=-1) > 0.05)
                name = (f"{host_batch['scene_id'][b]}/"
                        f"{host_batch['timestamp'][b]}.feather")
                tmp = os.path.join(out_dir, "frame.feather")
                df.to_feather(tmp)
                zf.write(tmp, name)
                os.remove(tmp)
    return zip_path


def main(cfg: Optional[Config] = None) -> Dict[str, float]:
    if cfg is None:
        cfg = from_cli(config_name="config")

    mesh = T.create_mesh(int(cfg.get("num_devices", -1)))
    model = build_model(cfg.model, precision=str(cfg.get("precision", "fp32")))
    mode = str(cfg.get("av2_mode", "val"))
    split_dir = str(cfg.val_data) if mode == "val" else os.path.join(
        str(cfg.dataset_path), "test")
    ds = HDF5Dataset(split_dir, max_points=int(cfg.max_points),
                     remove_ground=bool(cfg.remove_ground),
                     with_labels=(mode == "val"))

    sample = ds[0]
    sample_batch = {k: (np.asarray(v)[None] if isinstance(v, np.ndarray) else v)
                    for k, v in sample.items()}
    state = T.init_state(model, cfg, sample_batch, seed=0)
    if cfg.get("checkpoint"):
        state = T.load_weights(str(cfg.checkpoint), state)
        print(f"loaded checkpoint: {cfg.checkpoint}")
    state = jax.device_put(state, T.replicated(mesh))
    eval_step = T.jit_eval_step(T.make_eval_step(model), mesh)

    if mode == "val":
        metrics = run_validation(eval_step, state, ds, cfg, mesh)
        print("\n== AV2 val, official 3-way metrics ==")
        for k in ("EPE_FD", "EPE_FS", "EPE_BS", "EPE_3way_mean"):
            print(f"  {k:>16}: {metrics.get(k, float('nan')):.4f}")
        print("== bucketed (leaderboard v2) ==")
        for k, v in metrics.items():
            if k.startswith(("Static_EPE", "Dynamic_NormEPE")):
                print(f"  {k:>28}: {v:.4f}")
        ds.close()
        if cfg.get("save_res"):
            # reference's save_res flag: persist predictions alongside eval
            from deflow_tpu.entry.save import main as save_main

            save_cfg = cfg.copy()
            save_cfg.dataset_path = split_dir
            save_main(save_cfg)
        return metrics

    version = int(cfg.get("leaderboard_version", 2))
    zip_path = write_submission(
        eval_step, state, ds, cfg, mesh,
        out_dir=str(cfg.get("output_zip_dir", "logs/submissions")),
        version=version)
    print(f"submission written: {zip_path}")
    print("upload with: evalai challenge ... submit --file", zip_path)
    ds.close()
    return {"submission": zip_path}


if __name__ == "__main__":
    main()
