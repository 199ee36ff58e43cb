"""``save.py`` entry point (reference README.md:106-115).

Runs inference and writes the predicted total flow back into the ``.h5``
scene files under a key named after the checkpoint (default) or ``res_name``,
so the visualizer can overlay it (reference README.md:111-115).
"""

from __future__ import annotations

import os
from typing import Optional

import h5py
import jax
import numpy as np

from deflow_tpu.config import Config, from_cli
from deflow_tpu.data import DataLoader, HDF5Dataset
from deflow_tpu.data.h5dataset import pad_ragged_batch
from deflow_tpu.models import build_model
from deflow_tpu import trainer as T


def main(cfg: Optional[Config] = None) -> str:
    from deflow_tpu.utils import enable_compile_cache

    enable_compile_cache()
    if cfg is None:
        cfg = from_cli()

    ckpt = str(cfg.get("checkpoint") or "")
    res_name = str(cfg.get("res_name") or "") or (
        os.path.splitext(os.path.basename(ckpt))[0] if ckpt else "deflow_tpu")

    data_dir = str(cfg.get("dataset_path"))
    ds = HDF5Dataset(data_dir, max_points=int(cfg.max_points),
                     remove_ground=bool(cfg.remove_ground), with_labels=False,
                     num_frames=int(cfg.get("num_frames", 2)))

    mesh = T.create_mesh(int(cfg.get("num_devices", -1)))
    model = build_model(cfg.model, precision=str(cfg.get("precision", "fp32")),
                        num_frames=int(cfg.get("num_frames", 2)))
    sample = ds[0]
    sample_batch = {k: (np.asarray(v)[None] if isinstance(v, np.ndarray) else v)
                    for k, v in sample.items()}
    state = T.init_state(model, cfg, sample_batch, seed=0)
    if ckpt:
        state = T.load_weights(ckpt, state)
    state = jax.device_put(state, T.replicated(mesh))
    eval_step = T.jit_eval_step(T.make_eval_step(model), mesh)

    n_dev = mesh.devices.size
    from deflow_tpu.entry.evaluate import _sorted_prep

    loader = DataLoader(ds, n_dev, shuffle=False, drop_last=False,
                        post_collate=_sorted_prep(cfg),
                        num_workers=int(cfg.get("num_workers", 0)))
    # collect predictions per (scene, timestamp), then write per scene file
    results = {}
    for host_batch in loader:
        bsz = pad_ragged_batch(host_batch, n_dev)
        batch = T.device_batch(host_batch, mesh)
        out = jax.device_get(eval_step(state.params, state.batch_stats, batch))
        for b in range(bsz):
            n = int(host_batch["pc0_mask"][b].sum())
            pred = out["pred_flow"][b]
            if "pc0_unsort" in host_batch:  # restore dataset point order
                pred = pred[host_batch["pc0_unsort"][b]]
            results.setdefault(host_batch["scene_id"][b], {})[
                host_batch["timestamp"][b]] = pred[:n].astype(np.float32)
    ds.close()

    for scene_id, frames in results.items():
        path = os.path.join(data_dir, scene_id + ".h5")
        with h5py.File(path, "a") as f:
            for ts, flow in frames.items():
                g = f[ts]
                if res_name in g:
                    del g[res_name]
                g.create_dataset(res_name, data=flow)
    print(f"saved flow under key {res_name!r} in {len(results)} scene files")
    print(f"visualize with: python tools/visualization.py --data_dir {data_dir} "
          f"--res_name {res_name}")
    return res_name


if __name__ == "__main__":
    main()
