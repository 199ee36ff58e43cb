"""Full-pipeline accuracy gates (VERDICT r4 #5).

1. ``test_full_eval_path_matches_torch_twin``: the torch twin and the JAX
   model — same converted weights — run a synthetic AV2-schema val scene
   through their ENTIRE eval paths (JAX: HDF5Dataset → sorted host-prep
   loader → sharded eval_step → official accumulators via
   ``entry.evaluate.run_validation``; torch: reference-style compacted
   forward → the same accumulators), and the printed metric TABLES must
   agree within float tolerance.  This is the strongest offline stand-in
   for the published-checkpoint EPE parity gate
   (reference README.md:86-94) — it exercises loader, host-prep
   permutation, padding, eval composition (pose-flow fallback for
   never-seen points) and both metric implementations end-to-end.

2. ``test_overfit_trajectory_golden``: N supervised steps on one fixed
   synthetic batch with pinned seeds; the loss/EPE trajectory must stay
   inside a golden band.  Catches silent training-math regressions
   (optimizer wiring, loss scaling, BN-stat plumbing) that forward-parity
   tests cannot see.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deflow_tpu.config import compose
from deflow_tpu.convert import convert_state_dict, merge_into_variables
from deflow_tpu.data import DataLoader, HDF5Dataset, make_split
from deflow_tpu.models import build_model
from deflow_tpu import trainer as T

from torch_twin import TorchDeFlow, randomize_

VOXEL = [1.6, 1.6, 6.0]
RANGE = [-51.2, -51.2, -3.0, 51.2, 51.2, 3.0]
MAXPTS = 1024


def _cfg(root):
    return compose("config", [
        f"dataset_path={root}",
        "batch_size=8", "num_workers=0",
        f"max_points={MAXPTS}",
        "voxel_size=[1.6, 1.6, 6]",
        "model.target.grid_feature_size=[64, 64]",
        "model.target.num_iters=2",
        "precision=fp32",
    ])


@pytest.mark.slow
def test_full_eval_path_matches_torch_twin(tmp_path):
    from deflow_tpu.entry.evaluate import run_validation
    from deflow_tpu.metrics import BucketedEPE, ThreewayEPE

    root = str(tmp_path)
    make_split(root, "val", num_scenes=1, num_frames=3,
               points_per_frame=900, labeled=True, with_eval_mask=True,
               seed=11)
    cfg = _cfg(root)
    mesh = T.create_mesh()

    tm = TorchDeFlow(decoder_option="gru", num_iters=2, voxel_size=VOXEL,
                     point_cloud_range=RANGE)
    randomize_(tm, seed=3)

    # --- JAX side: converted weights through the production eval path
    ds = HDF5Dataset(str(cfg.val_data), max_points=MAXPTS)
    model = build_model(cfg.model, precision="fp32")
    host_batch = next(iter(DataLoader(ds, 8, shuffle=False, drop_last=False)))
    state = T.init_state(model, cfg, host_batch, seed=0)
    params, stats = convert_state_dict(tm.state_dict())
    merged = merge_into_variables(
        {"params": state.params, "batch_stats": state.batch_stats},
        {"params": params, "batch_stats": stats})
    state = state.replace(params=merged["params"],
                          batch_stats=merged["batch_stats"])
    state = jax.device_put(state, T.replicated(mesh))
    eval_step = T.jit_eval_step(T.make_eval_step(model), mesh)
    metrics_jax = run_validation(eval_step, state, ds, cfg, mesh)

    # --- torch side: reference-style per-pair compacted forward into the
    # SAME official accumulators (fresh instances)
    three, bucketed = ThreewayEPE(), BucketedEPE()
    for i in range(len(ds)):
        s = ds[i]
        mreal = s["pc0_mask"]
        t_out = tm(torch.from_numpy(s["pc0"][mreal]),
                   torch.from_numpy(s["pc1"][s["pc1_mask"]]),
                   torch.from_numpy(s["pose0"]), torch.from_numpy(s["pose1"]))
        n = len(s["pc0"])
        pred = np.zeros((n, 3), np.float32)
        pose_flow = np.zeros((n, 3), np.float32)
        pose_flow[mreal] = t_out["pose_flow"].numpy()
        # eval composition (SURVEY.md §3.2): net flow where the model saw the
        # point, rigid ego flow everywhere else
        pred[mreal] = t_out["pose_flow"].numpy()
        rows = np.flatnonzero(mreal)[t_out["valid0"].numpy()]
        pred[rows] += t_out["flow"].numpy()
        mask = s["pc0_mask"] & s["flow_is_valid"]
        if "eval_mask" in s:
            mask = mask & s["eval_mask"]
        args = (pred, s["flow"], s["flow_category_indices"], pose_flow, mask)
        three.update(*args)
        bucketed.update(*args)
    metrics_torch = dict(three.compute())
    metrics_torch.update(bucketed.compute())
    ds.close()

    assert set(metrics_torch) == set(metrics_jax)
    for k in sorted(metrics_torch):
        a, b = float(metrics_jax[k]), float(metrics_torch[k])
        if np.isnan(a) and np.isnan(b):      # empty bucket on both sides
            continue
        assert abs(a - b) <= 1e-3 + 1e-3 * abs(b), (
            f"{k}: jax={a:.6f} torch={b:.6f}")


@pytest.mark.heavy
def test_overfit_trajectory_golden(tmp_path):
    """25 supervised steps on one fixed batch, seeds pinned everywhere.
    The golden band was captured on the CPU 8-device mesh with matmul
    precision HIGHEST (conftest); it is deliberately wide (±20% on the
    start, 2x on the end) so only real training-math regressions trip it,
    not float noise."""
    root = str(tmp_path)
    make_split(root, "train", num_scenes=3, num_frames=4,
               points_per_frame=900, labeled=True, seed=5)
    cfg = _cfg(root).copy()
    cfg.lr = 1e-3
    mesh = T.create_mesh()
    ds = HDF5Dataset(str(cfg.train_data), max_points=MAXPTS)
    loader = DataLoader(ds, 8, shuffle=False)
    model = build_model(cfg.model, precision="fp32")
    host_batch = next(iter(loader))
    state = T.init_state(model, cfg, host_batch, seed=0)
    state = jax.device_put(state, T.replicated(mesh))
    step = T.jit_train_step(T.make_train_step(model, str(cfg.loss_fn)), mesh)
    batch = T.device_batch(host_batch, mesh)

    losses, epes = [], []
    for _ in range(25):
        state, aux = step(state, batch)
        losses.append(float(aux["loss"]))
        epes.append(float(aux["epe"]))

    assert np.isfinite(losses).all() and np.isfinite(epes).all()
    # GOLDEN BAND (captured 2026-08-19, see docstring):
    assert 0.8 * _GOLD["loss0"] <= losses[0] <= 1.2 * _GOLD["loss0"], losses[0]
    assert losses[-1] <= 2.0 * _GOLD["loss_end"], (losses[-1], _GOLD)
    assert epes[-1] <= 2.0 * _GOLD["epe_end"], (epes[-1], _GOLD)
    # monotone-ish descent: final quarter strictly below the first step
    assert max(losses[-6:]) < losses[0], losses


# Captured on the CPU 8-device mesh 2026-08-19 (seeds pinned above; full
# 25-step trajectory: 0.992 → 0.173, epe_end 0.088).  If a deliberate
# change moves these, re-capture by printing the trajectory and update.
_GOLD = {"loss0": 0.992, "loss_end": 0.1726, "epe_end": 0.0883}
