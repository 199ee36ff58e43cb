"""End-to-end integration: config → data → train loop → eval → ckpt → resume,
on the virtual 8-device CPU mesh (SURVEY.md §4: the demo-data smoke run, plus
the multi-device DP test the reference never had)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deflow_tpu.config import compose
from deflow_tpu.data import DataLoader, HDF5Dataset, make_split
from deflow_tpu.models import build_model
from deflow_tpu import trainer as T

SMALL = dict(max_points=1024, voxel=(1.6, 1.6, 6.0), grid=(64, 64))


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("av2e2e"))
    make_split(root, "train", num_scenes=3, num_frames=4,
               points_per_frame=900, labeled=True)  # 9 pairs ≥ batch of 8
    make_split(root, "val", num_scenes=1, num_frames=3,
               points_per_frame=900, labeled=True, seed=7)
    return root


@pytest.fixture(scope="module")
def cfg(data_root):
    c = compose("config", [
        f"dataset_path={data_root}",
        "batch_size=8", "lr=1e-3", "epochs=1", "num_workers=0",
        f"max_points={SMALL['max_points']}",
        "voxel_size=[1.6, 1.6, 6]",
        "model.target.grid_feature_size=[64, 64]",
        "model.target.num_iters=2",
        "precision=fp32",
    ])
    return c


def test_mesh_is_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_train_step_runs_and_descends(cfg):
    mesh = T.create_mesh()
    assert mesh.devices.size == 8
    ds = HDF5Dataset(str(cfg.train_data), max_points=int(cfg.max_points))
    loader = DataLoader(ds, 8, shuffle=False)
    model = build_model(cfg.model, precision="fp32")
    host_batch = next(iter(loader))
    state = T.init_state(model, cfg, host_batch, seed=0)
    state = jax.device_put(state, T.replicated(mesh))
    step = T.jit_train_step(T.make_train_step(model, str(cfg.loss_fn)), mesh)

    batch = T.device_batch(host_batch, mesh)
    losses = []
    for _ in range(8):
        state, aux = step(state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, f"no descent: {losses}"
    assert int(aux["valid_points"]) > 0
    ds.close()


def test_eval_step_and_validation(cfg):
    mesh = T.create_mesh()
    ds = HDF5Dataset(str(cfg.val_data), max_points=int(cfg.max_points))
    model = build_model(cfg.model, precision="fp32")
    loader = DataLoader(ds, 8, shuffle=False, drop_last=False)
    host_batch = next(iter(loader))
    state = T.init_state(model, cfg, host_batch, seed=0)
    state = jax.device_put(state, T.replicated(mesh))
    eval_step = T.jit_eval_step(T.make_eval_step(model), mesh)

    from deflow_tpu.entry.evaluate import run_validation
    metrics = run_validation(eval_step, state, ds, cfg, mesh)
    assert np.isfinite(metrics["EPE_3way_mean"])
    assert "EPE_FD" in metrics and "Static_EPE_mean" in metrics
    ds.close()


@pytest.mark.slow
def test_checkpoint_roundtrip(cfg, tmp_path):
    mesh = T.create_mesh()
    ds = HDF5Dataset(str(cfg.train_data), max_points=int(cfg.max_points))
    model = build_model(cfg.model, precision="fp32")
    host_batch = next(iter(DataLoader(ds, 8)))
    state = T.init_state(model, cfg, host_batch, seed=0)
    step = T.jit_train_step(T.make_train_step(model, str(cfg.loss_fn)), mesh)
    state = jax.device_put(state, T.replicated(mesh))
    state, _ = step(state, T.device_batch(host_batch, mesh))

    path = T.save_checkpoint(str(tmp_path), state, epoch=0)
    state2 = T.init_state(model, cfg, host_batch, seed=1)
    state2, epoch = T.load_checkpoint(path, state2)
    assert epoch == 0
    assert int(state2.step) == 1
    p_old = jax.tree.leaves(state.params)[0]
    p_new = jax.tree.leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p_old), np.asarray(p_new))
    ds.close()


@pytest.mark.heavy
def test_train_main_entry(cfg, tmp_path):
    """Full train.py main(): one epoch + validation + checkpointing."""
    from deflow_tpu.entry.train import main
    run_cfg = cfg.copy()
    run_cfg.output_dir = str(tmp_path / "logs")
    run_cfg.epochs = 1
    metrics = main(run_cfg)
    assert "EPE_3way_mean" in metrics
    ckpt_root = os.path.join(run_cfg.output_dir, "wandb")
    runs = os.listdir(ckpt_root)
    assert runs, "no run dir created"
    ckpts = os.listdir(os.path.join(ckpt_root, runs[0], "checkpoints"))
    assert any(c.startswith("epoch_") for c in ckpts)


@pytest.mark.heavy
def test_pallas_path_under_sharding(monkeypatch):
    """Pallas kernels inside the pjit-sharded train step (interpret mode on
    the 8-device mesh) must produce the same loss as the XLA path — guards
    the real multi-chip TPU configuration."""
    import deflow_tpu.ops.voxel as V
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    from deflow_tpu.config import compose
    cfg = compose("config", [
        "batch_size=8", "max_points=512", "voxel_size=[3.2, 3.2, 6]",
        "model.target.grid_feature_size=[32, 32]",
        "model.target.num_iters=2", "precision=fp32", "lr=1e-3",
    ])
    rng = np.random.default_rng(0)
    b, n = 8, 512
    hb = {
        "pc0": rng.uniform(-40, 40, (b, n, 3)).astype(np.float32),
        "pc1": rng.uniform(-40, 40, (b, n, 3)).astype(np.float32),
        "pose0": np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)),
        "pose1": np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)),
        "pc0_mask": np.ones((b, n), bool),
        "pc1_mask": np.ones((b, n), bool),
        "flow": rng.normal(0, 0.1, (b, n, 3)).astype(np.float32),
        "flow_is_valid": np.ones((b, n), bool),
        "flow_category_indices": rng.integers(0, 20, (b, n)).astype(np.int32),
    }
    from deflow_tpu.models import build_model
    model = build_model(cfg.model, precision="fp32")
    mesh = T.create_mesh()

    def run_once():
        state = T.init_state(model, cfg, hb, seed=0)
        state = jax.device_put(state, T.replicated(mesh))
        step = T.jit_train_step(T.make_train_step(model, "deflowLoss"), mesh)
        _, aux = step(state, T.device_batch(hb, mesh))
        return float(aux["loss"])

    loss_xla = run_once()
    monkeypatch.setattr(V, "_use_pallas", lambda: True)
    loss_pallas = run_once()
    np.testing.assert_allclose(loss_pallas, loss_xla, rtol=1e-4)


def test_eval_cli_with_torch_checkpoint(cfg, tmp_path):
    """Full circle: export our weights as a torch .ckpt, then run eval.py's
    main() with checkpoint=<that .ckpt> — exercises the Lightning-format
    loader path end to end (reference deflow.py:41-47 contract)."""
    from deflow_tpu.convert import save_torch_checkpoint
    from deflow_tpu.entry.evaluate import main as eval_main

    ds = HDF5Dataset(str(cfg.train_data), max_points=int(cfg.max_points))
    model = build_model(cfg.model, precision="fp32")
    host_batch = next(iter(DataLoader(ds, 8)))
    state = T.init_state(model, cfg, host_batch, seed=0)
    ckpt_path = str(tmp_path / "exported.ckpt")
    save_torch_checkpoint(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)}, ckpt_path)
    ds.close()

    run_cfg = cfg.copy()
    run_cfg.checkpoint = ckpt_path
    run_cfg.av2_mode = "val"
    metrics = eval_main(run_cfg)
    assert np.isfinite(metrics["EPE_3way_mean"])


def test_best_checkpoint_keeper(cfg, tmp_path):
    """VERDICT r3 #5: ``val_monitor`` retains a best/ checkpoint — a better
    monitored val metric replaces it, a worse one does not."""
    ds = HDF5Dataset(str(cfg.train_data), max_points=int(cfg.max_points))
    model = build_model(cfg.model, precision="fp32")
    host_batch = next(iter(DataLoader(ds, 8)))
    state = T.init_state(model, cfg, host_batch, seed=0)

    keeper = T.BestCheckpointKeeper(str(tmp_path),
                                    str(cfg.model.val_monitor), mode="min")
    assert keeper.key == "EPE_3way_mean"

    p1 = keeper.update({"EPE_3way_mean": 0.5}, state, epoch=0)
    assert p1 and os.path.isdir(p1) and p1.endswith("best")
    # worse → no save, best unchanged
    state2 = state.replace(step=state.step + 1)
    assert keeper.update({"EPE_3way_mean": 0.7}, state2, epoch=1) is None
    restored, _ = T.load_checkpoint(p1, state)
    assert int(restored.step) == int(state.step)
    # better → overwrites with the new state
    p2 = keeper.update({"EPE_3way_mean": 0.3}, state2, epoch=2)
    assert p2 == p1
    restored, epoch = T.load_checkpoint(p1, state)
    assert int(restored.step) == int(state2.step) and epoch == 2
    # missing monitored key → ignored
    assert keeper.update({"other": 1.0}, state, epoch=3) is None
    assert keeper.best == 0.3
    ds.close()
