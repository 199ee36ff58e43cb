"""Multi-chip readiness: the full train step at batch_size=16 over the
8-device mesh must compile+run with the batch axis PARTITIONED (not
replicated) and parameters replicated — so the first real v5e-8 run is
wiring-risk-free (VERDICT r1 #10; reference trains 8-GPU DDP,
assets/slurm/1_train.sh)."""

import numpy as np
import pytest

import jax

from deflow_tpu.config import compose
from deflow_tpu.data.host_prep import attach_host_prep
from deflow_tpu.models import build_model
from deflow_tpu import trainer as T

VOXEL = [1.6, 1.6, 6.0]
RANGE = [-51.2, -51.2, -3.0, 51.2, 51.2, 3.0]


def _host_batch(b, n, seed=0):
    rng = np.random.default_rng(seed)
    pc = lambda: np.stack([
        rng.uniform(-45, 45, (b, n)), rng.uniform(-45, 45, (b, n)),
        rng.uniform(-2, 2, (b, n))], axis=-1).astype(np.float32)
    pose0 = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    pose1 = pose0.copy()
    pose1[:, 0, 3] = 1.2
    mask = np.ones((b, n), bool)
    hb = {"pc0": pc(), "pc1": pc(), "pose0": pose0, "pose1": pose1,
          "pc0_mask": mask, "pc1_mask": mask.copy(),
          "flow": rng.normal(0, 0.1, (b, n, 3)).astype(np.float32),
          "flow_is_valid": mask.copy(),
          "flow_category_indices": rng.integers(0, 20, (b, n)).astype(np.int32)}
    return attach_host_prep(hb, VOXEL, RANGE, sort=True)


@pytest.mark.slow
def test_bs16_train_step_partitions_batch_over_8_devices():
    assert len(jax.devices()) >= 8, "conftest must provide the virtual mesh"
    mesh = T.create_mesh(8)
    b, n = 16, 1024
    cfg = compose("config", [
        f"batch_size={b}", f"max_points={n}",
        "voxel_size=[1.6,1.6,6]", "model.target.grid_feature_size=[64,64]",
        "model.target.num_iters=2", "precision=fp32",
    ])
    model = build_model(cfg.model, precision="fp32")
    hb = _host_batch(b, n)

    state = T.init_state(model, cfg, hb, seed=0)
    state = jax.device_put(state, T.replicated(mesh))
    step = T.jit_train_step(T.make_train_step(model, "deflowLoss"), mesh)
    batch = T.device_batch(hb, mesh)

    # the batch axis is PARTITIONED: each of 8 devices holds bs=2, and the
    # device set covers the whole mesh (a replicated batch would show (16,…))
    shards = batch["pc0"].addressable_shards
    assert len(shards) == 8
    assert {s.data.shape for s in shards} == {(2, n, 3)}
    assert not batch["pc0"].sharding.is_fully_replicated

    new_state, aux = step(state, batch)
    loss = float(aux["loss"])
    assert np.isfinite(loss)
    # params (and their updates) stay replicated across the mesh
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated

    # gradient all-reduce really averaged over the full global batch:
    # loss/epe match a single-device run of the same global batch
    state1 = T.init_state(model, cfg, hb, seed=0)
    step1 = T.jit_train_step(T.make_train_step(model, "deflowLoss"), None)
    _, aux1 = step1(state1, T.device_batch(hb, None))
    np.testing.assert_allclose(loss, float(aux1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(aux["epe"]), float(aux1["epe"]), rtol=1e-5)


@pytest.mark.slow
def test_sharded_ssl_grid_chamfer_matches_single_device():
    """shard_map'd grid-chamfer SSL loss (per-chip local sorts, zero
    collectives inside the loss) == the unsharded value, including grads
    (VERDICT r2 #2; reference trains SeFlow under 8-GPU DDP with per-rank
    losses, assets/slurm/1_train.sh)."""
    import jax.numpy as jnp

    from deflow_tpu.losses import seflow_loss

    assert len(jax.devices()) >= 8
    mesh = T.create_mesh(8)
    b, n = 8, 512
    rng = np.random.default_rng(7)
    hb = _host_batch(b, n, seed=7)
    batch = {k: jnp.asarray(hb[k])
             for k in ("pc0", "pc1", "pc0_mask", "pc1_mask")}
    batch["dufo_label0"] = jnp.asarray(
        (rng.random((b, n)) > 0.6).astype(np.int32))
    batch["dufo_label1"] = jnp.asarray(
        (rng.random((b, n)) > 0.6).astype(np.int32))
    flow = jnp.asarray(rng.normal(0, 0.05, (b, n, 3)).astype(np.float32))

    def loss(fl, mesh_arg):
        out = {"flow": fl, "pose_flow": jnp.zeros_like(fl),
               "pc0_valid": batch["pc0_mask"], "pc1_valid": batch["pc1_mask"]}
        return seflow_loss(out, batch, chamfer_method="grid", mesh=mesh_arg)

    v1, g1 = jax.value_and_grad(lambda f: loss(f, None))(flow)

    shard = T.batch_sharding(mesh)
    flow_s = jax.device_put(flow, shard)
    v8, g8 = jax.jit(jax.value_and_grad(lambda f: loss(f, mesh)))(flow_s)

    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sharded_compacted_dyn_vjp_matches_single_device():
    """NNSpec.dyn_cap (compacted f-term VJP) under shard_map over the data
    axis == the unsharded value and grads — the compaction sort/gathers are
    per-sample, so they stay chip-local."""
    import functools

    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from deflow_tpu.ops.chamfer import NNSpec, ssl_chamfer_distances

    assert len(jax.devices()) >= 8
    mesh = T.create_mesh(8)
    b, n = 8, 384
    rng = np.random.default_rng(21)
    pc0 = jnp.asarray(rng.normal(0, 9, (b, n, 3)).astype(np.float32))
    pc1 = jnp.asarray(rng.normal(0, 9, (b, n, 3)).astype(np.float32))
    m0 = jnp.asarray(rng.random((b, n)) > 0.1)
    m1 = jnp.asarray(rng.random((b, n)) > 0.1)
    f0 = m0 & jnp.asarray(rng.random((b, n)) < 0.3)
    f1 = m1 & jnp.asarray(rng.random((b, n)) < 0.3)
    spec = NNSpec(method="grid", chunk=128, capacity=256, dyn_cap=192)
    nn = functools.partial(ssl_chamfer_distances, truncate=2.0, spec=spec)

    def loss(fn, p):
        d0, d1, dd0, dd1 = fn(p, pc1, m0, m1, f0, f1)
        return sum(jnp.sum(jnp.minimum(d, 4.0)) for d in (d0, d1, dd0, dd1))

    v1, g1 = jax.value_and_grad(lambda p: loss(nn, p))(pc0)

    sharded = shard_map(nn, mesh=mesh, in_specs=(P("data"),) * 6,
                        out_specs=(P("data"),) * 4, check_vma=False)
    pc0_s = jax.device_put(pc0, T.batch_sharding(mesh))
    v8, g8 = jax.jit(jax.value_and_grad(lambda p: loss(sharded, p)))(pc0_s)

    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g1),
                               rtol=1e-5, atol=1e-6)
