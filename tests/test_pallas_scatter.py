"""Pallas pillar-scatter kernel vs jax.ops.segment_sum golden (interpret mode
on the CPU mesh; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deflow_tpu.ops import pallas_scatter as ps


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas in interpreter mode on CPU."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    # clear the jit cache of the wrapped call so interpret takes effect
    ps._sorted_scatter.clear_cache()
    ps.segment_sum_lanes_pallas.clear_cache()
    yield
    ps._sorted_scatter.clear_cache()
    ps.segment_sum_lanes_pallas.clear_cache()


def test_matches_segment_sum():
    rng = np.random.default_rng(0)
    n, c, p = 4096, 33, 2048
    feats = rng.normal(size=(n, c)).astype(np.float32)
    pid = rng.integers(0, p + 1, n).astype(np.int32)  # includes trash id == p

    got = np.asarray(ps.pillar_sum_scatter_pallas(
        jnp.asarray(feats), jnp.asarray(pid), p))
    want = np.asarray(jax.ops.segment_sum(
        jnp.asarray(feats), jnp.asarray(pid), num_segments=p + 1))[:p]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_empty_and_skewed_pillars():
    rng = np.random.default_rng(1)
    n, c, p = 2048, 5, 1024
    feats = rng.normal(size=(n, c)).astype(np.float32)
    pid = np.zeros(n, np.int32)          # everything in pillar 0
    pid[-10:] = p - 1
    got = np.asarray(ps.pillar_sum_scatter_pallas(
        jnp.asarray(feats), jnp.asarray(pid), p))
    np.testing.assert_allclose(got[0], feats[:-10].sum(0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[p - 1], feats[-10:].sum(0), rtol=1e-5, atol=1e-5)
    assert np.all(got[1:p - 1] == 0)


def test_gradient_is_gather():
    rng = np.random.default_rng(2)
    n, c, p = 512, 4, 256
    feats = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    pid = jnp.asarray(rng.integers(0, p + 1, n).astype(np.int32))

    def loss(f):
        out = ps.pillar_sum_scatter_pallas(f, pid, p)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(feats)
    ref = jax.grad(lambda f: jnp.sum(
        jax.ops.segment_sum(f, pid, num_segments=p + 1)[:p] ** 2))(feats)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_planned_scatter_matches_plain(monkeypatch):
    """The shared-sort plan path must equal the plain path (and segment_sum)."""
    import deflow_tpu.ops.voxel as V
    from deflow_tpu.ops.pallas_scatter import make_scatter_plan

    rng = np.random.default_rng(4)
    n, c, p = 2048, 7, 1024
    feats = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    pid = jnp.asarray(rng.integers(0, p + 1, n).astype(np.int32))

    plan = make_scatter_plan(pid, p)
    got = np.asarray(ps.pillar_sum_scatter_pallas(feats, pid, p, plan=plan))
    want = np.asarray(jax.ops.segment_sum(feats, pid, num_segments=p + 1))[:p]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # gradient through the planned path
    def loss(f):
        return jnp.sum(ps.pillar_sum_scatter_pallas(f, pid, p, plan=plan) ** 2)
    g = jax.grad(loss)(feats)
    ref = jax.grad(lambda f: jnp.sum(
        jax.ops.segment_sum(f, pid, num_segments=p + 1)[:p] ** 2))(feats)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_embedder_plan_path_matches_xla(monkeypatch):
    """Force the TPU plan path (interpret mode) through the whole embedder and
    compare against the XLA fallback."""
    import deflow_tpu.ops.voxel as V
    from deflow_tpu.models.embedder import DynamicEmbedder

    rng = np.random.default_rng(5)
    b, n = 2, 1024
    pts = rng.uniform(-40, 40, (b, n, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 2, (b, n))
    mask = rng.random((b, n)) > 0.1
    cfg = V.VoxelConfig((0.8, 0.8, 6.0), (-51.2, -51.2, -3.0, 51.2, 51.2, 3.0))
    emb = DynamicEmbedder(voxel_cfg=cfg)
    variables = emb.init(jax.random.key(0), jnp.asarray(pts), jnp.asarray(mask))

    img_xla, info_xla, _ = emb.apply(variables, jnp.asarray(pts), jnp.asarray(mask))

    monkeypatch.setattr(V, "_use_pallas", lambda: True)
    img_pl, info_pl, plan = emb.apply(variables, jnp.asarray(pts), jnp.asarray(mask))
    assert plan is not None
    np.testing.assert_allclose(np.asarray(img_pl), np.asarray(img_xla),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_model_grad_plan_path_matches_xla(monkeypatch):
    """Gradients through the planned gather/scatter path (forced, interpret
    mode) must match the pure-XLA path — guards the custom VJPs end to end."""
    import deflow_tpu.ops.voxel as V
    from deflow_tpu.models import DeFlow

    rng = np.random.default_rng(6)
    b, n = 1, 512
    pts = rng.uniform(-40, 40, (b, n, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 2, (b, n))
    pc1 = rng.uniform(-40, 40, (b, n, 3)).astype(np.float32)
    pc1[..., 2] = rng.uniform(-2, 2, (b, n))
    mask = np.ones((b, n), bool)
    pose = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))

    model = DeFlow(voxel_size=(1.6, 1.6, 6.0), grid_feature_size=(64, 64),
                   num_iters=2)
    variables = model.init(jax.random.key(0), jnp.asarray(pts), jnp.asarray(pc1),
                           jnp.asarray(pose), jnp.asarray(pose),
                           jnp.asarray(mask), jnp.asarray(mask))

    def loss(params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          jnp.asarray(pts), jnp.asarray(pc1),
                          jnp.asarray(pose), jnp.asarray(pose),
                          jnp.asarray(mask), jnp.asarray(mask))
        return jnp.sum(out["flow"] ** 2)

    g_xla = jax.grad(loss)(variables["params"])
    monkeypatch.setattr(V, "_use_pallas", lambda: True)
    g_pl = jax.grad(loss)(variables["params"])

    flat_x = jax.tree.leaves(g_xla)
    flat_p = jax.tree.leaves(g_pl)
    for a, c in zip(flat_x, flat_p):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


def test_bf16_path_matches_segment_sum():
    """bf16 slab with base-128 id digit lanes: one-hot x bf16 products are
    exact, so sums must match the f32 segment_sum to bf16 resolution."""
    rng = np.random.default_rng(7)
    n, c, p = 4096, 33, 262144  # large P exercises the 3-digit decomposition
    feats = rng.normal(size=(n, c)).astype(np.float32)
    pid = rng.integers(0, p + 1, n).astype(np.int32)
    pid[:32] = p - 1  # a dense far pillar
    got = np.asarray(ps.pillar_sum_scatter_pallas(
        jnp.asarray(feats).astype(jnp.bfloat16), jnp.asarray(pid), p)
    ).astype(np.float32)
    want = np.asarray(jax.ops.segment_sum(
        jnp.asarray(feats).astype(jnp.bfloat16).astype(jnp.float32),
        jnp.asarray(pid), num_segments=p + 1))[:p]
    nz = np.abs(want) > 1e-6
    rel = np.abs(got[nz] - want[nz]) / np.abs(want[nz])
    assert rel.max() < 1.5e-2, rel.max()  # bf16 resolution
    # exact-zero empties
    empty = ~(np.abs(want).sum(1) > 0)
    assert np.all(got[empty] == 0)


def test_segment_sum_lanes_matches_segment_sum():
    """Dense-lane variant (chamfer-VJP scatter) vs segment_sum golden,
    including sentinel rows, empty segments and duplicate-heavy ids."""
    rng = np.random.default_rng(7)
    n, segs, lanes = 4096, 1500, 4
    pid = np.sort(rng.integers(0, segs + 9, n)).astype(np.int32)  # > segs: drop
    vals = rng.normal(size=(lanes, n)).astype(np.float32)

    got = np.asarray(ps.segment_sum_lanes_pallas(
        tuple(jnp.asarray(v) for v in vals), jnp.asarray(pid), segs))
    safe = np.clip(pid, 0, segs)
    want = np.stack([
        np.asarray(jax.ops.segment_sum(
            jnp.asarray(np.where(pid <= segs, v, 0.0)),
            jnp.asarray(safe), num_segments=segs + 1))[:segs]
        for v in vals])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_sum_lanes_single_lane_all_one_segment():
    pid = np.zeros(600, np.int32)
    vals = (jnp.ones((600,), jnp.float32),)
    got = np.asarray(ps.segment_sum_lanes_pallas(vals, jnp.asarray(pid), 300))
    assert got.shape == (1, 300)
    np.testing.assert_allclose(got[0, 0], 600.0, rtol=1e-6)
    np.testing.assert_allclose(got[0, 1:], 0.0)
