"""Sorted-sweep Pallas gather kernel vs XLA row gather (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    import deflow_tpu.ops.voxel as V
    monkeypatch.setattr(V, "_use_pallas", lambda: True)


def _sorted_ids(rng, m, num_rows, sentinel_runs=True):
    """Ascending ids with optional mid-stream sentinel runs (the flat
    per-sample layout: [sample0 ids..., sentinels, sample1 ids...])."""
    if not sentinel_runs:
        return np.sort(rng.integers(0, num_rows, m)).astype(np.int32)
    half = m // 2
    a = np.sort(rng.integers(0, num_rows // 2, half - 7))
    b = np.sort(rng.integers(num_rows // 2, num_rows, m - half - 9))
    ids = np.concatenate([
        a, np.full(7, 2**30), b, np.full(9, 2**30)]).astype(np.int32)
    return ids


@pytest.mark.parametrize("dtype", [np.float32, np.bfloat16
                                   if hasattr(np, "bfloat16") else np.float32])
@pytest.mark.parametrize("c", [33, 128])
def test_gather_matches_xla(interpret_pallas, dtype, c):
    from deflow_tpu.ops.pallas_gather import sorted_rows_gather_pallas

    rng = np.random.default_rng(0)
    num_rows, m = 3000, 1200
    table = rng.normal(size=(num_rows, c)).astype(np.float32)
    ids = _sorted_ids(rng, m, num_rows)
    jt = jnp.asarray(table, dtype=jnp.bfloat16 if c == 128 else jnp.float32)
    out = sorted_rows_gather_pallas(jt, jnp.asarray(ids), num_rows)
    ref = np.where((ids < num_rows)[:, None],
                   np.asarray(jt, np.float32)[np.clip(ids, 0, num_rows - 1)],
                   0.0)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=1e-6, atol=1e-6)


def test_gather_dense_spans(interpret_pallas):
    """Near-field regime: long runs of equal ids (one window, many rows)."""
    from deflow_tpu.ops.pallas_gather import sorted_rows_gather_pallas

    rng = np.random.default_rng(1)
    num_rows = 1024
    ids = np.sort(rng.integers(0, 40, 2048)).astype(np.int32)
    table = rng.normal(size=(num_rows, 16)).astype(np.float32)
    out = sorted_rows_gather_pallas(jnp.asarray(table), jnp.asarray(ids),
                                    num_rows)
    np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)


def test_gather_sparse_wide_range(interpret_pallas):
    """Far-field regime: few ids spread over many windows per chunk."""
    from deflow_tpu.ops.pallas_gather import sorted_rows_gather_pallas

    rng = np.random.default_rng(2)
    num_rows = 8192
    ids = np.sort(rng.choice(num_rows, 600, replace=False)).astype(np.int32)
    table = rng.normal(size=(num_rows, 8)).astype(np.float32)
    out = sorted_rows_gather_pallas(jnp.asarray(table), jnp.asarray(ids),
                                    num_rows)
    np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)


def test_gather_all_sentinel_chunks(interpret_pallas):
    from deflow_tpu.ops.pallas_gather import sorted_rows_gather_pallas

    table = jnp.ones((512, 8), jnp.float32)
    ids = jnp.full((600,), 2**30, jnp.int32)
    out = sorted_rows_gather_pallas(table, ids, 512)
    assert float(jnp.abs(out).max()) == 0.0


def test_planned_gather_uses_kernel_and_grads(interpret_pallas):
    """_gather_planned on a presorted plan: forward == XLA reference and the
    VJP (Pallas scatter) still matches the dense autodiff scatter-add."""
    from deflow_tpu.ops.voxel import (
        TRASH_PAD, VoxelConfig, _gather_planned, make_presorted_plan,
        pillar_info_from_ids)

    cfg = VoxelConfig((1.6, 1.6, 6.0), (-12.8, -12.8, -3.0, 12.8, 12.8, 3.0))
    p = cfg.num_pillars
    rng = np.random.default_rng(3)
    b, n = 2, 512
    ids = np.sort(rng.integers(0, p + 1, (b, n)), axis=1).astype(np.int32)
    pts = rng.normal(size=(b, n, 3)).astype(np.float32)
    mask = ids < p
    info = jax.vmap(lambda pp, mm, ii: pillar_info_from_ids(pp, mm, ii, cfg))(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(ids))
    plan = make_presorted_plan(jnp.asarray(ids), p + TRASH_PAD)
    assert plan is not None and plan.order is None

    table = jnp.asarray(rng.normal(size=(b, p, 8)).astype(np.float32))

    out = _gather_planned(table, info.pillar_id, info.valid, plan)
    ref = np.stack([
        np.where(mask[i][:, None],
                 np.asarray(table)[i][np.clip(ids[i], 0, p - 1)], 0.0)
        for i in range(b)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)

    def loss(t):
        return jnp.sum(_gather_planned(t, info.pillar_id, info.valid, plan) ** 2)

    g = jax.grad(loss)(table)
    gref = np.zeros_like(np.asarray(table))
    for i in range(b):
        np.add.at(gref[i], np.clip(ids[i], 0, p - 1), 2 * ref[i])
    np.testing.assert_allclose(np.asarray(g), gref, rtol=1e-4, atol=1e-5)
