"""Coarse-grid chamfer backend: exactness under truncation vs brute force.

The grid search (ops/chamfer.py::_grid_search) replaces the reference's
brute-force chamfer3D CUDA extension (reference README.md:39) at full AV2
scale: binned 2 m XY cells + 3x3 neighbor search, exact for every NN distance
below ring*cell, which is all the truncated SSL loss can see.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deflow_tpu.ops.chamfer import (
    NNSpec,
    _resolve_spec,
    chamfer_distance,
    truncated_chamfer_loss,
)


def _clouds(seed=0, n=400, m=600, scale=9.0):
    rng = np.random.default_rng(seed)
    p = (rng.normal(size=(n, 3)) * scale).astype(np.float32)
    q = (rng.normal(size=(m, 3)) * scale).astype(np.float32)
    p[:, 2] *= 0.2
    q[:, 2] *= 0.2
    mp = rng.random(n) > 0.12
    mq = rng.random(m) > 0.12
    return p, q, mp, mq


def _brute(p, q, mq):
    full = ((p[:, None, :] - q[None, :, :]) ** 2).sum(-1)
    full[:, ~mq] = np.inf
    return full.min(1), full.argmin(1)


SPEC = NNSpec(method="grid", cell=2.0, ring=1, capacity=256, chunk=128)


def test_grid_matches_brute_below_radius():
    p, q, mp, mq = _clouds()
    d0, d1, i0, i1 = chamfer_distance(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(mp), jnp.asarray(mq),
        return_idx=True, spec=SPEC)
    bd0, bi0 = _brute(p, q, mq)
    bd1, bi1 = _brute(q, p, mp)
    r2 = (SPEC.ring * SPEC.cell) ** 2
    near0 = mp & (bd0 < r2)
    near1 = mq & (bd1 < r2)
    assert near0.sum() > 50 and near1.sum() > 50  # fixture actually tests it
    np.testing.assert_allclose(np.asarray(d0)[near0], bd0[near0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1)[near1], bd1[near1],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0)[near0], bi0[near0])
    np.testing.assert_array_equal(np.asarray(i1)[near1], bi1[near1])
    # beyond the radius the grid may only OVERestimate (a clipped lower bound
    # for the loss) and masked rows stay exactly zero
    far0 = mp & ~near0
    assert np.all(np.asarray(d0)[far0] >= bd0[far0] - 1e-4)
    assert np.all(np.asarray(d0)[~mp] == 0.0)


def test_truncated_loss_grid_equals_brute():
    p, q, mp, mq = _clouds(seed=3)
    args = (jnp.asarray(p), jnp.asarray(q), jnp.asarray(mp), jnp.asarray(mq))
    lb = truncated_chamfer_loss(*args, truncate=2.0, method="brute")
    d0, d1 = chamfer_distance(*args, spec=SPEC)
    t2 = 4.0
    lg = (jnp.sum(jnp.minimum(d0, t2)) / mp.sum()
          + jnp.sum(jnp.minimum(d1, t2)) / mq.sum())
    np.testing.assert_allclose(float(lg), float(lb), rtol=1e-5)


def test_truncated_loss_grad_grid_equals_brute():
    p, q, mp, mq = _clouds(seed=7, n=200, m=300)

    def loss(pc0, method, spec=None):
        d0, d1 = chamfer_distance(pc0, jnp.asarray(q), jnp.asarray(mp),
                                  jnp.asarray(mq), method=method,
                                  truncate=2.0, spec=spec)
        return (jnp.sum(jnp.minimum(d0, 4.0)) / mp.sum()
                + jnp.sum(jnp.minimum(d1, 4.0)) / mq.sum())

    gb = jax.grad(lambda x: loss(x, "brute"))(jnp.asarray(p))
    gg = jax.grad(lambda x: loss(x, "grid", SPEC))(jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gb),
                               rtol=1e-4, atol=1e-5)


def test_grid_batched_vmap():
    ps, qs, mps, mqs = zip(*[_clouds(seed=s, n=256, m=256) for s in (1, 2)])
    d0, d1 = chamfer_distance(
        jnp.asarray(np.stack(ps)), jnp.asarray(np.stack(qs)),
        jnp.asarray(np.stack(mps)), jnp.asarray(np.stack(mqs)), spec=SPEC)
    for b in range(2):
        bd0, _ = _brute(ps[b], qs[b], mqs[b])
        near = mps[b] & (bd0 < 4.0)
        np.testing.assert_allclose(np.asarray(d0[b])[near], bd0[near],
                                   rtol=1e-5, atol=1e-5)


def test_capacity_overflow_only_overestimates():
    # 600 points crammed into one cell with capacity 8: dropped candidates may
    # raise the reported distance but never lower it (loss stays a valid
    # truncated upper bound)
    p, q, mp, mq = _clouds(seed=5, scale=0.4)
    small = SPEC._replace(capacity=8)
    d0, _ = chamfer_distance(jnp.asarray(p), jnp.asarray(q),
                             jnp.asarray(mp), jnp.asarray(mq), spec=small)
    bd0, _ = _brute(p, q, mq)
    assert np.all(np.asarray(d0)[mp] >= bd0[mp] - 1e-4)
    # with this density the subsample NN is still loosely tight (soft sanity
    # bound, not a semantic pin — overflow keeps the first K points per cell)
    assert float(np.median(np.asarray(d0)[mp] - bd0[mp])) < 0.3


def test_grid_batched_empty_sample():
    """Flat-batch core with one fully-masked sample: no NaNs, zero rows,
    and the other sample stays exact (blocks must not bleed)."""
    p0, q0, mp0, mq0 = _clouds(seed=4, n=256, m=256)
    p = np.stack([p0, p0])
    q = np.stack([q0, q0])
    mp = np.stack([mp0, np.zeros_like(mp0)])
    mq = np.stack([mq0, np.zeros_like(mq0)])
    d0, d1 = chamfer_distance(jnp.asarray(p), jnp.asarray(q),
                              jnp.asarray(mp), jnp.asarray(mq), spec=SPEC)
    assert np.all(np.isfinite(np.asarray(d0)))
    assert np.all(np.asarray(d0)[1] == 0.0) and np.all(np.asarray(d1)[1] == 0.0)
    bd0, _ = _brute(p0, q0, mq0)
    near = mp0 & (bd0 < 4.0)
    np.testing.assert_allclose(np.asarray(d0)[0][near], bd0[near],
                               rtol=1e-5, atol=1e-5)

    # gradients through the empty sample must be exactly zero
    g = jax.grad(lambda x: float(0) + jnp.sum(jnp.minimum(
        chamfer_distance(x, jnp.asarray(q), jnp.asarray(mp),
                         jnp.asarray(mq), spec=SPEC)[0], 4.0)))(jnp.asarray(p))
    assert np.all(np.asarray(g)[1] == 0.0)
    assert np.all(np.isfinite(np.asarray(g)))


def test_vjp_scatter_pallas_path(monkeypatch):
    """The sort+Pallas-segment-sum mirror scatter == the XLA scatter-add."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    import deflow_tpu.ops.voxel as V
    monkeypatch.setattr(V, "_use_pallas", lambda: True)
    import deflow_tpu.ops.chamfer as CH
    monkeypatch.setattr(CH, "_SCATTER_PALLAS_MIN", 1)

    rng = np.random.default_rng(13)
    b, n_rows, m = 2, 300, 400
    base = rng.normal(size=(b, n_rows, 3)).astype(np.float32)
    i = rng.integers(-5, n_rows + 5, (b, m)).astype(np.int32)  # some dropped
    w = rng.normal(size=(b, m, 3)).astype(np.float32)
    out = CH._scatter_rows(jnp.asarray(base), jnp.asarray(i), jnp.asarray(w))
    ref = base.copy()
    for bb in range(b):
        for k in range(m):
            if 0 <= i[bb, k] < n_rows:
                ref[bb, i[bb, k]] += w[bb, k]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_auto_dispatch_scale_threshold():
    assert _resolve_spec("auto", 131072, 131072, 2.0, None).method == "grid"
    assert _resolve_spec("auto", 4096, 4096, 2.0, None).method == "brute"
    assert _resolve_spec("auto", 131072, 131072, None, None).method == "brute"


def test_fused_ssl_chamfer_matches_two_calls():
    """One dual-mask sweep == two separate grid calls (values AND grads)."""
    from deflow_tpu.ops.chamfer import ssl_chamfer_distances

    p, q, mp, mq = _clouds(seed=9, n=300, m=300)
    rng = np.random.default_rng(9)
    f0 = mp & (rng.random(300) < 0.4)
    f1 = mq & (rng.random(300) < 0.4)
    args = [jnp.asarray(x) for x in (p, q, mp, mq, f0, f1)]

    def fused(pc0):
        d0, d1, dd0, dd1 = ssl_chamfer_distances(
            pc0, *args[1:], truncate=2.0, spec=SPEC)
        return d0, d1, dd0, dd1

    def two_calls(pc0):
        d0, d1 = chamfer_distance(pc0, args[1], args[2], args[3], spec=SPEC)
        dd0, dd1 = chamfer_distance(pc0, args[1], args[4], args[5], spec=SPEC)
        return d0, d1, dd0, dd1

    fa = fused(args[0])
    fb = two_calls(args[0])
    t2 = 4.0
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(jnp.minimum(a, t2)),
                                   np.asarray(jnp.minimum(b, t2)),
                                   rtol=1e-5, atol=1e-5)

    def loss(fn, pc0):
        d0, d1, dd0, dd1 = fn(pc0)
        return sum(jnp.sum(jnp.minimum(d, t2)) for d in (d0, d1, dd0, dd1))

    ga = jax.grad(lambda x: loss(fused, x))(args[0])
    gb = jax.grad(lambda x: loss(two_calls, x))(args[0])
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-5)


def test_seflow_loss_grid_matches_brute():
    from deflow_tpu.losses import seflow_loss

    rng = np.random.default_rng(11)
    n = 256
    pc0 = (rng.normal(size=(1, n, 3)) * 6).astype(np.float32)
    pc1 = pc0 + rng.normal(size=(1, n, 3)).astype(np.float32) * 0.3
    mask = rng.random((1, n)) > 0.1
    out = {
        "flow": jnp.asarray(rng.normal(size=(1, n, 3)).astype(np.float32) * 0.1),
        "pose_flow": jnp.zeros((1, n, 3), jnp.float32),
        "pc0_valid": jnp.asarray(mask),
        "pc1_valid": jnp.asarray(mask),
    }
    batch = {
        "pc0": jnp.asarray(pc0), "pc1": jnp.asarray(pc1),
        "pc0_mask": jnp.asarray(mask), "pc1_mask": jnp.asarray(mask),
        "dufo_label0": jnp.asarray((rng.random((1, n)) > 0.5).astype(np.int32)),
        "dufo_label1": jnp.asarray((rng.random((1, n)) > 0.5).astype(np.int32)),
    }
    lb = seflow_loss(out, batch, chamfer_method="brute")
    lg = seflow_loss(out, batch, chamfer_method="grid")
    np.testing.assert_allclose(float(lg), float(lb), rtol=1e-4)


def test_grid_overflow_stats():
    """Telemetry for the XLA fallback's capacity drops: counts points beyond
    capacity per cell (the Pallas sweep path has no capacity at all)."""
    import jax.numpy as jnp

    from deflow_tpu.ops.chamfer import NNSpec, grid_overflow_stats

    spec = NNSpec(method="grid", cell=2.0, capacity=4,
                  lo=(-8.0, -8.0), hi=(8.0, 8.0))
    # 10 points in one cell (cap 4 → 6 dropped), 2 in another, 4 masked
    pts = np.zeros((16, 3), np.float32)
    pts[:10] = [1.0, 1.0, 0.0]
    pts[10:12] = [-5.0, -5.0, 0.0]
    mask = np.ones(16, bool)
    mask[12:] = False
    drop, cellfrac, cmax = grid_overflow_stats(
        jnp.asarray(pts), jnp.asarray(mask), spec)
    np.testing.assert_allclose(float(drop), 6 / 12, rtol=1e-6)
    assert int(cmax) == 10
    assert 0 < float(cellfrac) < 1


def test_compacted_dyn_backward_matches_full():
    """spec.dyn_cap compacts the f-term VJP work to a static row budget;
    gradients are exact whenever the per-sample dynamic count <= cap."""
    from deflow_tpu.ops.chamfer import ssl_chamfer_distances

    p, q, mp, mq = _clouds(seed=13, n=320, m=320)
    rng = np.random.default_rng(13)
    f0 = mp & (rng.random(320) < 0.25)   # ~80 dynamic rows < cap
    f1 = mq & (rng.random(320) < 0.25)
    args = [jnp.asarray(x) for x in (p, q, mp, mq, f0, f1)]
    t2 = 4.0

    def loss(pc0, pc1, spec):
        d0, d1, dd0, dd1 = ssl_chamfer_distances(
            pc0, pc1, *args[2:], truncate=2.0, spec=spec)
        return sum(jnp.sum(jnp.minimum(d, t2)) for d in (d0, d1, dd0, dd1))

    cap_spec = SPEC._replace(dyn_cap=128)
    vf, gf = jax.value_and_grad(loss, argnums=(0, 1))(args[0], args[1], SPEC)
    vc, gc = jax.value_and_grad(loss, argnums=(0, 1))(
        args[0], args[1], cap_spec)
    np.testing.assert_allclose(float(vc), float(vf), rtol=1e-6)
    for a, c in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_dyn_cap_overflow_stats():
    from deflow_tpu.ops.chamfer import NNSpec, dyn_cap_overflow_stats

    flags = jnp.asarray(np.array([[1] * 50 + [0] * 50,
                                  [1] * 90 + [0] * 10], bool))
    mx, cap, frac = dyn_cap_overflow_stats(flags,
                                           spec=NNSpec(dyn_cap=64))
    assert int(mx) == 90 and cap == 64 and float(frac) == 0.5
    # default = N (no compaction: never overflows)
    mx, cap, frac = dyn_cap_overflow_stats(flags)
    assert cap == 100 and float(frac) == 0.0


def test_dyn_cap_monitor_warns_on_late_spike():
    """The trainer's continuous dyn_cap monitor (VERDICT r4 #7): a density
    spike appearing only late in training still warns; repeated identical
    batches do not spam; a new, higher maximum warns again."""
    import warnings

    from deflow_tpu.entry.train import DynCapMonitor

    n, cap = 96, 32

    def batch(k):
        dufo = np.zeros((2, n), np.int8)
        dufo[0, :k] = 1
        return {"dufo_label0": dufo, "pc0_mask": np.ones((2, n), bool)}

    mon = DynCapMonitor(dyn_cap=cap)
    with warnings.catch_warnings():
        warnings.simplefilter("error")          # under-cap batch: silence
        mon.check(batch(cap))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mon.check(batch(cap + 5))               # late spike → warn
        mon.check(batch(cap + 5))               # same max → deduped
        mon.check(batch(cap + 9))               # new max → warn again
    assert len(w) == 2 and all("dyn_cap" in str(x.message) for x in w)
    assert mon.seen_max == cap + 9
