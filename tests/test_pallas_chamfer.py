"""Pallas chamfer kernel (interpret mode) + matched-pair VJP semantics."""

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


def _clouds(seed=5, n=300, m=500):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(n, 3)).astype(np.float32) * 3
    q = rng.normal(size=(m, 3)).astype(np.float32) * 3
    mp = rng.random(n) > 0.1
    mq = rng.random(m) > 0.1
    return p, q, mp, mq


def test_pallas_chamfer_matches_bruteforce(interpret_pallas):
    from deflow_tpu.ops.pallas_chamfer import chamfer_min_pallas

    p, q, _, mq = _clouds()
    d, i = chamfer_min_pallas(jnp.asarray(p), jnp.asarray(q), jnp.asarray(mq))
    full = ((p[:, None, :] - q[None, :, :]) ** 2).sum(-1)
    full[:, ~mq] = np.inf
    np.testing.assert_allclose(np.asarray(d), full.min(1), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), full.argmin(1))


def test_pallas_chamfer_batched(interpret_pallas):
    from deflow_tpu.ops.pallas_chamfer import chamfer_min_pallas

    ps, qs, ms = [], [], []
    for s in (1, 2):
        p, q, _, mq = _clouds(seed=s, n=128, m=256)
        ps.append(p); qs.append(q); ms.append(mq)
    d, i = chamfer_min_pallas(jnp.asarray(np.stack(ps)),
                              jnp.asarray(np.stack(qs)),
                              jnp.asarray(np.stack(ms)))
    for b in range(2):
        full = ((ps[b][:, None, :] - qs[b][None, :, :]) ** 2).sum(-1)
        full[:, ~ms[b]] = np.inf
        np.testing.assert_allclose(np.asarray(d[b]), full.min(1),
                                   rtol=1e-4, atol=1e-4)


def test_chamfer_vjp_matches_matched_pair_formula():
    """Custom VJP == analytic subgradient at the matched pairs (the CUDA
    extension's autograd semantics)."""
    from deflow_tpu.ops.chamfer import chamfer_distance

    p, q, mp, mq = _clouds(seed=9, n=200, m=300)
    jp, jq = jnp.asarray(p), jnp.asarray(q)
    jmp, jmq = jnp.asarray(mp), jnp.asarray(mq)

    def loss(pc0):
        d0, d1 = chamfer_distance(pc0, jq, jmp, jmq, tile=128)
        return jnp.sum(d0) + jnp.sum(d1)

    g = np.asarray(jax.grad(loss)(jp))

    full = ((p[:, None, :] - q[None, :, :]) ** 2).sum(-1)
    full[:, ~mq] = np.inf
    full[~mp, :] = np.inf
    i0 = full.argmin(1)
    i1 = full.argmin(0)
    want = np.zeros_like(p)
    want[mp] += 2.0 * (p[mp] - q[i0[mp]])               # d0 direct term
    for j in np.flatnonzero(mq):                        # d1 mirror term
        want[i1[j]] += -2.0 * (q[j] - p[i1[j]])
    np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-4)


def test_batched_chamfer_distance_matches_percloud():
    from deflow_tpu.ops.chamfer import chamfer_distance

    p0, q0, mp0, mq0 = _clouds(seed=3, n=100, m=140)
    p1, q1, mp1, mq1 = _clouds(seed=4, n=100, m=140)
    d0b, d1b = chamfer_distance(
        jnp.asarray(np.stack([p0, p1])), jnp.asarray(np.stack([q0, q1])),
        jnp.asarray(np.stack([mp0, mp1])), jnp.asarray(np.stack([mq0, mq1])),
        tile=64)
    for b, (p, q, mp, mq) in enumerate([(p0, q0, mp0, mq0),
                                        (p1, q1, mp1, mq1)]):
        d0, d1 = chamfer_distance(jnp.asarray(p), jnp.asarray(q),
                                  jnp.asarray(mp), jnp.asarray(mq), tile=64)
        np.testing.assert_allclose(np.asarray(d0b[b]), np.asarray(d0),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d1b[b]), np.asarray(d1),
                                   rtol=1e-5, atol=1e-6)
