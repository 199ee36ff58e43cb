"""Fused conv3x3+BN+GELU chain kernels (ops/pallas_cbg.py) vs the plain
XLA reference — forward, batch stats, and the full custom-VJP backward.

Reference semantics: ConvWithNorms (reference decoder.py:202-220) in train
mode — conv + bias, BatchNorm on batch stats (fast variance E[x²]−E[x]²,
ε=1e-5), exact GELU.  Interpret mode on CPU.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))


EPS = 1e-5


def _plain_chain(x, params, eps=EPS):
    """Reference: sequence of conv3x3+bias -> BN(batch stats) -> GELU."""
    s_prev = x
    means, variances = [], []
    for (wm, bi, ga, be) in params:
        s = jax.lax.conv_general_dilated(
            s_prev, wm, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bi[0]
        mu = s.mean(axis=(0, 1, 2))
        var = (s * s).mean(axis=(0, 1, 2)) - mu * mu
        z = (s - mu) * jax.lax.rsqrt(var + eps) * ga + be
        s_prev = jax.nn.gelu(z, approximate=False)
        means.append(mu)
        variances.append(var)
    return s_prev, means, variances


def _mk_params(key, chans):
    ps = []
    for cin, cout in zip(chans[:-1], chans[1:]):
        key, k1, k2, k3 = jax.random.split(key, 4)
        ps.append((
            jax.random.normal(k1, (3, 3, cin, cout), jnp.float32) * 0.2,
            jax.random.normal(k2, (1, cout), jnp.float32) * 0.1,
            1.0 + 0.1 * jax.random.normal(k3, (cout,), jnp.float32),
            0.05 * jax.random.normal(key, (cout,), jnp.float32),
        ))
    return tuple(ps)


def _run_fused(x, params):
    from deflow_tpu.ops import pallas_cbg as C

    b, h, w, c = x.shape
    x_g = C.guard_pad(x.reshape(b * h * w, c), b, h, w)
    (y_g, means, variances) = C.cbg_chain((b, h, w, EPS), x_g, params)
    y = C.guard_slice(y_g, b, h, w).reshape(b, h, w, params[-1][0].shape[-1])
    return y, means, variances


@pytest.mark.parametrize("chans", [(8, 8, 8, 8), (8, 16, 8)])
@pytest.mark.slow
def test_fwd_matches_plain(chans):
    rng = np.random.default_rng(0)
    b, h, w = 2, 16, 8
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, chans[0])).astype(np.float32))
    params = _mk_params(jax.random.key(1), chans)

    y_ref, mu_ref, var_ref = _plain_chain(x, params)
    y, mu, var = _run_fused(x, params)

    for m, mr in zip(mu, mu_ref):
        np.testing.assert_allclose(np.asarray(m), np.asarray(mr),
                                   rtol=1e-5, atol=1e-5)
    for v, vr in zip(var, var_ref):
        np.testing.assert_allclose(np.asarray(v), np.asarray(vr),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_bwd_matches_plain():
    rng = np.random.default_rng(2)
    chans = (8, 8, 8, 8)
    b, h, w = 2, 16, 8
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, chans[0])).astype(np.float32))
    tgt = jnp.asarray(rng.normal(0, 1, (b, h, w, chans[-1])).astype(np.float32))
    params = _mk_params(jax.random.key(3), chans)

    def loss_ref(x, params):
        y, _, _ = _plain_chain(x, params)
        return jnp.sum((y - tgt) ** 2)

    def loss_fused(x, params):
        y, _, _ = _run_fused(x, params)
        return jnp.sum((y - tgt) ** 2)

    v0, (gx0, gp0) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, params)
    v1, (gx1, gp1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(x, params)

    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-3, atol=1e-4)
    for blk0, blk1 in zip(gp0, gp1):
        for a, c in zip(blk0, blk1):
            np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                       rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_headbn_chain_matches_plain():
    """head_gb: the chain applies BN0+GELU0 of its pre-BN input in the first
    block's load phase — forward, head stats, dL/dx (pre-BN cotangent with
    the BN backward correction), and d(gamma0)/d(beta0)."""
    from deflow_tpu.ops import pallas_cbg as C

    rng = np.random.default_rng(11)
    chans = (8, 8, 8)
    b, h, w = 2, 16, 8
    x = jnp.asarray(rng.normal(0, 1.3, (b, h, w, chans[0])).astype(np.float32))
    tgt = jnp.asarray(rng.normal(0, 1, (b, h, w, chans[-1])).astype(np.float32))
    params = _mk_params(jax.random.key(9), chans)
    ga0 = jnp.asarray(1.0 + 0.1 * rng.normal(0, 1, chans[0]), jnp.float32)
    be0 = jnp.asarray(0.05 * rng.normal(0, 1, chans[0]), jnp.float32)

    def ref(x, params, ga0, be0):
        xf = x
        mu = xf.mean(axis=(0, 1, 2))
        var = (xf * xf).mean(axis=(0, 1, 2)) - mu * mu
        z0 = (xf - mu) * jax.lax.rsqrt(var + EPS) * ga0 + be0
        u = jax.nn.gelu(z0, approximate=False)
        y, mus, _ = _plain_chain(u, params)
        return y, [mu] + mus

    def fused(x, params, ga0, be0):
        x_g = C.guard_pad(x.reshape(b * h * w, chans[0]), b, h, w)
        y_g, mus, _ = C.cbg_chain((b, h, w, EPS), x_g, params, (ga0, be0))
        return C.guard_slice(y_g, b, h, w).reshape(b, h, w, chans[-1]), mus

    y0, mus0 = ref(x, params, ga0, be0)
    y1, mus1 = fused(x, params, ga0, be0)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)
    for m0, m1 in zip(mus0, mus1):
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                                   rtol=1e-5, atol=1e-5)

    loss0 = lambda *a: jnp.sum((ref(*a)[0] - tgt) ** 2)
    loss1 = lambda *a: jnp.sum((fused(*a)[0] - tgt) ** 2)
    v0, g0 = jax.value_and_grad(loss0, argnums=(0, 1, 2, 3))(
        x, params, ga0, be0)
    v1, g1 = jax.value_and_grad(loss1, argnums=(0, 1, 2, 3))(
        x, params, ga0, be0)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    jax.tree.map(lambda a, c: np.testing.assert_allclose(
        np.asarray(c), np.asarray(a), rtol=1e-3, atol=3e-4), g0, g1)


@pytest.mark.heavy
def test_fused_unet_matches_plain(monkeypatch):
    """DEFLOW_FUSED_CBG=1: identical variable tree (conv/batchnorm names),
    matching forward, batch-stat updates, and gradients vs the plain UNet."""
    import deflow_tpu.ops.voxel as V
    monkeypatch.setattr(V, "_use_pallas", lambda: True)

    from deflow_tpu.models.unet import FastFlow3DUNet

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 32)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 32)).astype(np.float32))

    plain = FastFlow3DUNet(dtype=jnp.float32)
    variables = plain.init(jax.random.key(0), a, b, True)

    def run(mod):
        def loss(p):
            out, upd = mod.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                a, b, True, mutable=["batch_stats"])
            return jnp.sum(out ** 2), upd
        (v, upd), g = jax.value_and_grad(loss, has_aux=True)(
            variables["params"])
        return v, upd, g

    v0, upd0, g0 = run(plain)

    monkeypatch.setenv("DEFLOW_FUSED_CBG", "1")
    fused = FastFlow3DUNet(dtype=jnp.float32)
    vf_init = fused.init(jax.random.key(0), a, b, True)
    assert (jax.tree.structure(vf_init) == jax.tree.structure(variables))
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y)), variables, vf_init)

    v1, upd1, g1 = run(fused)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-4)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(y), np.asarray(x), rtol=1e-3, atol=1e-4), upd0, upd1)
    # atol covers (a) BN-preceded conv biases (analytically-zero
    # cancellation noise) and (b) reduction-reorder residue on O(1e2-1e3)
    # gradient sums — the violating elements are ~0.01% near-cancellation
    # entries at ~1e-2 absolute
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(y), np.asarray(x), rtol=2e-3, atol=2e-2), g0, g1)


@pytest.mark.slow
def test_single_block_chain():
    """nb=1 chain (the UNet's encoder_step_10) — head and tail coincide."""
    rng = np.random.default_rng(4)
    b, h, w = 1, 8, 8
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, 8)).astype(np.float32))
    params = _mk_params(jax.random.key(5), (8, 8))

    y_ref, _, _ = _plain_chain(x, params)
    y, _, _ = _run_fused(x, params)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)

    g0 = jax.grad(lambda x: jnp.sum(_plain_chain(x, params)[0] ** 2))(x)
    g1 = jax.grad(lambda x: jnp.sum(_run_fused(x, params)[0] ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-3, atol=1e-4)
