"""Fused Pallas GRU vs the unrolled XLA loop (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deflow_tpu.ops import pallas_gru as pg


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    yield


def _ref_loop(h, x, w_zr, b_zr, w_q, b_q, iters):
    hd = h.shape[-1]
    for _ in range(iters):
        hx = jnp.concatenate([h, x], axis=-1)
        zr = jax.nn.sigmoid(hx @ w_zr + b_zr)
        z, r = zr[:, :hd], zr[:, hd:]
        q = jnp.tanh(jnp.concatenate([r * h, x], axis=-1) @ w_q + b_q)
        h = (1 - z) * h + z * q
    return h


def _rand(seed, m=700, xdim=64):
    rng = np.random.default_rng(seed)
    h = rng.normal(0, 0.5, (m, 128)).astype(np.float32)
    x = rng.normal(0, 0.5, (m, xdim)).astype(np.float32)
    w_zr = rng.normal(0, 0.1, (128 + xdim, 256)).astype(np.float32)
    b_zr = rng.normal(0, 0.1, 256).astype(np.float32)
    w_q = rng.normal(0, 0.1, (128 + xdim, 128)).astype(np.float32)
    b_q = rng.normal(0, 0.1, 128).astype(np.float32)
    return tuple(map(jnp.asarray, (h, x, w_zr, b_zr, w_q, b_q)))


@pytest.mark.parametrize("iters", [1, 4])
def test_forward_matches_loop(iters):
    args = _rand(0)
    got = pg.fused_gru(*args, iters)
    want = _ref_loop(*args, iters)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_loop():
    args = _rand(1, m=300)
    iters = 3

    def loss_fused(*a):
        return jnp.sum(pg.fused_gru(*a, iters) ** 2)

    def loss_ref(*a):
        return jnp.sum(_ref_loop(*a, iters) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b, name in zip(g_fused, g_ref,
                          ("dh0", "dx", "dw_zr", "db_zr", "dw_q", "db_q")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
