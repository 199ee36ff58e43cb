"""Masked-equivalence tests (SURVEY.md §7 hard parts): padding length and
slot permutation must not change any real point's result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deflow_tpu.models import DeFlow

VOXEL = (1.6, 1.6, 6.0)
GRID = (64, 64)


def _model_and_vars(n, seed=0):
    model = DeFlow(voxel_size=VOXEL, grid_feature_size=GRID,
                   num_iters=2)
    rng = np.random.default_rng(seed)
    pc = rng.uniform(-40, 40, (1, n, 3)).astype(np.float32)
    pc[..., 2] = rng.uniform(-2, 2, (1, n))
    pose = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
    variables = model.init(jax.random.key(0), jnp.asarray(pc), jnp.asarray(pc),
                           jnp.asarray(pose), jnp.asarray(pose),
                           jnp.ones((1, n), bool), jnp.ones((1, n), bool))
    return model, variables


def _run(model, variables, pc0, pc1, m0, m1):
    pose0 = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
    pose1 = pose0.copy(); pose1[:, 0, 3] = 0.7
    return model.apply(variables, jnp.asarray(pc0[None]), jnp.asarray(pc1[None]),
                       jnp.asarray(pose0), jnp.asarray(pose1),
                       jnp.asarray(m0[None]), jnp.asarray(m1[None]))


@pytest.mark.slow
def test_padding_length_invariance():
    """Same cloud padded to 1024 vs 2048 slots → identical per-point flow."""
    rng = np.random.default_rng(1)
    n_real = 700
    pts = rng.uniform(-40, 40, (n_real, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 2, n_real)
    pc1 = rng.uniform(-40, 40, (n_real, 3)).astype(np.float32)
    pc1[:, 2] = rng.uniform(-2, 2, n_real)

    model, variables = _model_and_vars(1024)

    def padded(a, n):
        out = np.zeros((n, 3), np.float32)
        out[:n_real] = a
        m = np.zeros(n, bool); m[:n_real] = True
        return out, m

    outs = []
    for n in (1024, 2048):
        p0, m0 = padded(pts, n)
        p1, m1 = padded(pc1, n)
        out = _run(model, variables, p0, p1, m0, m1)
        outs.append(np.asarray(out["flow"][0][:n_real]))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)


def test_padding_garbage_invariance():
    """Garbage (NaN/huge) values in padding slots must not leak into results."""
    rng = np.random.default_rng(2)
    n, n_real = 1024, 600
    pts = np.zeros((n, 3), np.float32)
    pts[:n_real] = rng.uniform(-40, 40, (n_real, 3))
    pts[:n_real, 2] = rng.uniform(-2, 2, n_real)
    m = np.zeros(n, bool); m[:n_real] = True

    model, variables = _model_and_vars(n)
    clean = _run(model, variables, pts, pts, m, m)

    dirty = pts.copy()
    dirty[n_real:] = np.nan
    dirty[n_real] = 1e30
    out = _run(model, variables, dirty, dirty, m, m)
    np.testing.assert_allclose(np.asarray(out["flow"][0][:n_real]),
                               np.asarray(clean["flow"][0][:n_real]), atol=1e-5)
    assert np.isfinite(np.asarray(out["flow"])).all()


def test_slot_permutation_equivariance():
    """Permuting point slots permutes outputs (no positional leakage)."""
    rng = np.random.default_rng(3)
    n = 512
    pts = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 2, n)
    m = np.ones(n, bool)
    model, variables = _model_and_vars(n)

    base = np.asarray(_run(model, variables, pts, pts, m, m)["flow"][0])
    perm = rng.permutation(n)
    permuted = np.asarray(
        _run(model, variables, pts[perm], pts[perm], m, m)["flow"][0])
    np.testing.assert_allclose(permuted, base[perm], atol=1e-5)
