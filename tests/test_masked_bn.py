"""MaskedBatchNorm vs torch BatchNorm1d on compacted points (train mode):
batch stats, outputs, and running-stat updates must match (the reference
normalizes compacted point buffers; we normalize padded ones)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from deflow_tpu.models.embedder import MaskedBatchNorm


def test_train_mode_matches_torch_compacted():
    rng = np.random.default_rng(0)
    n, c = 1024, 32
    x = rng.normal(2.0, 3.0, (n, c)).astype(np.float32)
    mask = rng.random(n) > 0.3

    tbn = torch.nn.BatchNorm1d(c, eps=1e-3, momentum=0.01)
    with torch.no_grad():
        tbn.weight.uniform_(0.5, 1.5)
        tbn.bias.uniform_(-0.5, 0.5)
        tbn.running_mean.uniform_(-1, 1)
        tbn.running_var.uniform_(0.5, 2)
    tbn.train()
    t_out = tbn(torch.from_numpy(x[mask])).detach().numpy()

    mbn = MaskedBatchNorm(momentum=0.01, epsilon=1e-3)
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": {
            "mean": jnp.asarray(np.zeros(c, np.float32)),
            "var": jnp.asarray(np.ones(c, np.float32))},
    }
    # align initial running stats with torch's pre-update values
    pre_mean = tbn.running_mean.detach().numpy().copy()
    pre_var = tbn.running_var.detach().numpy().copy()
    # torch already updated its running stats during forward; recompute start
    bm = x[mask].mean(0)
    bv = x[mask].var(0, ddof=1)
    start_mean = (pre_mean - 0.01 * bm) / 0.99
    start_var = (pre_var - 0.01 * bv) / 0.99
    variables["batch_stats"]["mean"] = jnp.asarray(start_mean.astype(np.float32))
    variables["batch_stats"]["var"] = jnp.asarray(start_var.astype(np.float32))

    j_out, mutated = mbn.apply(
        variables, jnp.asarray(x), jnp.asarray(mask), True,
        mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(j_out)[mask], t_out,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               pre_mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               pre_var, rtol=1e-4, atol=1e-5)
    # padding rows must not influence stats: rerun with garbage in padding
    x2 = x.copy(); x2[~mask] = 1e6
    j_out2, _ = mbn.apply(variables, jnp.asarray(x2), jnp.asarray(mask), True,
                          mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(j_out2)[mask],
                               np.asarray(j_out)[mask], atol=1e-5)
