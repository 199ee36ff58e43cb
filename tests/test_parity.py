"""Torch→JAX converter + forward parity tests (SURVEY.md §7.4).

Random weights + random BN running stats go into the torch twin; the converter
maps them into the flax model; both run the same cloud.  Per-point agreement
here is the offline stand-in for the published-checkpoint EPE gate.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deflow_tpu.convert import convert_state_dict, merge_into_variables
from deflow_tpu.models import DeFlow

from torch_twin import TorchDeFlow, randomize_

# Small grid for test speed: voxel 0.8 m → 128x128 pseudoimage.
VOXEL = (0.8, 0.8, 6.0)
RANGE = (-51.2, -51.2, -3.0, 51.2, 51.2, 3.0)
GRID = (128, 128)


def _random_cloud(rng, n):
    pts = rng.uniform(-50, 50, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 2.5, size=n)
    return pts


def _random_pose(rng):
    angle = rng.uniform(-0.05, 0.05)
    c, s = np.cos(angle), np.sin(angle)
    T = np.eye(4, dtype=np.float32)
    T[:2, :2] = [[c, -s], [s, c]]
    T[:3, 3] = rng.uniform(-1, 1, size=3)
    return T


def _build_pair(seed=0, n=4096, decoder="gru"):
    rng = np.random.default_rng(seed)
    tm = TorchDeFlow(decoder_option=decoder, voxel_size=VOXEL, point_cloud_range=RANGE)
    randomize_(tm, seed)

    jm = DeFlow(voxel_size=VOXEL, point_cloud_range=RANGE, grid_feature_size=GRID,
                decoder_option=decoder)
    pc0 = _random_cloud(rng, n)
    pc1 = _random_cloud(rng, n)
    pose0, pose1 = _random_pose(rng), _random_pose(rng)

    variables = jm.init(jax.random.key(0), jnp.asarray(pc0[None]), jnp.asarray(pc1[None]),
                        jnp.asarray(pose0[None]), jnp.asarray(pose1[None]),
                        jnp.ones((1, n), bool), jnp.ones((1, n), bool))
    params, stats = convert_state_dict(tm.state_dict(), strip_prefix="model.")
    variables = merge_into_variables(variables, {"params": params, "batch_stats": stats})
    return tm, jm, variables, pc0, pc1, pose0, pose1


@pytest.mark.parametrize("decoder", [
    pytest.param("gru", marks=pytest.mark.slow),
    pytest.param("linear", marks=pytest.mark.slow)])
def test_forward_parity(decoder):
    tm, jm, variables, pc0, pc1, pose0, pose1 = _build_pair(seed=1, decoder=decoder)

    t_out = tm(torch.from_numpy(pc0), torch.from_numpy(pc1),
               torch.from_numpy(pose0), torch.from_numpy(pose1))

    j_out = jm.apply(variables, jnp.asarray(pc0[None]), jnp.asarray(pc1[None]),
                     jnp.asarray(pose0[None]), jnp.asarray(pose1[None]),
                     jnp.ones((1, len(pc0)), bool), jnp.ones((1, len(pc1)), bool))

    valid = np.asarray(j_out["pc0_valid"][0])
    t_valid = t_out["valid0"].numpy()
    # identical in-range decisions (both bin in f32)
    np.testing.assert_array_equal(valid, t_valid)

    j_flow = np.asarray(j_out["flow"][0])[valid]          # dense → compacted
    t_flow = t_out["flow"].numpy()                        # already compacted
    assert j_flow.shape == t_flow.shape
    err = np.abs(j_flow - t_flow)
    assert err.max() < 2e-4, f"max |Δflow| = {err.max()}"

    j_pose_flow = np.asarray(j_out["pose_flow"][0])
    np.testing.assert_allclose(j_pose_flow, t_out["pose_flow"].numpy(), atol=2e-5)


def test_converter_rejects_shape_mismatch():
    tm, jm, variables, *_ = _build_pair(seed=2, n=512, decoder="linear")
    params, stats = convert_state_dict(tm.state_dict())
    params["backbone"]["decoder_step4"]["kernel"] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_into_variables(variables, {"params": params, "batch_stats": stats})


def test_converter_covers_all_model_params():
    """Every flax param leaf receives a checkpoint value (no silently-random
    weights surviving a 'successful' load)."""
    tm, jm, variables, *_ = _build_pair(seed=3, n=512, decoder="gru")
    params, stats = convert_state_dict(tm.state_dict())

    def leaves(tree, path=""):
        for k, v in tree.items():
            p = f"{path}/{k}"
            if isinstance(v, dict):
                yield from leaves(v, p)
            else:
                yield p

    model_leaves = set(leaves(jax.tree.map(np.asarray, variables["params"])))
    ckpt_leaves = set(leaves(params))
    missing = model_leaves - ckpt_leaves
    assert not missing, f"params not covered by converter: {sorted(missing)}"


@pytest.mark.parametrize("decoder", ["gru", "linear", "mmhead"])
def test_roundtrip_export_import(decoder):
    """jax → torch-ckpt → jax roundtrip is exact; and the torch twin loads the
    exported dict without unexpected keys.  Covers all three heads (the MMHead
    attention leaves pack back into torch in_proj/out_proj layout)."""
    tm, jm, variables, pc0, pc1, pose0, pose1 = _build_pair(seed=4, n=512,
                                                            decoder=decoder)
    from deflow_tpu.convert import export_state_dict

    exported = export_state_dict(
        {"params": jax.device_get(variables["params"]),
         "batch_stats": jax.device_get(variables["batch_stats"])})

    # reimport through the forward converter
    params, stats = convert_state_dict(exported)
    re_vars = merge_into_variables(variables, {"params": params,
                                               "batch_stats": stats})
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(re_vars["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # torch twin accepts it (strict: all keys match the reference layout)
    sd = {k[len("model."):]: torch.from_numpy(np.asarray(v))
          for k, v in exported.items()}
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, f"unexpected keys: {unexpected[:5]}"
    assert not missing, f"missing keys: {missing[:5]}"


def test_forward_parity_mmhead():
    """Transformer ablation head on a RAGGED cloud: ~30% of points are
    out-of-range (compacted away by the reference, masked here) and the
    valid count is NOT a multiple of the 512 chunk — so chunk membership,
    the partial tail chunk, and padding-key masking are all exercised
    (reference decoder.py:47-51 chunks the compacted valid set)."""
    rng = np.random.default_rng(9)
    n = 2048
    pc0 = rng.uniform(-49, 49, size=(n, 3)).astype(np.float32)
    pc0[:, 2] = rng.uniform(-2.5, 2.5, size=n)
    pc1 = rng.uniform(-49, 49, size=(n, 3)).astype(np.float32)
    pc1[:, 2] = rng.uniform(-2.5, 2.5, size=n)
    # scatter ~30% of pc0 far out of range, at positions interleaved with
    # the valid ones (so compaction genuinely permutes rows)
    out = rng.random(n) < 0.3
    pc0[out, 0] += 500.0
    pose = np.eye(4, dtype=np.float32)

    tm = TorchDeFlow(decoder_option="mmhead", voxel_size=VOXEL,
                     point_cloud_range=RANGE)
    randomize_(tm, 9)
    jm = DeFlow(voxel_size=VOXEL, point_cloud_range=RANGE,
                grid_feature_size=GRID, decoder_option="mmhead")
    variables = jm.init(jax.random.key(0), jnp.asarray(pc0[None]),
                        jnp.asarray(pc1[None]), jnp.asarray(pose[None]),
                        jnp.asarray(pose[None]), jnp.ones((1, n), bool),
                        jnp.ones((1, n), bool))
    params, stats = convert_state_dict(tm.state_dict())
    variables = merge_into_variables(variables,
                                     {"params": params, "batch_stats": stats})

    t_out = tm(torch.from_numpy(pc0), torch.from_numpy(pc1),
               torch.from_numpy(pose), torch.from_numpy(pose))
    j_out = jm.apply(variables, jnp.asarray(pc0[None]), jnp.asarray(pc1[None]),
                     jnp.asarray(pose[None]), jnp.asarray(pose[None]),
                     jnp.ones((1, n), bool), jnp.ones((1, n), bool))
    valid = np.asarray(j_out["pc0_valid"][0])
    np.testing.assert_array_equal(valid, t_out["valid0"].numpy())
    nv = int(valid.sum())
    assert 0 < nv < n and nv % 512 != 0, (
        f"fixture must be ragged and non-chunk-aligned (got {nv}/{n})")
    j_flow = np.asarray(j_out["flow"][0])[valid]          # dense → compacted
    t_flow = t_out["flow"].numpy()                        # already compacted
    assert j_flow.shape == t_flow.shape
    err = np.abs(j_flow - t_flow)
    assert err.max() < 1e-3, f"max |Δflow| = {err.max()}"


def test_mmhead_train_dropout_active():
    """train=True enables the torch-default 0.1 transformer dropout
    (reference decoder.py:18): two dropout streams disagree, eval is
    deterministic and dropout-free."""
    tm, jm, variables, pc0, pc1, pose0, pose1 = _build_pair(
        seed=5, n=1024, decoder="mmhead")
    args = (jnp.asarray(pc0[None]), jnp.asarray(pc1[None]),
            jnp.asarray(pose0[None]), jnp.asarray(pose1[None]),
            jnp.ones((1, len(pc0)), bool), jnp.ones((1, len(pc1)), bool))
    tr = lambda k: np.asarray(jm.apply(
        variables, *args, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(k)})[0]["flow"])
    a, b = tr(1), tr(2)
    assert np.abs(a - b).max() > 1e-6, "dropout inactive in train mode"
    e1 = np.asarray(jm.apply(variables, *args)["flow"])
    e2 = np.asarray(jm.apply(variables, *args)["flow"])
    np.testing.assert_array_equal(e1, e2)
