"""Host-prep path (C++ bin/sort bookkeeping) vs the pure-device path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deflow_tpu.data.host_prep import attach_host_prep, host_prep_from_batch
from deflow_tpu.models import DeFlow

VOXEL = (1.6, 1.6, 6.0)
GRID = (64, 64)


def _batch(seed=0, b=2, n=1024, identity_pose=True):
    rng = np.random.default_rng(seed)
    pc = lambda: np.stack([
        rng.uniform(-45, 45, (b, n)), rng.uniform(-45, 45, (b, n)),
        rng.uniform(-2, 2, (b, n))], axis=-1).astype(np.float32)
    pose0 = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    pose1 = pose0.copy()
    if not identity_pose:
        pose1[:, 0, 3] = 1.25
    mask = np.ones((b, n), bool)
    mask[:, -50:] = False
    return {"pc0": pc(), "pc1": pc(), "pose0": pose0, "pose1": pose1,
            "pc0_mask": mask, "pc1_mask": mask.copy()}


@pytest.mark.parametrize("identity_pose", [True, False])
def test_model_host_prep_matches_device_path(identity_pose):
    hb = _batch(identity_pose=identity_pose)
    model = DeFlow(voxel_size=VOXEL, grid_feature_size=GRID, num_iters=2)
    args = (jnp.asarray(hb["pc0"]), jnp.asarray(hb["pc1"]),
            jnp.asarray(hb["pose0"]), jnp.asarray(hb["pose1"]),
            jnp.asarray(hb["pc0_mask"]), jnp.asarray(hb["pc1_mask"]))
    variables = model.init(jax.random.key(0), *args)

    out_dev = model.apply(variables, *args)

    attach_host_prep(hb, list(VOXEL), [-51.2, -51.2, -3.0, 51.2, 51.2, 3.0])
    hp = {k: jnp.asarray(v) for k, v in host_prep_from_batch(hb).items()}
    out_host = model.apply(variables, *args, host_prep=hp)

    dev_valid = np.asarray(out_dev["pc0_valid"])
    host_valid = np.asarray(out_host["pc0_valid"])
    if identity_pose:
        # identical transforms -> identical binning -> identical everything
        np.testing.assert_array_equal(host_valid, dev_valid)
        np.testing.assert_allclose(np.asarray(out_host["flow"]),
                                   np.asarray(out_dev["flow"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_host["pose_flow"]),
                                   np.asarray(out_dev["pose_flow"]), atol=1e-6)
    else:
        # host transform uses double intermediates; a few boundary points may
        # bin differently — validity must agree except at boundaries, and
        # flows at co-valid points must agree closely
        assert (host_valid == dev_valid).mean() > 0.999
        both = dev_valid & host_valid
        d = np.abs(np.asarray(out_host["flow"]) - np.asarray(out_dev["flow"]))
        assert np.quantile(d[both], 0.999) < 1e-3


def test_host_prep_keys_and_shapes():
    hb = _batch()
    attach_host_prep(hb, list(VOXEL), [-51.2, -51.2, -3.0, 51.2, 51.2, 3.0])
    b, n = hb["pc0"].shape[:2]
    for k in ("pc0_ids", "pc0_order", "pc0_iperm", "pc0_sorted",
              "pc1_ids", "pc1_order", "pc1_iperm", "pc1_sorted"):
        assert hb[k].shape == (b, n) and hb[k].dtype == np.int32
    assert hb["pc0_transformed"].shape == (b, n, 3)
    # padding slots are trash
    trash = 64 * 64
    assert (hb["pc0_ids"][:, -50:] == trash).all()
    # per-sample sorted ids ascend
    assert all((np.diff(hb["pc0_sorted"][i]) >= 0).all() for i in range(b))


def test_host_prep_pallas_plan_equivalence(monkeypatch):
    """Forced-pallas (interpret): host plan must give the same image as the
    device-argsort plan."""
    import deflow_tpu.ops.voxel as V
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(V, "_use_pallas", lambda: True)

    from deflow_tpu.models.embedder import DynamicEmbedder
    from deflow_tpu.ops.voxel import VoxelConfig

    hb = _batch(seed=3, b=1, n=512)
    cfg = VoxelConfig(VOXEL, (-51.2, -51.2, -3.0, 51.2, 51.2, 3.0))
    emb = DynamicEmbedder(voxel_cfg=cfg)
    pts = jnp.asarray(hb["pc0"])
    mask = jnp.asarray(hb["pc0_mask"])
    variables = emb.init(jax.random.key(0), pts, mask)

    img_dev, info_dev, _ = emb.apply(variables, pts, mask)

    attach_host_prep(hb, list(VOXEL), [-51.2, -51.2, -3.0, 51.2, 51.2, 3.0])
    host = {"ids": jnp.asarray(hb["pc0_ids"]),
            "order": jnp.asarray(hb["pc0_order"]),
            "sorted_id": jnp.asarray(hb["pc0_sorted"])}
    # identity pose: transformed == pc0, ids match device binning
    img_host, info_host, plan = emb.apply(variables, pts, mask, host=host)
    assert plan is not None
    np.testing.assert_array_equal(np.asarray(info_host.pillar_id),
                                  np.asarray(info_dev.pillar_id))
    np.testing.assert_allclose(np.asarray(img_host), np.asarray(img_dev),
                               rtol=1e-4, atol=1e-5)


def test_sorted_record_path_matches_unsorted(monkeypatch):
    """Fully-sorted embedder compute (host record, forced pallas interpret)
    must reproduce the unsorted host path's pseudoimage and model flow."""
    import deflow_tpu.ops.voxel as V
    import deflow_tpu.models.embedder as E
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    hb = _batch(seed=5, b=2, n=512, identity_pose=True)
    attach_host_prep(hb, list(VOXEL), [-51.2, -51.2, -3.0, 51.2, 51.2, 3.0])
    model = DeFlow(voxel_size=VOXEL, grid_feature_size=GRID, num_iters=2)
    args = (jnp.asarray(hb["pc0"]), jnp.asarray(hb["pc1"]),
            jnp.asarray(hb["pose0"]), jnp.asarray(hb["pose1"]),
            jnp.asarray(hb["pc0_mask"]), jnp.asarray(hb["pc1_mask"]))
    variables = model.init(jax.random.key(0), *args)

    hp_full = {k: jnp.asarray(v) for k, v in host_prep_from_batch(hb).items()}
    hp_nosort = {k: v for k, v in hp_full.items() if "sorted_rec" not in k}

    out_plain = model.apply(variables, *args, host_prep=hp_nosort)

    monkeypatch.setattr(V, "_use_pallas", lambda: True)
    monkeypatch.setattr(E, "_use_pallas", lambda: True)
    # spy: the sorted path must actually engage (a silent fallback would make
    # this test vacuous — it happened once)
    calls = []
    orig_sorted = E.DynamicEmbedder._sorted_image
    monkeypatch.setattr(
        E.DynamicEmbedder, "_sorted_image",
        lambda self, *a, **k: (calls.append(1), orig_sorted(self, *a, **k))[1])
    out_sorted = model.apply(variables, *args, host_prep=hp_full)
    assert len(calls) == 2, "sorted-record path did not engage"

    np.testing.assert_array_equal(np.asarray(out_sorted["pc0_valid"]),
                                  np.asarray(out_plain["pc0_valid"]))
    np.testing.assert_allclose(np.asarray(out_sorted["flow"]),
                               np.asarray(out_plain["flow"]),
                               rtol=1e-4, atol=1e-5)

    # gradients flow through the sorted path (PFN params get non-zero grads)
    def loss(params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          *args, host_prep=hp_full)
        return jnp.sum(out["flow"] ** 2)
    g = jax.grad(loss)(variables["params"])
    gl = np.abs(np.asarray(
        g["embedder"]["feature_net"]["linear"]["kernel"])).sum()
    assert np.isfinite(gl) and gl > 0
