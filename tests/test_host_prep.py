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


@pytest.mark.parametrize("identity_pose", [
    pytest.param(True, marks=pytest.mark.slow), False])
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


def test_host_prep_keys_survive_device_batch():
    """EVERY host-prep key must pass through trainer.device_batch — a key
    missing from _BATCH_KEYS silently drops that feature from the jitted step
    (the sorted-record fast path was lost to exactly that in round 1/2)."""
    from deflow_tpu import trainer as T
    from deflow_tpu.data.host_prep import HOST_PREP_KEYS, host_prep_from_batch

    missing = set(HOST_PREP_KEYS) - set(T._BATCH_KEYS)
    assert not missing, f"_BATCH_KEYS drops host-prep keys: {sorted(missing)}"

    hb = _batch(seed=1, b=1, n=256)
    attach_host_prep(hb, list(VOXEL), [-51.2, -51.2, -3.0, 51.2, 51.2, 3.0])
    dev = T.device_batch(hb, None)
    hp = host_prep_from_batch(dev)
    assert hp is not None and "pc0_sorted_rec" in hp


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


@pytest.mark.slow
def test_sorted_pipeline_train_step_equivalence():
    """attach_host_prep(sort=True) permutes every per-point array on the host;
    the train step (loss + updated params) must match the unsorted pipeline —
    losses are permutation-invariant sums."""
    import copy

    from deflow_tpu.config import compose
    from deflow_tpu.models import build_model
    from deflow_tpu import trainer as T

    rng = np.random.default_rng(3)
    hb = _batch(seed=8, b=2, n=768, identity_pose=False)
    b, n = hb["pc0"].shape[:2]
    hb["flow"] = rng.normal(0, 0.1, hb["pc0"].shape).astype(np.float32)
    hb["flow_is_valid"] = hb["pc0_mask"].copy()
    hb["flow_category_indices"] = rng.integers(0, 20, (b, n)).astype(np.int32)
    hb_sorted = copy.deepcopy(hb)

    rng_range = [-51.2, -51.2, -3.0, 51.2, 51.2, 3.0]
    attach_host_prep(hb, list(VOXEL), rng_range)
    attach_host_prep(hb_sorted, list(VOXEL), rng_range, sort=True)
    # sorted mode ships no device-side permutation state
    assert "pc0_order" not in host_prep_from_batch(hb_sorted)
    assert "pc0_unsort" in hb_sorted
    # unsort really inverts: pc0_sorted[unsort] == original pc0
    np.testing.assert_array_equal(
        hb_sorted["pc0"][0][hb_sorted["pc0_unsort"][0]], hb["pc0"][0])

    cfg = compose("config", [
        "batch_size=2", "max_points=768", "voxel_size=[1.6,1.6,6]",
        "model.target.grid_feature_size=[64,64]", "model.target.num_iters=2",
        "precision=fp32", "lr=1e-3",
    ])
    model = build_model(cfg.model, precision="fp32")
    mesh = T.create_mesh(1)
    step = T.jit_train_step(T.make_train_step(model, "deflowLoss"), mesh)

    outs = []
    for batch in (hb, hb_sorted):
        state = T.init_state(model, cfg, batch, seed=0)
        state = jax.device_put(state, T.replicated(mesh))
        new_state, aux = step(state, T.device_batch(batch, mesh))
        outs.append((jax.device_get(aux),
                     jax.tree.map(np.asarray,
                                  jax.device_get(new_state.batch_stats))))
    a, s = outs
    assert np.isfinite(a[0]["loss"])
    # loss / epe / global grad norm: permutation-invariant up to summation
    # order (post-Adam params are NOT comparable: BN-sheltered biases have
    # ~zero gradient, so Adam turns last-ulp noise into full-lr updates)
    np.testing.assert_allclose(float(s[0]["loss"]), float(a[0]["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(s[0]["epe"]), float(a[0]["epe"]), rtol=1e-5)
    np.testing.assert_allclose(float(s[0]["grad_norm"]), float(a[0]["grad_norm"]),
                               rtol=1e-4)
    assert int(s[0]["valid_points"]) == int(a[0]["valid_points"])
    for x, y in zip(jax.tree.leaves(a[1]), jax.tree.leaves(s[1])):
        np.testing.assert_allclose(y, x, rtol=1e-4, atol=1e-6)


def test_parallel_host_prep_matches_serial():
    """num_workers>1 (threaded, GIL-free C++ per-sample work) must produce
    byte-identical batches to the serial path."""
    import copy

    hb_a = _batch(seed=12, b=4, n=512)
    hb_b = copy.deepcopy(hb_a)
    rng_range = [-51.2, -51.2, -3.0, 51.2, 51.2, 3.0]
    attach_host_prep(hb_a, list(VOXEL), rng_range, sort=True, num_workers=0)
    attach_host_prep(hb_b, list(VOXEL), rng_range, sort=True, num_workers=4)
    assert set(hb_a) == set(hb_b)
    for k in hb_a:
        np.testing.assert_array_equal(hb_a[k], hb_b[k], err_msg=k)


def test_sorted_record_semantics():
    """native.sorted_record (C++ and numpy fallback) returns the exact 9-lane
    PFN input: [xyz | p−centroid | p−center] in ascending-id order, invalid
    rows zero; centroids match a direct per-pillar mean."""
    from deflow_tpu.utils import native

    rng = np.random.default_rng(7)
    n = 777
    pts = np.stack([rng.uniform(-45, 45, n), rng.uniform(-45, 45, n),
                    rng.uniform(-2, 2, n)], axis=-1).astype(np.float32)
    mask = rng.random(n) > 0.1
    lo = np.array([-51.2, -51.2, -3.0], np.float32)
    vs = np.array([1.6, 1.6, 6.0], np.float32)
    grid = np.array([64, 64, 1], np.int32)
    pid, order, iperm, sid = native.pillar_prep(pts, mask, lo, vs, grid)
    rec = native.sorted_record(pts, order, sid, lo, vs, grid)
    assert rec.shape == (n, 9) and rec.dtype == np.float32

    valid = sid < 64 * 64
    pts_s = pts[order]
    np.testing.assert_allclose(rec[valid, :3], pts_s[valid], atol=0)
    assert (rec[~valid] == 0).all()
    # centroid check against a direct groupby mean
    for want_id in np.unique(sid[valid])[:20]:
        sel = sid == want_id
        cent = pts_s[sel].mean(axis=0)
        np.testing.assert_allclose(rec[sel, 3:6], pts_s[sel] - cent,
                                   rtol=1e-5, atol=1e-5)
    # center offset: bounded by half a voxel in xy
    assert np.abs(rec[valid, 6]).max() <= vs[0] / 2 + 1e-5
    assert np.abs(rec[valid, 7]).max() <= vs[1] / 2 + 1e-5

    # C++ and numpy fallback agree exactly-ish
    if native.get_lib() is not None:
        import deflow_tpu.utils.native as N
        lib_save = N._LIB
        try:
            N._LIB = None
            N._TRIED = True
            rec_np = native.sorted_record(pts, order, sid, lo, vs, grid)
        finally:
            N._LIB = lib_save
        np.testing.assert_allclose(rec, rec_np, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
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
