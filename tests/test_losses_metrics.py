"""Golden-value tests for losses (masked vs compacted equivalence) and the
3-way / bucketed metric accumulators (SURVEY.md §4 test pyramid)."""

import os

import numpy as np
import jax.numpy as jnp

from deflow_tpu.losses import deflow_loss, ff3d_loss, zeroflow_loss, get_loss
from deflow_tpu.metrics import ThreewayEPE, BucketedEPE


def _rand(seed, b=2, n=256):
    rng = np.random.default_rng(seed)
    pred = rng.normal(0, 0.5, (b, n, 3)).astype(np.float32)
    gt = rng.normal(0, 0.5, (b, n, 3)).astype(np.float32)
    # Mix of static / mid / fast movers (gt norm ~ speed*0.1)
    gt[:, : n // 2] *= 0.01
    mask = rng.random((b, n)) > 0.3
    classes = rng.integers(0, 5, (b, n)).astype(np.int32)
    return pred, gt, mask, classes


def _compacted_deflow_loss(pred, gt, mask):
    """Reference semantics on compacted points (DeFlow paper §III-D)."""
    p, g = pred[mask], gt[mask]
    err = np.linalg.norm(p - g, axis=-1)
    speed = np.linalg.norm(g, axis=-1) / 0.1
    total = 0.0
    for sel in (speed < 0.4, (speed >= 0.4) & (speed <= 1.0), speed > 1.0):
        if sel.any():
            total += err[sel].mean()
    return total


def test_deflow_loss_matches_compacted():
    pred, gt, mask, _ = _rand(0)
    got = float(deflow_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    want = _compacted_deflow_loss(pred, gt, mask)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_deflow_loss_empty_bucket_contributes_zero():
    pred = np.zeros((1, 8, 3), np.float32)
    gt = np.zeros((1, 8, 3), np.float32)  # all static: mid/fast buckets empty
    gt[..., 0] = 0.001
    pred[..., 0] = 0.101
    mask = np.ones((1, 8), bool)
    got = float(deflow_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    np.testing.assert_allclose(got, 0.1, rtol=1e-5)


def test_ff3d_loss_class_weighting():
    pred, gt, mask, classes = _rand(1)
    got = float(ff3d_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask),
                          jnp.asarray(classes)))
    p, g, c = pred[mask], gt[mask], classes[mask]
    err = np.linalg.norm(p - g, axis=-1)
    w = 0.1 + 0.9 * (c > 0)
    np.testing.assert_allclose(got, (err * w).mean(), rtol=1e-5)


def test_zeroflow_loss_speed_scaling():
    pred, gt, mask, _ = _rand(2)
    got = float(zeroflow_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    p, g = pred[mask], gt[mask]
    err = np.linalg.norm(p - g, axis=-1)
    scale = np.clip(np.linalg.norm(g, axis=-1) / 0.1, 0.1, 1.0)
    np.testing.assert_allclose(got, (err * scale).mean(), rtol=1e-5)


def test_registry():
    assert get_loss("deflowLoss") is deflow_loss
    assert get_loss("ff3dLoss") is ff3d_loss
    assert get_loss("zeroflowLoss") is zeroflow_loss
    import pytest
    with pytest.raises(KeyError):
        get_loss("nope")


# ---------------------------------------------------------------- metrics
def test_threeway_buckets_and_means():
    acc = ThreewayEPE()
    n = 300
    rng = np.random.default_rng(3)
    gt = np.zeros((n, 3), np.float32)
    gt[:100, 0] = 1.0            # dynamic (moves 1 m / sweep)
    classes = np.zeros(n, np.int32)
    classes[:200] = 19           # REGULAR_VEHICLE → foreground
    pose_flow = np.zeros((n, 3), np.float32)
    pred = gt.copy()
    pred[:100, 0] += 0.2         # FD err 0.2
    pred[100:200, 1] += 0.1      # FS err 0.1
    pred[200:, 2] += 0.05        # BS err 0.05
    acc.update(pred, gt, classes, pose_flow)
    m = acc.compute()
    np.testing.assert_allclose(m["EPE_FD"], 0.2, atol=1e-6)
    np.testing.assert_allclose(m["EPE_FS"], 0.1, atol=1e-6)
    np.testing.assert_allclose(m["EPE_BS"], 0.05, atol=1e-6)
    np.testing.assert_allclose(m["EPE_3way_mean"], (0.2 + 0.1 + 0.05) / 3, atol=1e-6)
    # AccS: FD rel err = 0.2, abs 0.2 → 0; BS abs 0.05 → not < 0.05 → 0
    assert m["AccS_FD"] == 0.0
    # AccR: FD 0.2 not < 0.1 → 0 ; FS 0.1 not <0.1 and rel huge → 0
    assert m["AccR_FD"] == 0.0
    assert acc.table()  # renders


def test_threeway_multi_frame_mean_over_frames():
    acc = ThreewayEPE()
    gt = np.zeros((10, 3), np.float32); gt[:, 0] = 1.0
    classes = np.full(10, 19, np.int32)
    ego = np.zeros((10, 3), np.float32)
    for err in (0.1, 0.3):
        pred = gt.copy(); pred[:, 1] = err
        acc.update(pred, gt, classes, ego)
    m = acc.compute()
    np.testing.assert_allclose(m["EPE_FD"], 0.2, atol=1e-6)  # frame mean, not point mean


def test_bucketed_normalized_epe():
    acc = BucketedEPE()
    n = 100
    gt = np.zeros((n, 3), np.float32)
    gt[:, 0] = 0.5               # speed 5 m/s → dynamic bucket
    classes = np.full(n, 19, np.int32)   # CAR
    ego = np.zeros((n, 3), np.float32)
    pred = gt.copy(); pred[:, 1] = 0.25  # EPE 0.25
    acc.update(pred, gt, classes, ego)
    m = acc.compute()
    # normalized = 0.25 / (5 m/s * 0.1 s) = 0.5
    np.testing.assert_allclose(m["Dynamic_NormEPE/CAR"], 0.5, atol=1e-6)
    assert "Static_EPE/CAR" not in m
    assert acc.table()


def test_bucketed_static_and_exclusions():
    acc = BucketedEPE()
    gt = np.zeros((10, 3), np.float32)
    ego = np.zeros((10, 3), np.float32)
    pred = gt.copy(); pred[:, 0] = 0.02
    acc.update(pred, gt, np.zeros(10, np.int32), ego)        # background static
    acc.update(pred, gt, np.full(10, 5, np.int32), ego)      # BOLLARD → excluded
    m = acc.compute()
    np.testing.assert_allclose(m["Static_EPE/BACKGROUND"], 0.02, atol=1e-6)
    assert int(acc.count.sum()) == 10  # bollard points dropped


def test_seflow_ssl_loss_runs_and_prefers_truth(tmp_path):
    """SSL loss must be lower for the true flow than for a wrong flow."""
    import jax
    from deflow_tpu.losses import seflow_loss
    rng = np.random.default_rng(7)
    n = 256
    pc0 = rng.uniform(-10, 10, (1, n, 3)).astype(np.float32)
    true_flow = np.zeros((1, n, 3), np.float32)
    true_flow[0, :64, 0] = 1.0  # a moving chunk
    pc1 = pc0 + true_flow
    mask = np.ones((1, n), bool)
    dufo = np.zeros((1, n), np.int32)
    dufo[0, :64] = 1
    batch = {"pc0": jnp.asarray(pc0), "pc1": jnp.asarray(pc1),
             "pc0_mask": jnp.asarray(mask), "pc1_mask": jnp.asarray(mask),
             "dufo_label0": jnp.asarray(dufo), "dufo_label1": jnp.asarray(dufo)}
    def out_for(flow):
        return {"flow": jnp.asarray(flow),
                "pose_flow": jnp.zeros_like(jnp.asarray(flow)),
                "pc0_valid": jnp.asarray(mask), "pc1_valid": jnp.asarray(mask)}
    good = float(seflow_loss(out_for(true_flow), batch))
    bad = float(seflow_loss(out_for(true_flow + 0.5), batch))
    zero = float(seflow_loss(out_for(np.zeros_like(true_flow)), batch))
    assert good < bad and good < zero
    # differentiable
    g = jax.grad(lambda f: seflow_loss(out_for(true_flow * 0 + f), batch))(0.3)
    assert np.isfinite(g)


def test_metrics_crosscheck_runner():
    """tools/metrics_crosscheck.py: report-only (rc=2) offline, and the
    official comparisons run the moment the packages are importable."""
    import importlib.util
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "metrics_crosscheck.py")],
        capture_output=True, text=True)
    has_official = (importlib.util.find_spec("av2") is not None
                    or importlib.util.find_spec("bucketed_scene_flow_eval")
                    is not None)
    assert proc.returncode == (0 if has_official else 2), proc.stdout
    assert "ours: EPE_FD=" in proc.stdout
