"""Frozen [T3] semantic tables + end-to-end golden vectors.

The loss/metric formulas are covered by analytic tests in
``test_losses_metrics.py``; what those cannot catch is a silent edit to the
DATA the formulas consume — the AV2 category vocabulary order (drives
``flow_category_indices`` everywhere: ff3dLoss weighting, 3-way foreground
split, every bucketed number) and the bucketed-metric metaclass membership.
This file pins those tables verbatim, with provenance, so any future change
is a deliberate data edit, plus freezes one randomized end-to-end metric
vector against stored expectations.

Provenance [T3 — av2 api not importable offline]:
- ``AV2_CATEGORIES``: av2-api ``av2/evaluation/scene_flow/constants.py``
  defines the scene-flow vocabulary as BACKGROUND/NONE at index 0 followed by
  the 29 annotation categories in alphabetical order.
- ``METACLASSES``: Khatri et al., "I Can't Believe It's Not Scene Flow!"
  (arXiv:2403.07432) Tab. 1 — BACKGROUND / CAR / OTHER_VEHICLES / PEDESTRIAN
  / WHEELED_VRU; signs, cones, animals excluded.
- 3-way split: foreground = category != NONE; dynamic = ||gt − ego|| > 0.05 m
  per 0.1 s sweep (av2-api eval.py).
- deflowLoss speed edges 0.4 / 1.0 m/s: DeFlow paper (arXiv:2401.16122 §III-D).
"""

import numpy as np

from deflow_tpu.metrics.bucketed import (
    AV2_CATEGORIES,
    METACLASSES,
    SPEED_BUCKET_EDGES,
)
from deflow_tpu.metrics.threeway import DYNAMIC_THRESHOLD_M


def test_av2_category_vocabulary_pinned():
    assert AV2_CATEGORIES[0] == "NONE"
    # 29 annotation categories, strictly alphabetical (the av2-api index
    # order) — a reorder silently corrupts every class-conditioned number
    rest = list(AV2_CATEGORIES[1:])
    assert rest == sorted(rest)
    assert len(AV2_CATEGORIES) == 30
    assert AV2_CATEGORIES.index("REGULAR_VEHICLE") == 19
    assert AV2_CATEGORIES.index("PEDESTRIAN") == 17
    assert AV2_CATEGORIES.index("BICYCLE") == 3


def test_metaclass_membership_pinned():
    got = {k: tuple(sorted(v)) for k, v in METACLASSES.items()}
    want = {
        "BACKGROUND": ("NONE",),
        "CAR": ("REGULAR_VEHICLE",),
        "OTHER_VEHICLES": tuple(sorted((
            "ARTICULATED_BUS", "BOX_TRUCK", "BUS", "LARGE_VEHICLE",
            "MESSAGE_BOARD_TRAILER", "RAILED_VEHICLE", "SCHOOL_BUS", "TRUCK",
            "TRUCK_CAB", "VEHICULAR_TRAILER"))),
        "PEDESTRIAN": tuple(sorted((
            "OFFICIAL_SIGNALER", "PEDESTRIAN", "STROLLER", "WHEELCHAIR"))),
        "WHEELED_VRU": tuple(sorted((
            "BICYCLE", "BICYCLIST", "MOTORCYCLE", "MOTORCYCLIST",
            "WHEELED_DEVICE", "WHEELED_RIDER"))),
    }
    assert got == want
    # every metaclass member must exist in the vocabulary
    for members in METACLASSES.values():
        for name in members:
            assert name in AV2_CATEGORIES, name


def test_threshold_constants_pinned():
    assert DYNAMIC_THRESHOLD_M == 0.05
    np.testing.assert_allclose(SPEED_BUCKET_EDGES[1] - SPEED_BUCKET_EDGES[0], 0.4)
    np.testing.assert_allclose(SPEED_BUCKET_EDGES[-1], 20.0)
    from deflow_tpu import losses

    assert losses._SWEEP_DT == 0.1


def test_end_to_end_golden_vector():
    """One deterministic frame through every loss + both metric accumulators;
    expectations frozen 2026-08-16 after the analytic tests validated the
    formulas.  A drift here without a deliberate semantics change is a bug."""
    import jax.numpy as jnp

    from deflow_tpu.losses import deflow_loss, ff3d_loss, zeroflow_loss
    from deflow_tpu.metrics import BucketedEPE, ThreewayEPE

    rng = np.random.default_rng(20260816)
    n = 400
    gt = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    gt[: n // 2] *= 0.02
    pred = gt + rng.normal(0, 0.1, (n, 3)).astype(np.float32)
    mask = rng.random(n) > 0.2
    classes = rng.integers(0, 30, n).astype(np.int32)
    ego = np.zeros((n, 3), np.float32)

    got = {
        "deflow": float(deflow_loss(jnp.asarray(pred[None]),
                                    jnp.asarray(gt[None]),
                                    jnp.asarray(mask[None]))),
        "ff3d": float(ff3d_loss(jnp.asarray(pred[None]), jnp.asarray(gt[None]),
                                jnp.asarray(mask[None]),
                                jnp.asarray(classes[None]))),
        "zeroflow": float(zeroflow_loss(jnp.asarray(pred[None]),
                                        jnp.asarray(gt[None]),
                                        jnp.asarray(mask[None]))),
    }
    three = ThreewayEPE()
    three.update(pred, gt, classes, ego, mask)
    got.update({k: v for k, v in three.compute().items()
                if k in ("EPE_FD", "EPE_FS", "EPE_BS", "EPE_3way_mean")})
    buck = BucketedEPE()
    buck.update(pred, gt, classes, ego, mask)
    bm = buck.compute()
    got["static_mean"] = float(np.mean(
        [v for k, v in bm.items() if k.startswith("Static_EPE/")]))

    want = {
        "deflow": 0.3936716318130493,
        "ff3d": 0.16219401359558105,
        "zeroflow": 0.09498105943202972,
        "EPE_FD": 0.1685936003923416,
        "EPE_FS": 0.16419297456741333,
        "EPE_BS": 0.2075703889131546,
        "EPE_3way_mean": 0.1801189879576365,
        "static_mean": 0.16808359426643535,
    }
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-5, err_msg=k)
