#!/usr/bin/env python
"""Repeatable TPU-side exactness check: Pallas cell-sweep chamfer vs brute
and vs the capacity-limited XLA grid fallback (VERDICT r3 #6).

Production SeFlow SSL runs the Pallas sweep kernel (ops/pallas_sweep.py);
CPU CI can only exercise the XLA grid fallback, which silently drops
candidates above ``capacity`` per cell (~30% on skewed AV2-like density at
cap=128).  This script pins the kernel's correctness contract ON TPU with
adversarially skewed clouds (the regime that overflows cells):

1. **exact below ring·cell** — wherever the true (brute) NN distance is
   below the sweep's coverage radius, the kernel must select the same
   neighbor (distances equal to within the cross-backend f32 association
   noise floor, measured ≤ 7.4e-4 m²); beyond coverage both must report
   ≥ radius² (run at 16k points where brute is feasible);
2. **never above the XLA grid** — the fallback only ever OVERESTIMATES
   (capacity drops candidates), so at full production scale (98304-slot
   clouds) sweep ≤ grid everywhere, and the fraction of rows where the
   kernel found a strictly closer neighbor quantifies what the fallback
   dropped;
3. **fused dual-mask == two separate calls** — the SSL loss's single-sweep
   (all, dynamic) distances must match two independent grid calls.

Writes ``SWEEPCHECK.json`` at the repo root (ok=true/false + stats) so every
round records a fresh kernel-vs-exact artifact alongside BENCH.

Run: plain ``python tools/sweep_check.py`` on the TPU chip (~2 min hot).
Reference semantics being pinned: chamfer3D CUDA (reference README.md:39).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def skewed_cloud(rng, n, valid):
    """Near-field-heavy radial density + two dense clusters (worst case for
    per-cell capacity: thousands of points in single 2 m cells)."""
    r = np.clip(rng.gamma(2.0, 8.0, n), 1.5, 51.0)
    th = rng.uniform(0, 2 * np.pi, n)
    pts = np.stack([r * np.cos(th), r * np.sin(th),
                    rng.uniform(-2.8, 2.8, n)], -1).astype(np.float32)
    k = n // 16
    for c in ((8.0, 3.0), (-5.0, -12.0)):  # parked-truck-like blobs
        sel = rng.integers(0, n, k)
        pts[sel, :2] = np.asarray(c) + rng.normal(0, 0.6, (k, 2))
    mask = np.arange(n) < valid
    pts[~mask] = 0
    return pts, mask


def main():
    import jax
    import jax.numpy as jnp

    from deflow_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from deflow_tpu.ops.chamfer import (NNSpec, _resolve_spec,
                                        chamfer_distance,
                                        ssl_chamfer_distances)

    on_tpu = jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(17)
    report = {"platform": jax.devices()[0].platform, "checks": {}, "ok": True}

    def record(name, ok, **stats):
        report["checks"][name] = {"ok": bool(ok), **stats}
        report["ok"] = report["ok"] and bool(ok)
        line = "  ".join(f"{k}={v}" for k, v in stats.items())
        print(f"[{'PASS' if ok else 'FAIL'}] {name}  {line}", flush=True)

    # ---- 1. exact-below-coverage vs brute (16k: brute is feasible) -------
    n_small = 16384
    p, pm = skewed_cloud(rng, n_small, int(n_small * 0.875))
    q, qm = skewed_cloud(rng, n_small, int(n_small * 0.8125))
    spec = _resolve_spec("grid", n_small, n_small, 2.0, None)
    radius2 = (spec.ring * spec.cell) ** 2
    jp, jq, jpm, jqm = map(jnp.asarray, (p, q, pm, qm))

    t0 = time.perf_counter()
    ds0, ds1 = jax.jit(lambda: chamfer_distance(jp, jq, jpm, jqm, spec=spec))()
    db0, db1 = jax.jit(lambda: chamfer_distance(
        jp, jq, jpm, jqm, spec=NNSpec(method="brute")))()
    ds0, ds1, db0, db1 = (np.asarray(x) for x in (ds0, ds1, db0, db1))
    # the two backends evaluate (p−q)² with different f32 association
    # (measured noise floor ≤ 7.4e-4 on 100 m² squared distances); anything
    # beyond TOL is a genuine candidate-set difference (a capacity drop)
    tol = lambda d: 2e-3 * (1.0 + d)
    for name, dsw, dbr, m in (("dir0", ds0, db0, pm), ("dir1", ds1, db1, qm)):
        near = m & (dbr < radius2)
        far_ok = bool(np.all(dsw[m & ~near] >= radius2 - tol(radius2)))
        diff = dsw[near] - dbr[near]
        if on_tpu:
            # the Pallas sweep has no per-cell capacity: same neighbor
            # selected everywhere below the ring·cell coverage radius
            ok = bool(np.all(np.abs(diff) <= tol(dbr[near]))) and far_ok
        else:
            # CPU runs the capacity-limited XLA fallback, which DOES drop
            # candidates on these adversarial clusters — it must only ever
            # overestimate (this inexact regime is why the kernel exists)
            ok = bool(np.all(diff >= -tol(dbr[near]))) and far_ok
        record(f"exact_below_coverage_{name}", ok,
               n=n_small, near_rows=int(near.sum()),
               exactness_asserted=on_tpu,
               rows_beyond_tol=int((np.abs(diff) > tol(dbr[near])).sum()),
               max_abs_diff=float(np.abs(diff).max() if near.any() else 0.0),
               far_rows_ok=far_ok, radius2=radius2)
    report["checks"]["exact_below_coverage_dir0"]["seconds"] = round(
        time.perf_counter() - t0, 1)

    # ---- 2. never above the XLA grid at production scale -----------------
    # (the fallback's capacity drops only ever OVERESTIMATE distances)
    if on_tpu:
        n_big, valid = 98304, 86016
        P, PM = skewed_cloud(rng, n_big, valid)
        Q, QM = skewed_cloud(rng, n_big, valid)
        bspec = _resolve_spec("grid", n_big, n_big, 2.0, None)
        jP, jQ, jPM, jQM = map(jnp.asarray, (P, Q, PM, QM))

        dk0, dk1 = jax.jit(lambda: chamfer_distance(
            jP, jQ, jPM, jQM, spec=bspec))()
        dk0, dk1 = np.asarray(dk0), np.asarray(dk1)
        os.environ["DEFLOW_PALLAS"] = "0"   # trace-time gate → XLA fallback
        try:
            dg0, dg1 = jax.jit(lambda: chamfer_distance(
                jP, jQ, jPM, jQM, spec=bspec))()
            dg0, dg1 = np.asarray(dg0), np.asarray(dg1)
        finally:
            os.environ.pop("DEFLOW_PALLAS")
        for name, dk, dg, m in (("dir0", dk0, dg0, PM), ("dir1", dk1, dg1, QM)):
            # f32 sums associate differently in the two backends; anything
            # beyond 1 ulp-ish slack must be a genuine candidate difference
            above = m & (dk > dg + 2e-3 * (1.0 + dg))
            closer = m & (dk < dg - 2e-3 * (1.0 + dg))
            record(f"kernel_le_grid_{name}", not above.any(),
                   n=n_big, rows_above_grid=int(above.sum()),
                   kernel_strictly_closer_rows=int(closer.sum()),
                   closer_frac=round(float(closer.sum()) / max(m.sum(), 1), 4))
    else:
        print("(skipping full-scale kernel-vs-grid: not on TPU)")

    # ---- 3. fused dual-mask sweep == two separate grid calls -------------
    f_p = rng.random(n_small) < 0.3
    f_q = rng.random(n_small) < 0.3
    jfp, jfq = jnp.asarray(f_p & pm), jnp.asarray(f_q & qm)
    da0, da1, df0, df1 = (np.asarray(x) for x in jax.jit(
        lambda: ssl_chamfer_distances(jp, jq, jpm, jqm, jfp, jfq,
                                      truncate=2.0, spec=spec))())
    dd0, dd1 = (np.asarray(x) for x in jax.jit(
        lambda: chamfer_distance(jp, jq, jfp, jfq, spec=spec))())
    all_ok = np.array_equal(da0, ds0) and np.array_equal(da1, ds1)
    if on_tpu:
        # same kernel, same arithmetic: below the coverage radius the fused
        # dual-mask track and the separate dyn-only call see the identical
        # flagged candidate set, so TRUNCATED distances must be BIT-equal.
        # Beyond the radius the two sorted layouts admit different window-
        # overreach candidates (both ≥ radius² — the truncated loss cannot
        # observe them), so raw values legitimately differ there.
        clip = lambda d: np.minimum(d, radius2)
        dyn_ok = (np.array_equal(clip(df0[f_p & pm]), clip(dd0[f_p & pm]))
                  and np.array_equal(clip(df1[f_q & qm]),
                                     clip(dd1[f_q & qm])))
    else:
        # fallback capacity interplay: in the fused call dynamic candidates
        # share per-cell slots with static ones, so the fused dyn distances
        # may only OVERestimate the dyn-only-binned separate call
        dyn_ok = (bool(np.all(df0[f_p & pm] >= dd0[f_p & pm] - 1e-5))
                  and bool(np.all(df1[f_q & qm] >= dd1[f_q & qm] - 1e-5)))
    record("fused_dual_mask_equals_separate", all_ok and dyn_ok,
           n=n_small, dyn_rows=int((f_p & pm).sum()),
           all_terms_equal=all_ok, exactness_asserted=on_tpu)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SWEEPCHECK.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out}  ok={report['ok']}")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
