#!/usr/bin/env python
"""Host data-path budget: per-stage cost table + workers→pairs/s model
(HOSTPREP.json; VERDICT r4 #5).

The reference feeds 8 GPUs from a num_workers=16 torch loader fleet
(reference assets/slurm/1_train.sh:29); our equivalent is the C++/OpenMP
``csrc/pointops.cpp`` host pipeline driven by loader threads
(``num_workers``; ctypes releases the GIL).  This sandbox has ONE vCPU, so
thread scaling is unmeasurable here — this tool publishes the single-thread
per-STAGE costs and the analytic workers→pairs/s model a real TPU-VM host
(v5e-8 VMs ship 112 vCPUs) follows: the stages are per-sample independent
C++/numpy work, so throughput is ``min(device_rate, workers / prep_s)``.

Run: ``python tools/bench_hostprep.py [--bs 16] [--n 98304] [--step-ms 113]``
(pure host work — safe to run alongside a TPU process).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--n", type=int, default=98304)
    ap.add_argument("--valid", type=int, default=86016)
    ap.add_argument("--step-ms", type=float, default=113.0,
                    help="device train-step time the loader must beat")
    ap.add_argument("--ssl", action="store_true",
                    help="include the SSL chamfer cell prep stage")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import make_batch  # reuses the bench cloud generator
    from deflow_tpu.data import host_prep as HP
    from deflow_tpu.utils import native

    lib = "cxx" if native.get_lib() is not None else "numpy"
    print(f"C++ pointops: {'LOADED' if lib == 'cxx' else 'numpy fallback'}")

    hb = make_batch(args.bs, args.n, args.valid, dist="skewed")
    raw = {k: v for k, v in hb.items()
           if not (k.startswith("pc1_cell")
                   or k.endswith(("_ids", "_order", "_iperm", "_sorted",
                                  "_sorted_rec", "_unsort", "_transformed")))}
    if not args.ssl:
        raw.pop("dufo_label0", None)
        raw.pop("dufo_label1", None)

    vs = [0.2, 0.2, 6.0]
    rng = [-51.2, -51.2, -3.0, 51.2, 51.2, 3.0]

    # ---- per-stage costs, single sample (median over samples x reps)
    lo = np.asarray(rng[:3], np.float32)
    vsz = np.asarray(vs, np.float32)
    grid = np.round((np.asarray(rng[3:]) - lo) / vsz).astype(np.int32)
    i = 0
    ego = np.linalg.inv(np.asarray(raw["pose1"][i], np.float64)) @ np.asarray(
        raw["pose0"][i], np.float64)
    stage_ms = {}
    stage_ms["se3_transform"] = _time(
        lambda: native.se3_transform(raw["pc0"][i], ego), args.reps) * 1e3
    tpc0 = native.se3_transform(raw["pc0"][i], ego)
    stage_ms["pillar_prep(bin+sort+perm)"] = _time(
        lambda: native.pillar_prep(tpc0, raw["pc0_mask"][i], lo, vsz, grid),
        args.reps) * 1e3
    pid, order, iperm, sid = native.pillar_prep(
        tpc0, raw["pc0_mask"][i], lo, vsz, grid)
    stage_ms["sorted_record(9-lane PFN)"] = _time(
        lambda: native.sorted_record(tpc0, order, sid, lo, vsz, grid),
        args.reps) * 1e3
    stage_ms["row_permutes(labels)"] = _time(
        lambda: [native.permute_rows(raw[k][i], order)
                 for k in ("pc0", "pc0_mask", "flow")], args.reps) * 1e3
    if args.ssl:
        stage_ms["chamfer_cell_prep(pc1)"] = _time(
            lambda: HP.chamfer_cell_prep(
                raw["pc1"][i], raw["pc1_mask"][i],
                raw["pc1_mask"][i] & (raw["dufo_label1"][i] > 0)),
            args.reps) * 1e3

    # ---- end-to-end attach (x2 clouds + batching overhead)
    best = _time(lambda: HP.attach_host_prep(
        {k: v.copy() for k, v in raw.items()}, vs, rng, sort=True), args.reps)
    per_sample_ms = best / args.bs * 1e3

    step_s = args.step_ms / 1e3
    pairs_dev = args.bs / step_s * (args.bs / args.bs)  # device pairs/s at bs
    workers_needed = (per_sample_ms * args.bs / 1e3) / step_s

    # workers -> pairs/s model (linear scaling of per-sample-independent
    # host work; C++ ops release the GIL)
    model = {}
    for w in (1, 2, 4, 8, 16):
        host_rate = w / (per_sample_ms / 1e3)      # samples/s the host makes
        model[str(w)] = round(min(args.bs / step_s, host_rate), 2)

    out = {
        "lib": lib,
        "bs": args.bs, "n": args.n, "dist": "skewed",
        "ssl": bool(args.ssl),
        "stage_ms_per_sample": {k: round(v, 2) for k, v in stage_ms.items()},
        "attach_ms_per_sample_1thread": round(per_sample_ms, 2),
        "device_step_ms": args.step_ms,
        "device_pairs_per_sec": round(args.bs / step_s, 2),
        "workers_needed_to_keep_up": round(workers_needed, 2),
        "workers_to_pairs_per_sec": model,
        "note": ("1-vCPU sandbox: stage costs are single-thread; the model "
                 "assumes linear thread scaling (per-sample independent "
                 "C++/numpy work, GIL released) — a v5e-8 VM has 112 vCPUs"),
    }
    print(json.dumps(out, indent=1))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "HOSTPREP.json")
    merged = {}
    if os.path.exists(path):
        try:
            merged = json.load(open(path))
        except Exception:
            merged = {}
    merged["ssl" if args.ssl else "supervised"] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
