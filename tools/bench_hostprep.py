#!/usr/bin/env python
"""Host data-path throughput: attach_host_prep(sort=True) ms/sample and the
loader-vs-device-step budget (VERDICT r2 #7).

The reference feeds 8 GPUs from a num_workers=16 torch loader fleet
(reference assets/slurm/1_train.sh:29); our equivalent is the C++/OpenMP
``csrc/pointops.cpp`` host pipeline driven by loader threads
(``num_workers``; ctypes releases the GIL).  This sandbox has ONE vCPU, so
thread scaling is unmeasurable here — this tool publishes the single-thread
number and the thread count a real TPU-VM host (v5e-8 VMs ship 112 vCPUs)
needs for the loader to stay ahead of the device step.

Run: ``python tools/bench_hostprep.py [--bs 16] [--n 98304] [--step-ms 113]``
(pure host work — safe to run alongside a TPU process).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--n", type=int, default=98304)
    ap.add_argument("--valid", type=int, default=86016)
    ap.add_argument("--step-ms", type=float, default=113.0,
                    help="device train-step time the loader must beat")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import make_batch  # reuses the bench cloud generator
    from deflow_tpu.data.host_prep import attach_host_prep
    from deflow_tpu.utils import native

    print(f"C++ pointops: {'LOADED' if native.get_lib() is not None else 'numpy fallback'}")

    # raw batch WITHOUT host prep (make_batch attaches it; strip and re-time)
    hb = make_batch(args.bs, args.n, args.valid, dist="skewed")
    raw = {k: v for k, v in hb.items()
           if not (k.endswith(("_ids", "_order", "_iperm", "_sorted",
                               "_sorted_rec", "_unsort", "_transformed")))}

    times = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        attach_host_prep(dict(raw), [0.2, 0.2, 6.0],
                         [-51.2, -51.2, -3.0, 51.2, 51.2, 3.0], sort=True)
        times.append(time.perf_counter() - t0)
    best = min(times)
    per_sample = best / args.bs * 1e3
    step_s = args.step_ms / 1e3
    workers_needed = best / step_s
    print(f"attach_host_prep(sort=True) bs={args.bs} n={args.n}: "
          f"{best*1e3:.1f} ms/batch = {per_sample:.1f} ms/sample "
          f"(single thread, this host)")
    print(f"device step budget {args.step_ms:.0f} ms → loader needs "
          f"≥{workers_needed:.1f}× parallelism to stay ahead "
          f"(num_workers={int(np.ceil(workers_needed))}; linear scaling "
          f"assumption — C++ ops release the GIL, stages are per-sample "
          f"independent)")


if __name__ == "__main__":
    main()
