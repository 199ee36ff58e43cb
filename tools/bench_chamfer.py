#!/usr/bin/env python
"""Full-scale chamfer benchmark on TPU: Pallas kernel vs XLA lax.scan.

    python tools/bench_chamfer.py [--n 131072] [--m 131072] [--iters 5]

Times one nearest-neighbor direction (dist+idx) at AV2 scale.  Both backends
are O(N*M) brute force (as is the reference CUDA extension) and land within
a few percent of each other (VPU/min-reduce-bound); the kernel's edge is
EXACTNESS — it computes f32 on the VPU, while a naive MXU formulation
silently rounds operands to bf16 on TPU (~1e1 absolute error on squared
distances at ±51 m coordinate scale).
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--m", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deflow_tpu.ops.chamfer import _min_dist_tiled
    from deflow_tpu.ops.pallas_chamfer import chamfer_min_pallas

    rng = np.random.default_rng(0)
    p = rng.uniform(-51, 51, (args.n, 3)).astype(np.float32)
    q = rng.uniform(-51, 51, (args.m, 3)).astype(np.float32)
    mq = np.ones(args.m, bool)
    jp, jq, jmq = jnp.asarray(p), jnp.asarray(q), jnp.asarray(mq)

    pallas_fn = jax.jit(lambda a, b, m: chamfer_min_pallas(a, b, m))
    scan_fn = jax.jit(lambda a, b, m: _min_dist_tiled(a, b, m, 2048))

    def timed(fn, label):
        d, i = fn(jp, jq, jmq)
        float(d[0])  # axon sync point (block_until_ready is a no-op here)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            d, i = fn(jp, jq, jmq)
        float(d[0])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:>12}: {dt * 1e3:8.2f} ms/direction "
              f"({args.n}x{args.m}) pairs/s={args.n * args.m / dt:.3g}")
        return dt, np.asarray(d)

    t_scan, d_scan = timed(scan_fn, "xla scan")
    t_pallas, d_pallas = timed(pallas_fn, "pallas")
    err = np.abs(d_scan - d_pallas)
    print(f"max |Δd| = {err.max():.3e}; speedup = {t_scan / t_pallas:.2f}x")


if __name__ == "__main__":
    main()
