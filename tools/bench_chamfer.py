#!/usr/bin/env python
"""Chamfer backend scaling bench: brute vs coarse-grid, fwd and fwd+bwd.

Run on the real TPU (plain ``python tools/bench_chamfer.py``) or CPU (with the
conftest-style env prefix).  Times the truncated chamfer loss exactly as the
SSL path uses it (value + gradient wrt the warped cloud).

The reference's chamfer3D CUDA extension is brute force (reference
README.md:39); full-scale SeFlow SSL needs 131k-vs-131k per sample, where
brute force is quadratic (~850 ms/dir on v5e) — the grid backend is the
production path.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cloud(rng, n, skew=True):
    if skew:
        r = np.clip(rng.gamma(2.0, 8.0, n), 1.5, 51.0)
        th = rng.uniform(0, 2 * np.pi, n)
        return np.stack([r * np.cos(th), r * np.sin(th),
                         rng.uniform(-2.8, 2.8, n)], -1).astype(np.float32)
    return rng.uniform(-51, 51, (n, 3)).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16384,65536,131072")
    ap.add_argument("--valid_frac", type=float, default=0.66)
    ap.add_argument("--uniform", action="store_true")
    ap.add_argument("--skip_brute_above", type=int, default=32768)
    ap.add_argument("--capacity", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--trace", action="store_true",
                    help="profile the grid fwd at the largest size and print "
                         "the xplane op breakdown")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deflow_tpu.ops.chamfer import NNSpec, chamfer_distance

    rng = np.random.default_rng(0)

    def timed(f, *a):
        out = f(*a)
        jax.tree_util.tree_map(lambda x: float(jnp.ravel(x)[0]), out)  # drain
        t0 = time.perf_counter()
        k = 5
        for _ in range(k):
            out = f(*a)
        jax.tree_util.tree_map(lambda x: float(jnp.ravel(x)[0]), out)
        return (time.perf_counter() - t0) / k

    for n in [int(s) for s in args.sizes.split(",")]:
        p = cloud(rng, n, not args.uniform)
        q = cloud(rng, n, not args.uniform)
        mask = np.arange(n) < int(n * args.valid_frac)
        p[~mask] = 0
        q[~mask] = 0
        jp, jq, jm = jnp.asarray(p), jnp.asarray(q), jnp.asarray(mask)

        # XLA-fallback capacity-overflow telemetry (the Pallas cell-sweep
        # path has no capacity; this quantifies what the fallback drops)
        from deflow_tpu.ops.chamfer import grid_overflow_stats

        ospec = NNSpec(method="grid", cell=2.0, capacity=args.capacity)
        drop, cellfrac, cmax = (float(x) for x in grid_overflow_stats(
            jq, jm, ospec))
        print(f"n={n:7d} overflow(cap={args.capacity}): dropped "
              f"{drop:.2%} of points, {cellfrac:.2%} of cells, "
              f"max cell count {int(cmax)}")

        def loss(pc0, spec):
            d0, d1 = chamfer_distance(pc0, jq, jm, jm, spec=spec)
            return (jnp.sum(jnp.minimum(d0, 4.0)) + jnp.sum(jnp.minimum(d1, 4.0)))

        for name, spec in (
            ("grid", NNSpec(method="grid", cell=2.0, ring=1,
                            capacity=args.capacity, chunk=args.chunk)),
            ("brute", NNSpec(method="brute")),
        ):
            if name == "brute" and n > args.skip_brute_above:
                print(f"n={n:7d} {name:5s}  skipped (quadratic)")
                continue
            fwd = jax.jit(lambda pc0, s=spec: loss(pc0, s))
            vg = jax.jit(jax.value_and_grad(lambda pc0, s=spec: loss(pc0, s)))
            tf = timed(fwd, jp)
            tg = timed(vg, jp)
            v = float(fwd(jp))
            print(f"n={n:7d} {name:5s}  fwd {tf*1e3:8.2f} ms   "
                  f"fwd+bwd {tg*1e3:8.2f} ms   loss={v:.1f}")
            if args.trace and name == "grid":
                from trace_step import analyze

                out_dir = "/tmp/trace_chamfer"
                steps = 5
                jax.profiler.start_trace(out_dir)
                o = None
                for _ in range(steps):
                    o = fwd(jp)
                float(o)
                jax.profiler.stop_trace()
                analyze(out_dir, steps)


if __name__ == "__main__":
    main()
