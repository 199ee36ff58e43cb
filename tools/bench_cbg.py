#!/usr/bin/env python
"""Microbench: fused conv3x3+BN+GELU Pallas chain vs the plain XLA lowering.

Runs the three UNet stage groups (2B=8 siamese batch) in isolation on the
real TPU: forward-only and forward+backward wall time per iteration.

Usage: python tools/bench_cbg.py [--stage 256|128|64|all]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deflow_tpu.ops import pallas_cbg as C

    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all")
    args = ap.parse_args()

    stages = {
        "256": (8, 256, 256, 64, 3),
        "128": (8, 128, 128, 128, 3),
        "64": (8, 64, 64, 256, 1),
    }
    sel = stages if args.stage == "all" else {args.stage: stages[args.stage]}

    for name, (b, h, w, c, nb) in sel.items():
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        key = jax.random.key(1)
        params = []
        for _ in range(nb):
            key, k1, k2 = jax.random.split(key, 3)
            params.append((
                (jax.random.normal(k1, (3, 3, c, c), jnp.float32) * 0.05
                 ).astype(jnp.bfloat16),
                jnp.zeros((1, c), jnp.bfloat16),
                jnp.ones((c,), jnp.float32),
                jnp.zeros((c,), jnp.float32),
            ))
        params = tuple(params)

        def plain(x, params):
            s_prev = x
            for (wm, bi, ga, be) in params:
                s = jax.lax.conv_general_dilated(
                    s_prev, wm, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + bi[0]
                sf = s.astype(jnp.float32)
                mu = sf.mean(axis=(0, 1, 2))
                var = (sf * sf).mean(axis=(0, 1, 2)) - mu * mu
                z = (sf - mu) * jax.lax.rsqrt(var + 1e-5) * ga + be
                s_prev = jax.nn.gelu(z, approximate=False).astype(x.dtype)
            return s_prev

        def fused(x, params):
            x_g = C.guard_pad(x.reshape(b * h * w, c), b, h, w)
            y_g, _, _ = C.cbg_chain((b, h, w, 1e-5), x_g, params)
            return C.guard_slice(y_g, b, h, w).reshape(b, h, w, c)

        def bench(fn, tag):
            f = jax.jit(lambda x, p: jnp.sum(fn(x, p).astype(jnp.float32)))
            g = jax.jit(jax.grad(
                lambda x, p: jnp.sum(fn(x, p).astype(jnp.float32)),
                argnums=(0, 1)))

            def sync(r):
                jax.tree.map(lambda t: float(jnp.ravel(t)[0]), r)

            sync(f(x, params)); sync(g(x, params))
            for which, fn2 in (("fwd", f), ("fwd+bwd", g)):
                t0 = time.perf_counter(); sync(fn2(x, params))
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                r = None
                for _ in range(10):
                    r = fn2(x, params)
                sync(r)
                tk = time.perf_counter() - t0
                dt = max(tk - t1, 1e-9) / 9
                print(f"  {tag:6s} {which:8s}: {dt*1e3:7.3f} ms")

        print(f"== stage {name}: [{b},{h},{w},{c}] x{nb} blocks ==")
        bench(plain, "plain")
        bench(fused, "fused")


if __name__ == "__main__":
    main()
