#!/usr/bin/env python
"""Standalone timing of the SSL sweep-chamfer forward (_ssl_nn) on TPU.

Times ONLY the fused dual-mask grid-NN forward (sorts + slab builds + the
two cell-sweep Pallas kernels + unsorts) at bench scale, so kernel variants
can be A/B'd with a small fast-compiling graph instead of a full SSL train
step (full-step graphs take 10-40 min through the tunnel helper on first
compile; this one compiles in ~1 min).

Usage: python tools/bench_sweep.py   [BENCH_BS, BENCH_N, BENCH_DIST apply]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import make_batch
    from deflow_tpu.ops import chamfer as CH
    from deflow_tpu.ops.pallas_sweep import CHUNK_C, CHUNK_Q

    batch = int(os.environ.get("BENCH_BS", 4))
    n = int(os.environ.get("BENCH_N", 98304))
    valid = min(86016, n)
    dist = os.environ.get("BENCH_DIST", "uniform")
    hb = make_batch(batch, n, valid, dist=dist)

    spec = CH._resolve_spec("grid", n, n, 2.0, None)
    pc0 = jnp.asarray(hb["pc0"])
    pc1 = jnp.asarray(hb["pc1"])
    m0 = jnp.asarray(hb["pc0_mask"])
    m1 = jnp.asarray(hb["pc1_mask"])
    f0 = jnp.asarray(hb["dufo_label0"]) > 0
    f1 = jnp.asarray(hb["dufo_label1"]) > 0

    grad_mode = os.environ.get("BENCH_SWEEP_GRAD", "0") != "0"
    if grad_mode:
        # SeFlow-shaped VJP: truncated sums, gradient wrt pc0 only (the
        # warped side) — exercises the full bwd pipeline incl. the own-row
        # w-terms and mirror scatters, with direction 1 DCE'd as in training
        t2 = 4.0

        def loss(p0):
            d0a, d1a, d0f, d1f = CH._ssl_nn(p0, pc1, m0, m1, f0, f1, spec)[:4]
            return (jnp.sum(jnp.minimum(d0a, t2)) + jnp.sum(jnp.minimum(d1a, t2))
                    + jnp.sum(jnp.minimum(d0f, t2))
                    + jnp.sum(jnp.minimum(d1f, t2)))

        vg = jax.jit(jax.value_and_grad(loss))
        fn = lambda: vg(pc0)[1]
        drain = lambda out: float(out[0, 0, 0])
    else:
        jfn = jax.jit(lambda *a: CH._ssl_nn(*a, spec))
        fn = lambda: jfn(pc0, pc1, m0, m1, f0, f1)
        drain = lambda out: float(out[0][0, 0])

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        drain(out)  # tunnel-safe sync
        return time.perf_counter() - t0

    t_c = run(1)
    run(1)
    t1 = run(1)
    iters = 20
    tk = run(iters)
    dt = (tk - t1) / (iters - 1) * 1e3
    print(json.dumps({
        "metric": "ssl_nn_grad_ms" if grad_mode else "ssl_nn_forward_ms",
        "value": round(dt, 2), "unit": "ms",
        "batch": batch, "n": n, "dist": dist, "compile_s": round(t_c, 1),
        "chunk_q": CHUNK_Q,
        "chunk_c": CHUNK_C,
    }), flush=True)


if __name__ == "__main__":
    main()
