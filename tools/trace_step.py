#!/usr/bin/env python
"""Profile the bench train step on TPU and print an aggregated op breakdown.

Usage:  python tools/trace_step.py [--steps 3] [--out /tmp/trace_out]

Captures a jax.profiler trace of the steady-state jitted train step (same
config as bench.py), parses the xplane proto, aggregates the "XLA Ops" line
by op category, and prints the top ops + category totals in ms/step.
Recipe: CLAUDE.md perf roadmap (PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python).
"""

import argparse
import collections
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def capture(out_dir: str, steps: int):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_batch

    from deflow_tpu.config import compose
    from deflow_tpu.models import build_model
    from deflow_tpu import trainer as T

    batch, n, valid = (int(os.environ.get("BENCH_BS", 4)),
                       int(os.environ.get("BENCH_N", 98304)), 86016)
    loss_fn = os.environ.get("BENCH_LOSS", "deflowLoss")
    cfg = compose("config", [f"batch_size={batch}", "lr=2e-4",
                             f"loss_fn={loss_fn}", "precision=bf16"])
    model = build_model(cfg.model, precision="bf16")
    host_batch = make_batch(batch, n, valid)
    mesh = T.create_mesh(1)
    state = T.init_state(model, cfg, host_batch, seed=0)
    state = jax.device_put(state, T.replicated(mesh))
    step = T.jit_train_step(T.make_train_step(model, loss_fn), mesh)
    dev_batch = T.device_batch(host_batch, mesh)

    for _ in range(2):  # compile + warm
        state, aux = step(state, dev_batch)
    float(aux["loss"])

    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        state, aux = step(state, dev_batch)
    float(aux["loss"])
    jax.profiler.stop_trace()


CATEGORIES = [
    ("conv/matmul", re.compile(r"convolution|dot|einsum")),
    ("pallas", re.compile(r"pallas|custom-call")),
    ("sort", re.compile(r"sort")),
    ("scatter", re.compile(r"scatter")),
    ("gather", re.compile(r"gather|dynamic-slice")),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape|pad|concatenate|slice")),
    ("reduce", re.compile(r"reduce")),
    ("fusion/elementwise", re.compile(r"fusion|add|multiply|select|compare|convert")),
]


def analyze(out_dir: str, steps: int, top: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {out_dir}"
    path = max(paths, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    per_op = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                per_op[name] += ev.duration_ps / 1e9 / steps  # -> ms/step
    total = sum(per_op.values())
    print(f"== device op time: {total:.1f} ms/step over {steps} steps "
          f"({len(per_op)} unique ops) ==")

    cats = collections.Counter()
    for name, ms in per_op.items():
        for cat, rx in CATEGORIES:
            if rx.search(name):
                cats[cat] += ms
                break
        else:
            cats["other"] += ms
    for cat, ms in cats.most_common():
        print(f"  {cat:>20}: {ms:7.2f} ms")
    print(f"\n== top {top} ops ==")
    for name, ms in per_op.most_common(top):
        print(f"  {ms:7.2f} ms  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/trace_out")
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.out, args.steps)
    analyze(args.out, args.steps)
