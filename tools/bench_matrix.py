#!/usr/bin/env python
"""One-process benchmark matrix: every headline config, one JSON artifact.

Runs the same measurement path as ``bench.py`` (steady-state jitted train /
eval step, fetch-synchronized differential timing) across the full headline
matrix — supervised bs∈{2,4,8}, SSL (seflowLoss) bs∈{2,4,8}, skewed-density
variants, FastFlow3D family, eval mode — in ONE process so the tunnel's
first-contact latency and compile-cache warmup are paid once, and writes
``BENCHMATRIX.json`` at the repo root.

Rationale: round-3's perf story rested on builder logs scattered across
sessions (VERDICT.md round 3, "evidence, not code").  This artifact makes the
whole matrix re-capturable in one command each round:

    python tools/bench_matrix.py            # full matrix (~15-30 min hot)
    python tools/bench_matrix.py quick      # default supervised + SSL only

Reference baselines (BASELINE.md): supervised 16.37 pairs/s per A100
(leaderboard config, reference README.md:64-66), eval budget 4.36 pairs/s
(assets/slurm/2_eval.sh ≤1 h for the 15.7k-pair val split).
"""
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FULL = [
    # (tag, env overrides)
    ("supervised_bs4", {}),
    ("supervised_bs2", {"BENCH_BS": "2"}),
    ("supervised_bs8", {"BENCH_BS": "8"}),
    ("supervised_skewed", {"BENCH_DIST": "skewed"}),
    ("fastflow3d_bs4", {"BENCH_MODEL": "fastflow3d", "BENCH_LOSS": "ff3dLoss"}),
    ("ssl_bs4", {"BENCH_LOSS": "seflowLoss"}),
    ("ssl_bs2", {"BENCH_LOSS": "seflowLoss", "BENCH_BS": "2"}),
    ("ssl_bs8", {"BENCH_LOSS": "seflowLoss", "BENCH_BS": "8"}),
    ("ssl_skewed", {"BENCH_LOSS": "seflowLoss", "BENCH_DIST": "skewed"}),
    ("eval_bs4", {"BENCH_MODE": "eval"}),
]
QUICK = [c for c in FULL if c[0] in ("supervised_bs4", "ssl_bs4")]

_KNOBS = ("BENCH_BS", "BENCH_N", "BENCH_DIST", "BENCH_LOSS", "BENCH_MODEL",
          "BENCH_MODE")


def run_config(tag, env):
    import bench

    for k in _KNOBS:
        os.environ.pop(k, None)
    os.environ.update(env)
    buf = io.StringIO()
    t0 = time.perf_counter()
    try:
        with contextlib.redirect_stdout(buf):
            bench.main()
        row = json.loads(buf.getvalue().strip().splitlines()[-1])
        row.update(tag=tag, ok=True, wall_s=round(time.perf_counter() - t0, 1))
    except Exception as e:  # keep the matrix going; record the failure
        row = {"tag": tag, "ok": False, "error": f"{type(e).__name__}: {e}",
               "wall_s": round(time.perf_counter() - t0, 1)}
    print(json.dumps(row), flush=True)
    return row


def main():
    # no arg: full matrix -> BENCHMATRIX.json.  "quick": the 2-config subset.
    # explicit tag list (e.g. `bench_matrix.py ssl_bs4 ssl_skewed`): run just
    # those rows and DON'T overwrite the artifact (A/B probes).
    argv = sys.argv[1:]
    if not argv:
        configs, write = FULL, True
    elif argv == ["quick"]:
        configs, write = QUICK, False
    else:
        by_tag = dict(FULL)
        unknown = [t for t in argv if t not in by_tag]
        if unknown:
            sys.exit(f"unknown tags {unknown}; known: {[t for t, _ in FULL]}")
        configs, write = [(t, by_tag[t]) for t in argv], False
    rows = [run_config(tag, env) for tag, env in configs]
    import jax

    out = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "rows": rows,
    }
    if write:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCHMATRIX.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
