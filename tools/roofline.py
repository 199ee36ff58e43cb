#!/usr/bin/env python
"""HBM-roofline analysis of the bench train step from a profiler trace.

For every "XLA Ops" event the HLO text carries the output and operand shapes
(`dtype[dims]{layout}`).  An op's minimum HBM time is (bytes in + bytes out)
divided by peak bandwidth — on TPU v5e 819 GB/s.  Comparing that floor to the
measured time classifies every op:

  * efficiency ≈ 1.0  → at HBM speed-of-light; only moving fewer bytes helps
  * efficiency « 1.0  → either MXU/VPU compute-bound (convs, matmuls, pallas
    distance kernels — fine) or genuinely inefficient (layout churn,
    descriptor-bound row ops — the remaining levers)

The report prints the step-level roofline (total bytes → minimum ms vs
measured ms) and the top ops ranked by EXCESS time over their own byte floor,
and writes ``ROOFLINE.json`` at the repo root (merged per-config).

Byte model: operands + outputs of each scheduled op.  Fusion internals never
touch HBM (that is what fusion means) so the operand/output surface IS the
op's HBM traffic; an array read by k consumers is counted k times (it is
read k times unless XLA keeps it in a register file — HBM-resident tensors
at our sizes are re-read).  Tuple shapes count every leaf.

Usage:
    python tools/roofline.py                     # capture + analyze (TPU)
    BENCH_LOSS=seflowLoss python tools/roofline.py
    python tools/roofline.py --analyze-only --out /tmp/trace_out
"""
import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

PEAK_GBPS = float(os.environ.get("DEFLOW_HBM_GBPS", 819.0))  # TPU v5e HBM
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}
_SHAPE_RX = re.compile(r"\b(pred|[sufb]f?\d+)\[([\d,]*)\]")


def op_bytes(hlo_text: str) -> int:
    """Sum bytes over every shape token (output leaves + all operands)."""
    total = 0
    for dtype, dims in _SHAPE_RX.findall(hlo_text):
        size = _DTYPE_BYTES.get(dtype)
        if size is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * size
    return total


def analyze(out_dir: str, steps: int, top: int, tag: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    import glob

    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {out_dir}"
    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())

    per_op_ms = collections.Counter()
    texts = {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                per_op_ms[name] += ev.duration_ps / 1e9 / steps
                texts[name] = name

    rows = []
    for name, ms in per_op_ms.items():
        gb = op_bytes(texts[name]) / 1e9
        floor_ms = gb / PEAK_GBPS * 1e3
        rows.append({
            "ms": ms, "gb": gb, "floor_ms": floor_ms,
            "excess_ms": ms - floor_ms,
            "bw_eff": min(floor_ms / ms, 1.0) if ms > 0 else 0.0,
            "op": name[:140],
        })

    total_ms = sum(r["ms"] for r in rows)
    total_gb = sum(r["gb"] for r in rows)
    floor_total = total_gb / PEAK_GBPS * 1e3
    print(f"== {tag}: {total_ms:.1f} ms/step measured, {total_gb:.2f} GB/step "
          f"touched -> {floor_total:.1f} ms at {PEAK_GBPS:.0f} GB/s "
          f"({100 * floor_total / total_ms:.0f}% of HBM speed-of-light) ==")

    # compute-bound classes are EXPECTED to sit above their byte floor
    is_compute = lambda r: re.search(
        r"convolution|dot|cell_sweep|gru_chain|cbg_chain", r["op"])
    sol = sum(r["floor_ms"] for r in rows)
    comp = sum(r["ms"] - r["floor_ms"] for r in rows if is_compute(r))
    slack = sum(r["ms"] - r["floor_ms"] for r in rows if not is_compute(r))
    print(f"   byte floor {sol:.1f} ms + compute-over-floor {comp:.1f} ms "
          f"+ non-compute slack {slack:.1f} ms")

    print(f"\n== top {top} ops by excess over own byte floor ==")
    hot = sorted(rows, key=lambda r: -r["excess_ms"])[:top]
    for r in hot:
        kind = "compute" if is_compute(r) else "mem"
        print(f"  +{r['excess_ms']:6.2f} ms  ({r['ms']:6.2f} ms, "
              f"{r['gb'] * 1e3:8.1f} MB, eff {r['bw_eff']:4.0%}, {kind:7s})  "
              f"{r['op'][:95]}")

    return {
        "measured_ms": round(total_ms, 2),
        "touched_gb": round(total_gb, 3),
        "floor_ms_at_peak_bw": round(floor_total, 2),
        "sol_fraction": round(floor_total / total_ms, 3),
        "compute_over_floor_ms": round(comp, 2),
        "noncompute_slack_ms": round(slack, 2),
        "peak_gbps": PEAK_GBPS,
        "top_excess": [
            {"excess_ms": round(r["excess_ms"], 2), "ms": round(r["ms"], 2),
             "mb": round(r["gb"] * 1e3, 1), "bw_eff": round(r["bw_eff"], 2),
             "op": r["op"][:110]} for r in hot[:15]],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/trace_out")
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    tag = ("ssl" if os.environ.get("BENCH_LOSS") == "seflowLoss" else
           "supervised") + "_bs" + os.environ.get("BENCH_BS", "4")
    if not args.analyze_only:
        from trace_step import capture
        capture(args.out, args.steps)
    result = analyze(args.out, args.steps, args.top, tag)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROOFLINE.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged[tag] = result
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"\nwrote {path} [{tag}]")


if __name__ == "__main__":
    main()
