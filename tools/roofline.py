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

FLOP model (``--hlo <compiled-module.txt>``): a byte-only roofline
misclassifies conv/matmul-wrapping fusions as memory slack (e.g. the
UNet's conv+BN-stat fusions each hide a 5x5 convolution ≈ 1 ms of MXU
floor).  Given the compiled HLO text (``jit_step.lower(...).compile()
.as_text()`` — a cache-hit compile), every scheduled op's fused computation
is scanned for ``convolution``/``dot`` lines, their FLOPs are estimated
from the parsed shapes (conv: 2·|out|·Kh·Kw·Cin via dim_labels; dot:
2·|out|·K via contracting dims), and the op floor becomes
``max(bytes/BW, flops/MXU)``.  Peaks: DEFLOW_HBM_GBPS (819 = v5e),
DEFLOW_MXU_TFLOPS (197 bf16 v5e; f32 ops are costed at 1/4 that).

Usage:
    python tools/roofline.py                     # capture + analyze (TPU)
    BENCH_LOSS=seflowLoss python tools/roofline.py
    python tools/roofline.py --analyze-only --out /tmp/trace_out
    python tools/roofline.py --hlo /tmp/hlo_step.txt   # + MXU floors
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
PEAK_TFLOPS = float(os.environ.get("DEFLOW_MXU_TFLOPS", 197.0))  # bf16 v5e
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


# ---------------------------------------------------------------- FLOP model
_DEF_RX = re.compile(
    r"^\s*(?:ROOT )?(%[\w.\-]+) = (\(?)(pred|[sufb]f?\d+)\[([\d,]*)\]")
_CALLS_RX = re.compile(r"calls=(%[\w.\-]+)")
_WINDOW_RX = re.compile(r"window=\{([^}]*)\}")
_DIMLBL_RX = re.compile(r"dim_labels=(\w+)_(\w+)->(\w+)")
_CONTRACT_RX = re.compile(r"lhs_contracting_dims=\{([\d,]*)\}")


def _win_field(window: str, key: str, ndim: int, default: int):
    m = re.search(rf"\b{key}=([\dx_]+)", window)
    if not m:
        return [default] * ndim
    return [int(v.split("_")[0]) for v in m.group(1).split("x")]


def _win_pads(window: str, ndim: int):
    m = re.search(r"\bpad=([\d_x\-]+)", window)
    if not m:
        return [(0, 0)] * ndim
    out = []
    for v in m.group(1).split("x"):
        lo, hi = (v.split("_") + ["0"])[:2]
        out.append((int(lo), int(hi)))
    return out


def _conv_taps(window: str, lhs_spatial, out_spatial) -> float:
    """Average number of VALID kernel taps per output element, per the HLO
    window spec.  The naive Πwindow·Cin model overcounts dgrad/wgrad convs
    ~100x: their windows carry huge pads (e.g. ``size=256 pad=255_255``)
    whose taps fall outside the (possibly lhs-dilated) input and multiply
    ZEROS — XLA skips them, a FLOP floor must too."""
    nd = len(lhs_spatial)
    size = _win_field(window, "size", nd, 1)
    stride = _win_field(window, "stride", nd, 1)
    ldil = _win_field(window, "lhs_dilate", nd, 1)
    rdil = _win_field(window, "rhs_dilate", nd, 1)
    pads = _win_pads(window, nd)
    taps = 1.0
    for d in range(nd):
        i_log = (lhs_spatial[d] - 1) * ldil[d] + 1
        count = 0
        for o in range(out_spatial[d]):
            base = o * stride[d] - pads[d][0]
            for k in range(size[d]):
                pos = base + k * rdil[d]
                if 0 <= pos < i_log and pos % ldil[d] == 0:
                    count += 1
        taps *= count / max(out_spatial[d], 1)
    return taps


class HloIndex:
    """Shape/def/computation index over a compiled-module ``as_text`` dump."""

    def __init__(self, path: str):
        self.shape = {}        # %name -> [dims] of the (first) output leaf
        self.dtype = {}        # %name -> dtype string
        self.defs = {}         # %name -> full def line
        self.bodies = {}       # %computation_name -> [def lines]
        cur = None
        with open(path) as f:
            for line in f:
                if line.startswith("%") and "{" in line:    # computation head
                    cur = line.split()[0]
                    self.bodies[cur] = []
                    continue
                if line.startswith("}"):
                    cur = None
                    continue
                m = _DEF_RX.match(line)
                if not m:
                    continue
                name, _, dt, dims = m.groups()
                self.shape[name] = [int(d) for d in dims.split(",") if d]
                self.dtype[name] = dt
                self.defs[name] = line
                if cur is not None:
                    self.bodies[cur].append(line)

    def _line_flops(self, line: str) -> float:
        """FLOPs of one convolution/dot HLO line (0 for anything else)."""
        m = _DEF_RX.match(line)
        if not m:
            return 0.0
        out_elems = 1
        for d in self.shape.get(m.group(1), []):
            out_elems *= d
        f32 = self.dtype.get(m.group(1)) == "f32"
        contracted = 0.0
        if " convolution(" in line:
            w = _WINDOW_RX.search(line)
            dl = _DIMLBL_RX.search(line)
            ops = re.search(r"convolution\((%[\w.\-]+), (%[\w.\-]+)\)", line)
            if not (w and dl and ops):
                return 0.0
            lhs_spec, rhs_spec, out_spec = dl.groups()
            lhs_shape = self.shape.get(ops.group(1))
            rhs_shape = self.shape.get(ops.group(2))
            out_shape = self.shape.get(m.group(1))
            if not (lhs_shape and rhs_shape and out_shape
                    and len(lhs_shape) == len(lhs_spec)
                    and len(out_shape) == len(out_spec)):
                return 0.0
            digits = sorted(c for c in lhs_spec if c.isdigit())
            lhs_sp = [lhs_shape[lhs_spec.index(c)] for c in digits]
            out_sp = [out_shape[out_spec.index(c)] for c in digits]
            cin = (rhs_shape[rhs_spec.index("i")]
                   if "i" in rhs_spec and len(rhs_shape) == len(rhs_spec)
                   else 1)
            contracted = _conv_taps(w.group(1), lhs_sp, out_sp) * cin
        elif " dot(" in line or " dot_general(" in line:
            ops = re.search(r"dot(?:_general)?\((%[\w.\-]+)", line)
            cd = _CONTRACT_RX.search(line)
            lhs_shape = self.shape.get(ops.group(1)) if ops else None
            if not (lhs_shape and cd):
                return 0.0
            contracted = 1
            for i in cd.group(1).split(","):
                if i:
                    contracted *= lhs_shape[int(i)]
        else:
            return 0.0
        # MXU costs f32 operands ~4x bf16 (pass decomposition)
        return 2.0 * out_elems * contracted * (4.0 if f32 else 1.0)

    def op_flops(self, op_name: str) -> float:
        """bf16-equivalent MXU FLOPs of a scheduled op, including every
        conv/dot inside its fused computation (and nested fusions)."""
        line = self.defs.get(op_name)
        if line is None:
            return 0.0
        total = self._line_flops(line)
        seen = set()
        stack = [c for c in _CALLS_RX.findall(line)]
        while stack:
            comp = stack.pop()
            if comp in seen:
                continue
            seen.add(comp)
            for inner in self.bodies.get(comp, ()):
                total += self._line_flops(inner)
                stack.extend(_CALLS_RX.findall(inner))
        return total


def analyze(out_dir: str, steps: int, top: int, tag: str,
            hlo_path: str = None):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    import glob

    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {out_dir}"
    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())

    hlo = HloIndex(hlo_path) if hlo_path else None

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
    matched = 0
    for name, ms in per_op_ms.items():
        gb = op_bytes(texts[name]) / 1e9
        byte_ms = gb / PEAK_GBPS * 1e3
        flop_ms = 0.0
        if hlo is not None:
            tok = name.split(" = ")[0].strip()
            fl = hlo.op_flops(tok)
            flop_ms = fl / (PEAK_TFLOPS * 1e12) * 1e3
            matched += tok in hlo.defs
        floor_ms = max(byte_ms, flop_ms)
        # hand-written Pallas kernels surface as custom-calls whose target
        # (e.g. gru_chain) often sits beyond the stored 140-char prefix —
        # tag them so the compute/mem slack split classifies them right
        kernel = " custom-call(" in name and not re.search(
            r"_sorted_(scatter|gather)|segment_sum", name)
        rows.append({
            "ms": ms, "gb": gb, "floor_ms": floor_ms, "flop_ms": flop_ms,
            "excess_ms": ms - floor_ms,
            "bw_eff": min(floor_ms / ms, 1.0) if ms > 0 else 0.0,
            "kernel": kernel,
            "op": name[:140],
        })

    total_ms = sum(r["ms"] for r in rows)
    total_gb = sum(r["gb"] for r in rows)
    floor_total = sum(r["floor_ms"] for r in rows)
    kind_note = "HBM+MXU" if hlo is not None else "HBM"
    print(f"== {tag}: {total_ms:.1f} ms/step measured, {total_gb:.2f} GB/step "
          f"touched -> {floor_total:.1f} ms floor "
          f"({100 * floor_total / total_ms:.0f}% of {kind_note} "
          f"speed-of-light) ==")
    if hlo is not None:
        print(f"   [{matched}/{len(rows)} trace ops matched in the HLO dump; "
              f"MXU floor total "
              f"{sum(r['flop_ms'] for r in rows):.1f} ms at "
              f"{PEAK_TFLOPS:.0f} TF/s bf16]")

    # ops whose floor is the MXU (or name a hand-written compute kernel) are
    # EXPECTED to sit above their byte floor
    is_compute = lambda r: (r["flop_ms"] > 0.5 * r["floor_ms"] > 0) or r[
        "kernel"] or re.search(
        r"convolution|dot|cell_sweep|gru_chain|cbg_chain", r["op"])
    sol = floor_total
    comp = sum(r["ms"] - r["floor_ms"] for r in rows if is_compute(r))
    slack = sum(r["ms"] - r["floor_ms"] for r in rows if not is_compute(r))
    print(f"   floor {sol:.1f} ms + compute-over-floor {comp:.1f} ms "
          f"+ non-compute slack {slack:.1f} ms")

    print(f"\n== top {top} ops by excess over own floor ==")
    hot = sorted(rows, key=lambda r: -r["excess_ms"])[:top]
    for r in hot:
        kind = "compute" if is_compute(r) else "mem"
        print(f"  +{r['excess_ms']:6.2f} ms  ({r['ms']:6.2f} ms, "
              f"{r['gb'] * 1e3:8.1f} MB, mxu {r['flop_ms']:5.2f} ms, "
              f"eff {r['bw_eff']:4.0%}, {kind:7s})  {r['op'][:90]}")

    return {
        "measured_ms": round(total_ms, 2),
        "touched_gb": round(total_gb, 3),
        "floor_ms": round(floor_total, 2),
        "floor_model": kind_note,
        "sol_fraction": round(floor_total / total_ms, 3),
        "mxu_floor_ms": round(sum(r["flop_ms"] for r in rows), 2),
        "compute_over_floor_ms": round(comp, 2),
        "noncompute_slack_ms": round(slack, 2),
        "peak_gbps": PEAK_GBPS,
        "peak_tflops": PEAK_TFLOPS if hlo is not None else None,
        "top_excess": [
            {"excess_ms": round(r["excess_ms"], 2), "ms": round(r["ms"], 2),
             "mb": round(r["gb"] * 1e3, 1), "mxu_ms": round(r["flop_ms"], 2),
             "bw_eff": round(r["bw_eff"], 2),
             "op": r["op"][:110]} for r in hot[:15]],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/trace_out")
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--hlo", default=None,
                    help="compiled-module as_text dump (adds MXU floors)")
    args = ap.parse_args()

    tag = ("ssl" if os.environ.get("BENCH_LOSS") == "seflowLoss" else
           "supervised") + "_bs" + os.environ.get("BENCH_BS", "4")
    if not args.analyze_only:
        from trace_step import capture
        capture(args.out, args.steps)
    result = analyze(args.out, args.steps, args.top, tag, hlo_path=args.hlo)

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
