#!/usr/bin/env python
"""Published-checkpoint parity gate (BASELINE.json; reference README.md:20,86).

Given a checkpoint (torch ``deflow_best.ckpt`` or an orbax dir) and a labeled
AV2 split, runs the official 3-way eval and asserts the EPE bound:

    python tools/parity_gate.py checkpoint=/path/deflow_best.ckpt \\
        dataset_path=/path/av2 [expected_epe=0.0XXX] [rel_tol=0.01]

The expected value comes from (in order): the ``expected_epe`` override, or
``BASELINE.json``'s ``published["EPE_3way_mean"]``.  With neither available
(this offline environment), the gate prints the table and exits rc=2
("report-only": ran fine, nothing to compare against) — so the moment the
published weights + real data exist, the gate runs with zero new code.

Exit codes: 0 = within bound, 1 = parity FAILED, 2 = report-only.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_gate(cfg=None) -> int:
    from deflow_tpu.config import from_cli
    from deflow_tpu.entry.evaluate import main as eval_main

    if cfg is None:
        cfg = from_cli(config_name="config")
    if not cfg.get("checkpoint"):
        print("parity_gate: checkpoint=<path> is required", file=sys.stderr)
        return 1
    cfg.av2_mode = "val"

    metrics = eval_main(cfg)
    epe = float(metrics["EPE_3way_mean"])

    expected = cfg.get("expected_epe")
    if expected is None:
        base_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BASELINE.json")
        try:
            with open(base_path) as f:
                expected = json.load(f).get("published", {}).get("EPE_3way_mean")
        except OSError:
            expected = None
    if expected is None:
        print(f"parity_gate: EPE_3way_mean={epe:.6f} — no published expected "
              "value available (set expected_epe=... or BASELINE.json "
              "published.EPE_3way_mean); report-only.")
        return 2

    expected = float(expected)
    rel_tol = float(cfg.get("rel_tol", 0.01))
    rel = abs(epe - expected) / max(abs(expected), 1e-12)
    ok = rel <= rel_tol
    print(f"parity_gate: EPE_3way_mean={epe:.6f} expected={expected:.6f} "
          f"rel_err={rel:.4%} tol={rel_tol:.2%} → "
          f"{'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(run_gate())
