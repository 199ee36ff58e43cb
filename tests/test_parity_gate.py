"""End-to-end parity-gate runner test (tools/parity_gate.py).

Stands in for the published-checkpoint gate: a torch-twin checkpoint in the
exact Lightning layout (``state_dict`` with ``model.`` prefixes) is written to
disk, converted + evaluated on a synthetic labeled val split, and the 1% EPE
bound is asserted both ways (pass on self-consistent expectation, fail on a
wrong one, report-only without one).
"""

import os
import sys

import numpy as np
import pytest
import torch

from deflow_tpu.config import compose

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from torch_twin import TorchDeFlow, randomize_

VOXEL = [1.6, 1.6, 6.0]
RANGE = (-51.2, -51.2, -3.0, 51.2, 51.2, 3.0)


@pytest.fixture(scope="module")
def gate_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("gate")
    from deflow_tpu.data import make_split

    make_split(str(root), "val", num_scenes=1, num_frames=3,
               points_per_frame=1500, labeled=True, with_eval_mask=True)

    tm = TorchDeFlow(decoder_option="gru", voxel_size=tuple(VOXEL),
                     point_cloud_range=RANGE)
    randomize_(tm, seed=11)
    ckpt = str(root / "twin_best.ckpt")
    torch.save({"state_dict": {"model." + k: v
                               for k, v in tm.state_dict().items()}}, ckpt)

    def make_cfg(**extra):
        cfg = compose("config", [
            f"dataset_path={root}", f"checkpoint={ckpt}", "batch_size=2",
            "max_points=2048", f"voxel_size=[{VOXEL[0]},{VOXEL[1]},{VOXEL[2]}]",
            "model.target.grid_feature_size=[64,64]",
            "model.target.num_iters=2", "precision=fp32",
        ])
        for k, v in extra.items():
            setattr(cfg, k, v)
        return cfg

    # one reference eval to learn this checkpoint's own EPE
    from deflow_tpu.entry.evaluate import main as eval_main

    cfg = make_cfg(av2_mode="val")
    epe = float(eval_main(cfg)["EPE_3way_mean"])
    assert np.isfinite(epe)
    return make_cfg, epe


def test_gate_passes_on_self_consistent_expectation(gate_env):
    make_cfg, epe = gate_env
    from tools.parity_gate import run_gate

    assert run_gate(make_cfg(expected_epe=epe)) == 0


def test_gate_fails_outside_bound(gate_env):
    make_cfg, epe = gate_env
    from tools.parity_gate import run_gate

    assert run_gate(make_cfg(expected_epe=epe * 2 + 1.0)) == 1


def test_gate_report_only_without_expected(gate_env):
    make_cfg, _ = gate_env
    from tools.parity_gate import run_gate

    # BASELINE.json carries no published EPE in this offline environment
    assert run_gate(make_cfg()) == 2
