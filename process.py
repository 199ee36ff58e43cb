#!/usr/bin/env python
"""CLI shim matching the reference's `python process.py --scene_range a,b`
SeFlow DUFO label jobs (reference assets/slurm/dufolabel_sbatch.py:43-46)."""
from deflow_tpu.dataprocess.process import main

if __name__ == "__main__":
    main()
