#!/usr/bin/env python
"""CLI shim matching the reference's `python dataprocess/extract_av2.py ...`
(reference assets/slurm/0_process.sh:17-35)."""
from deflow_tpu.dataprocess.extract_av2 import main

if __name__ == "__main__":
    main()
