#!/usr/bin/env python
"""CLI shim matching the reference's `python train.py key=value ...` contract
(reference README.md:66)."""
from deflow_tpu.entry.train import main

if __name__ == "__main__":
    main()
