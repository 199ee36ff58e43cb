#!/usr/bin/env python
"""CLI shim matching `python save.py checkpoint=... dataset_path=...`
(reference README.md:106-112)."""
from deflow_tpu.entry.save import main

if __name__ == "__main__":
    main()
