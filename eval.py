#!/usr/bin/env python
"""CLI shim matching `python eval.py checkpoint=... av2_mode=val`
(reference README.md:88-96)."""
from deflow_tpu.entry.evaluate import main

if __name__ == "__main__":
    main()
