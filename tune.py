#!/usr/bin/env python
"""Hyper-parameter optimization entry point (reference tune.py analog)."""
from miseg_tpu.cli.tune import main

if __name__ == "__main__":
    main()
