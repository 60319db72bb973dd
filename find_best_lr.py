#!/usr/bin/env python
"""LR range test entry point (reference find_best_lr.py analog)."""
from miseg_tpu.cli.find_best_lr import main

if __name__ == "__main__":
    main()
