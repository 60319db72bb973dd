#!/usr/bin/env python
"""Checkpoint evaluation entry point (reference test.py analog — a model
evaluation script, not a unit test). See miseg_tpu/cli/test.py."""
from miseg_tpu.cli.test import main

if __name__ == "__main__":
    main()
