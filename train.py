#!/usr/bin/env python
"""Train entry point (reference train.py analog). See miseg_tpu/cli/train.py."""
from miseg_tpu.cli.train import main

if __name__ == "__main__":
    main()
