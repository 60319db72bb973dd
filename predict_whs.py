#!/usr/bin/env python
"""NIfTI prediction export (reference predict_whs.py analog)."""
from miseg_tpu.cli.predict_whs import main

if __name__ == "__main__":
    main()
