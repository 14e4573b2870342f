#!/usr/bin/env python
"""Thin wrapper: `python train.py` — see latex_ocr_tpu/cli/train_cli.py."""
from latex_ocr_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
