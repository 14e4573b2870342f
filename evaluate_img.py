#!/usr/bin/env python
"""Thin wrapper: `python evaluate_img.py` — see latex_ocr_tpu/cli/evaluate_img_cli.py."""
from latex_ocr_tpu.cli.evaluate_img_cli import main

if __name__ == "__main__":
    main()
