#!/usr/bin/env python
"""Thin wrapper: `python evaluate_txt.py` — see latex_ocr_tpu/cli/evaluate_txt_cli.py."""
from latex_ocr_tpu.cli.evaluate_txt_cli import main

if __name__ == "__main__":
    main()
