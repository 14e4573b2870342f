#!/usr/bin/env python
"""Thin wrapper: `python predict.py` — see latex_ocr_tpu/cli/predict_cli.py."""
from latex_ocr_tpu.cli.predict_cli import main

if __name__ == "__main__":
    main()
