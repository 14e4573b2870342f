#!/usr/bin/env python
"""Thin wrapper: `python build.py` — see latex_ocr_tpu/cli/build_cli.py."""
from latex_ocr_tpu.cli.build_cli import main

if __name__ == "__main__":
    main()
