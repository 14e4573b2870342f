#!/usr/bin/env python
"""Thin wrapper: `python serve.py` — see latex_ocr_tpu/cli/serve_cli.py."""
from latex_ocr_tpu.cli.serve_cli import main

if __name__ == "__main__":
    main()
