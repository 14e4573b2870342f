#!/usr/bin/env python
"""Thin wrapper: `python visualize_attention.py` — see latex_ocr_tpu/cli/visualize_attention_cli.py."""
from latex_ocr_tpu.cli.visualize_attention_cli import main

if __name__ == "__main__":
    main()
