#!/usr/bin/env python
"""Decode-error analysis over a run's ref/hyp prediction artifacts.

Reads the ``ref.txt`` / ``hyp_0.txt`` pair that evaluation writes (same
artifact layout as the reference's write_answers, reference
model/evaluation/text.py:107-145) and breaks the misses down by the axes
that have mattered in practice:

- exact match per formula-length bucket (where do long sequences fail?)
- OOV-line EM: lines whose reference contains ``_UNK`` (tokens outside
  the vocab — the novelty->_UNK mapping the OOV curriculum teaches)
- overcalled-``_UNK`` misses: same-length substitutions where the model
  emitted ``_UNK`` for an in-vocab token (rare-glyph confusion — what
  ``--rare-boost`` attacks)
- top token-level confusion pairs among same-length substitutions

Usage:
    python scripts/error_analysis.py --answers results/<run>/formulas_test/
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click

from latex_ocr_tpu.evaluation.report import analyze_answers, format_report


@click.command()
@click.option("--answers", required=True,
              help="Dir holding ref.txt and hyp_0.txt (a run's formulas_* dir)")
@click.option("--hyp", default="hyp_0.txt", help="Hypothesis file name")
@click.option("--length-bucket", default=25, help="Formula-length bucket width")
@click.option("--top-confusions", default=10)
@click.option("--json", "as_json", is_flag=True, help="Print one JSON blob")
def main(answers, hyp, length_bucket, top_confusions, as_json):
    report = analyze_answers(
        os.path.join(answers, "ref.txt"),
        os.path.join(answers, hyp),
        length_bucket=length_bucket,
        top_confusions=top_confusions,
    )
    if as_json:
        print(json.dumps(report))
    else:
        print(format_report(report))


if __name__ == "__main__":
    main()
