"""`evaluate_img` CLI: re-render ref & hyp formulas, score image metrics.

Mirrors reference evaluate_img.py:16-50: renders the ref.txt and hyp_0.txt
formula files produced by evaluate_txt back to PNGs (LaTeX toolchain, or
the synthetic renderer on toolchain-less hosts) and scores image-level
exact match + column Levenshtein.
"""

from __future__ import annotations

import os

import click

from ..data.images import greyscale
from ..data.render import build_images
from ..data.vocab import load_formulas
from ..evaluation.image import score_dirs
from ..utils import Config


@click.command()
@click.option("--results", default="results/small/")
def main(results: str) -> None:
    config = Config.from_run_dir(results, parts=("data.json",))
    dir_answers = os.path.join(results, "formulas_test/")

    formulas_ref = load_formulas(os.path.join(dir_answers, "ref.txt"))
    formulas_hyp = load_formulas(os.path.join(dir_answers, "hyp_0.txt"))

    dir_ref = os.path.join(dir_answers, "images_ref/")
    dir_hyp = os.path.join(dir_answers, "images_test/")
    buckets = getattr(config, "buckets", None)
    click.echo("Rendering reference formulas...")
    build_images(formulas_ref, dir_ref, buckets=buckets)
    click.echo("Rendering hypothesis formulas...")
    build_images(formulas_hyp, dir_hyp, buckets=buckets)

    scores = score_dirs(dir_ref, dir_hyp, greyscale)
    msg = " - ".join(f"{k}: {100 * v:.2f}" for k, v in scores.items())
    click.echo(f"- Eval Img: {msg}")


if __name__ == "__main__":
    main()
