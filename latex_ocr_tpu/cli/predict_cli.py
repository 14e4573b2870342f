"""`predict` CLI: interactive REPL — image path in, LaTeX out.

Mirrors reference predict.py:13-54: accepts a .png (or .pdf when the
ImageMagick toolchain is present: pdf -> png at density 200, crop to ink,
pad to the 21-bucket table, LANCZOS downsample /2), greyscales, decodes on
device and prints the top hypothesis.
"""

from __future__ import annotations

import os
import shutil

import click
import numpy as np

from ..data.images import (
    crop_image,
    downsample_image,
    greyscale,
    pad_image,
    read_img,
)
from ..utils import Config
from .common import compute_dtype_from, make_vocab

PDF_BUCKETS = [
    [240, 100], [320, 80], [400, 80], [400, 100], [480, 80], [480, 100],
    [560, 80], [560, 100], [640, 80], [640, 100], [720, 80], [720, 100],
    [720, 120], [720, 200], [800, 100], [800, 320], [1000, 200],
    [1000, 400], [1200, 200], [1600, 200], [1600, 1600],
]


def _pdf_to_png(path: str) -> str:
    from ..utils.general import run

    if shutil.which("magick") is None and shutil.which("convert") is None:
        raise click.ClickException("PDF input requires ImageMagick")
    magick = "magick convert" if shutil.which("magick") else "convert"
    png = os.path.splitext(path)[0] + ".png"
    run(f"{magick} -density 200 -quality 100 {path} {png}", 10)
    crop_image(png, png)
    pad_image(png, png, buckets=PDF_BUCKETS)
    downsample_image(png, png, 2)
    return png


def load_model(results: str):
    import jax

    config = Config.from_run_dir(results, parts=("vocab.json", "model.json"))
    vocab = make_vocab(config)

    from ..models.img2seq import Img2SeqModel
    from ..training.checkpoint import CheckpointManager

    model = Img2SeqModel(config, vocab, compute_dtype=compute_dtype_from(config))
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(os.path.join(results, "model_weights"))
    restored = ckpt.restore_params(params)
    if restored is None:
        raise click.ClickException(f"No checkpoint found under {results}model_weights")
    return model, restored


def predict_image(model, params, img_path: str, with_score: bool = False):
    import jax.numpy as jnp

    from ..data.pipeline import snap_image_shape

    img = greyscale(read_img(img_path))
    H, W = snap_image_shape(img.shape[:2], None)
    batch = np.full((1, H, W, 1), 255, np.uint8)
    batch[0, : img.shape[0], : img.shape[1]] = img
    if with_score:
        ids, scores = model.decode_step_scored(params, jnp.asarray(batch))
        return (model.ids_to_latex(np.asarray(ids)[0, 0]),
                float(np.asarray(scores)[0, 0]))
    ids = model.decode_step(params, jnp.asarray(batch))
    return model.ids_to_latex(np.asarray(ids)[0, 0])


def predict_via_http(url: str, img_path: str, model: str | None = None):
    """Client for the `serve --http` endpoint: POST the PNG bytes, return
    the decoded JSON dict ({latex[, score]})."""
    import json as _json
    import urllib.parse
    import urllib.request

    with open(img_path, "rb") as f:
        body = f.read()
    target = url.rstrip("/") + "/predict"
    if model:
        target += "?model=" + urllib.parse.quote(model)
    req = urllib.request.Request(
        target, data=body, headers={"Content-Type": "image/png"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return _json.loads(resp.read())


@click.command()
@click.option("--results", default="results/full/")
@click.option("--image", default=None, help="Decode one image and exit (no REPL)")
@click.option("--url", default=None,
              help="Client mode: send images to a `serve --http` endpoint "
                   "(e.g. http://127.0.0.1:8321) instead of loading a "
                   "local checkpoint — no JAX, no weights on this host")
@click.option("--route", default=None,
              help="Model route for --url multi-model servers")
@click.option("--scores", is_flag=True,
              help="Print the hypothesis confidence (sequence log-prob; "
                   "beam re-rank score under length-norm re-ranking) "
                   "before each hypothesis")
def main(results: str, image: str | None, url: str | None,
         route: str | None, scores: bool) -> None:
    if url is None:
        from ..utils.jax_setup import setup_jax

        setup_jax()
        model, params = load_model(results)

    def handle(path: str) -> None:
        path = path.strip()
        if path.endswith(".pdf"):
            path = _pdf_to_png(path)
        if url is not None:
            out = predict_via_http(url, path, model=route)
            if "score" in out:
                click.echo(f"{out['score']:.4f}\t{out['latex']}")
            else:
                click.echo(out["latex"])
        elif scores:
            hyp, score = predict_image(model, params, path, with_score=True)
            click.echo(f"{score:.4f}\t{hyp}")
        else:
            hyp = predict_image(model, params, path)
            click.echo(hyp)

    if image is not None:
        handle(image)
        return

    click.echo(
        "Interactive mode: enter a path to a .png or .pdf formula image"
        " (Ctrl-D to exit)"
    )
    while True:
        try:
            path = input("input> ")
        except EOFError:
            break
        if not path.strip():
            continue
        try:
            handle(path)
        except FileNotFoundError:
            click.echo(f"file not found: {path.strip()}")


if __name__ == "__main__":
    main()
