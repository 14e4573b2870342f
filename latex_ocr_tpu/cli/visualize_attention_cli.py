"""`visualize_attention` CLI: per-step attention overlays + animated GIF.

Capability match for reference visualize_attention.py:33-159 — but the
attention weights come back as a proper decode output (stacked in the scan,
`Img2SeqModel.decode_with_attention`) instead of the reference's global
`ctx_vector` `tf.py_func` side channel (attention_mechanism.py:96-121).
PNG slices per decoded token + one animated GIF over the input image,
written with PIL (no ImageMagick dependency).
"""

from __future__ import annotations

import os

import click
import numpy as np

from ..data.images import greyscale, read_img
from ..models.encoder import feature_grid_shape
from ..utils import Config, init_dir
from .common import compute_dtype_from, make_vocab
from .predict_cli import load_model


def attention_overlays(
    img: np.ndarray,  # (H, W, 1) uint8
    attention: np.ndarray,  # (T, R) fp32, rows sum to 1
    grid_hw: tuple,
    n_steps: int,
) -> list:
    """Blend each step's attention map over the input image (uint8 RGB)."""
    from PIL import Image

    H, W = img.shape[:2]
    hh, ww = grid_hw
    overlays = []
    base = np.repeat(img, 3, axis=2).astype(np.float32)
    for t in range(n_steps):
        att = attention[t].reshape(hh, ww)
        att = att / max(1e-8, att.max())
        att_img = Image.fromarray((att * 255).astype(np.uint8)).resize((W, H), Image.BILINEAR)
        heat = np.asarray(att_img, np.float32)[:, :, None]
        out = base * 0.5 + np.concatenate(
            [heat, np.zeros_like(heat), 255 - heat], axis=2
        ) * 0.5
        overlays.append(np.clip(out, 0, 255).astype(np.uint8))
    return overlays


@click.command()
@click.option("--results", default="results/small/")
@click.option("--image", "image_path", required=True, help="Path to formula PNG")
@click.option("--output", "dir_output", default="results/images/vis/")
def main(results: str, image_path: str, dir_output: str) -> None:
    import jax.numpy as jnp

    from ..utils.jax_setup import setup_jax

    setup_jax()

    from ..data.pipeline import snap_image_shape

    model, params = load_model(results)
    init_dir(dir_output)

    img = greyscale(read_img(image_path))
    H, W = snap_image_shape(img.shape[:2], None)
    batch = np.full((1, H, W, 1), 255, np.uint8)
    batch[0, : img.shape[0], : img.shape[1]] = img

    ids, attention = model.decode_with_attention(params, jnp.asarray(batch))
    ids = np.asarray(ids)[0]
    attention = np.asarray(attention)[0]  # (T, R)

    # tokens up to and including END
    toks = []
    for i in ids:
        toks.append(model.vocab.id_to_tok[int(i)])
        if int(i) == model.id_end:
            break
    n_steps = len(toks)

    grid_hw = feature_grid_shape(model.config, (H, W))
    overlays = attention_overlays(batch[0], attention, grid_hw, n_steps)

    from PIL import Image

    frames = []
    for t, (overlay, tok) in enumerate(zip(overlays, toks)):
        frame = Image.fromarray(overlay)
        frame.save(os.path.join(dir_output, f"att_{t:03d}_{t}.png"))
        frames.append(frame)
    if frames:
        frames[0].save(
            os.path.join(dir_output, "attention.gif"),
            save_all=True,
            append_images=frames[1:],
            duration=400,
            loop=0,
        )
    click.echo(f"decoded: {' '.join(toks)}")
    click.echo(f"wrote {n_steps} attention slices + attention.gif to {dir_output}")


if __name__ == "__main__":
    main()
