"""On-device preprocessing (ops/preprocess.py): parity with the host path
and the encoder/serving integration of the raw-RGB route."""

import jax
import jax.numpy as jnp
import numpy as np

from latex_ocr_tpu.data.images import greyscale
from latex_ocr_tpu.models.encoder import encode, init_encoder_params
from latex_ocr_tpu.ops.preprocess import greyscale_normalize
from latex_ocr_tpu.utils import Config


def _rgb_batch(B=2, H=48, W=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(B, H, W, 3)).astype(np.uint8)


def test_greyscale_normalize_matches_host_bit_exact():
    """Device luma+normalize on RGB == host greyscale (uint8 cast) then
    (x-128)/128 — the serving request path must be indistinguishable from
    the training data path."""
    imgs = _rgb_batch()
    dev = np.asarray(greyscale_normalize(jnp.asarray(imgs), jnp.float32))
    host = np.stack([greyscale(im) for im in imgs]).astype(np.float32)
    host = (host - 128.0) / 128.0
    np.testing.assert_array_equal(dev, host)


def test_greyscale_normalize_grey_passthrough():
    imgs = _rgb_batch()[..., :1]
    dev = np.asarray(greyscale_normalize(jnp.asarray(imgs), jnp.float32))
    np.testing.assert_array_equal(dev, (imgs.astype(np.float32) - 128.0) / 128.0)


def test_encoder_rgb_equals_host_greyscaled():
    """encode() on raw RGB == encode() on the host-greyscaled image."""
    config = Config({"encoder_cnn": "vanilla", "positional_embeddings": True})
    params = init_encoder_params(jax.random.PRNGKey(0), config)
    imgs = _rgb_batch(B=2, H=48, W=64)
    grey = np.stack([greyscale(im) for im in imgs])

    feat_rgb = np.asarray(encode(params, jnp.asarray(imgs), config))
    feat_grey = np.asarray(encode(params, jnp.asarray(grey), config))
    np.testing.assert_array_equal(feat_rgb, feat_grey)


def test_serving_raw_rgb_request():
    """A raw RGB submit decodes identically to the greyscaled submit —
    no host pixel math in the request path."""
    from latex_ocr_tpu.serving import LatexOCRServer

    from latex_ocr_tpu.models.img2seq import Img2SeqModel

    config = Config({
        "encoder_cnn": "vanilla", "positional_embeddings": True,
        "attn_cell_config": {"cell_type": "lstm", "num_units": 16, "dim_e": 8,
                              "dim_o": 16, "dim_embeddings": 8},
        "decoding": "greedy", "beam_size": 1, "div_gamma": 1, "div_prob": 0,
        "max_length_formula": 8,
    })

    class _V:
        tok_to_id = {"a": 0, "_UNK": 1, "_PAD": 2, "_END": 3}
        id_to_tok = {v: k for k, v in tok_to_id.items()}
        n_tok, id_unk, id_pad, id_end = 4, 1, 2, 3

    model = Img2SeqModel(config, _V())
    params = model.init_params(jax.random.PRNGKey(0))
    server = LatexOCRServer(model, params, buckets=[[240, 100]],
                            max_batch=2, max_wait_ms=1.0)
    try:
        rgb = _rgb_batch(B=1, H=40, W=100, seed=3)[0]
        grey = greyscale(rgb)
        out_rgb = server.submit(rgb).result(timeout=120)
        out_grey = server.submit(grey).result(timeout=120)
        assert out_rgb == out_grey
    finally:
        server.close()
