"""Megakernel prototype: interpret-mode parity with decode_greedy."""

import jax
import jax.numpy as jnp
import numpy as np

from latex_ocr_tpu.models.decoder import init_decoder_params
from latex_ocr_tpu.models.decoding import decode_greedy
from latex_ocr_tpu.ops.decoder_kernel import decode_greedy_megakernel
from latex_ocr_tpu.utils import Config


def test_megakernel_matches_decode_greedy_interpret():
    cfg = Config({"attn_cell_config": {"cell_type": "lstm", "num_units": 16,
                                        "dim_e": 8, "dim_o": 16, "dim_embeddings": 8}})
    dec = init_decoder_params(jax.random.PRNGKey(1), cfg, n_tok=11, n_channels=512)
    feat = jax.random.normal(jax.random.PRNGKey(2), (5, 2, 4, 512), jnp.float32)
    ref = decode_greedy(dec, feat, 7, 10)
    mega = decode_greedy_megakernel(dec, feat, 7, 10, block_b=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(mega))
