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


def test_beam_megakernel_matches_decode_beam_interpret():
    """Beam megakernel == XLA decode_beam in interpret mode: aligned ids,
    scores, and the GNMT length-norm re-ranking path."""
    from latex_ocr_tpu.models.decoding import decode_beam
    from latex_ocr_tpu.ops.decoder_kernel import decode_beam_megakernel

    cfg = Config({"attn_cell_config": {"cell_type": "lstm", "num_units": 16,
                                        "dim_e": 8, "dim_o": 16, "dim_embeddings": 8}})
    dec = init_decoder_params(jax.random.PRNGKey(1), cfg, n_tok=11, n_channels=512)
    feat = jax.random.normal(jax.random.PRNGKey(2), (5, 2, 4, 512), jnp.float32)
    for alpha in (0.0, 0.6):
        ref = decode_beam(dec, feat, 7, 10, beam_size=3, length_norm_alpha=alpha)
        mega = decode_beam_megakernel(
            dec, feat, 7, 10, beam_size=3, length_norm_alpha=alpha,
            block_b=4, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ref.ids), np.asarray(mega.ids))
        np.testing.assert_allclose(
            np.asarray(ref.log_probs), np.asarray(mega.log_probs),
            rtol=1e-5, atol=1e-5,
        )


def test_beam_megakernel_div_penalty_matches_xla():
    """Deterministic diversity penalty (div_prob=1, gamma<1) runs inside
    the kernel and matches the XLA _div_penalty path exactly: ids, scores,
    and the accumulated (penalized) log-probs."""
    from latex_ocr_tpu.models.decoding import decode_beam
    from latex_ocr_tpu.ops.decoder_kernel import decode_beam_megakernel

    cfg = Config({"attn_cell_config": {"cell_type": "lstm", "num_units": 16,
                                        "dim_e": 8, "dim_o": 16, "dim_embeddings": 8}})
    dec = init_decoder_params(jax.random.PRNGKey(1), cfg, n_tok=11, n_channels=512)
    feat = jax.random.normal(jax.random.PRNGKey(3), (5, 2, 4, 512), jnp.float32)
    for gamma in (0.5, 0.9):
        ref = decode_beam(dec, feat, 7, 10, beam_size=3,
                          div_gamma=gamma, div_prob=1.0)
        mega = decode_beam_megakernel(
            dec, feat, 7, 10, beam_size=3, div_gamma=gamma, div_prob=1.0,
            block_b=4, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ref.ids), np.asarray(mega.ids))
        np.testing.assert_allclose(np.asarray(ref.log_probs),
                                   np.asarray(mega.log_probs),
                                   rtol=2e-5, atol=2e-5)

    # the stochastic variant (div_prob < 1) cannot reproduce the XLA
    # random stream in-kernel: the wrapper must fall back to the XLA loop
    ref = decode_beam(dec, feat, 7, 10, beam_size=3,
                      div_gamma=0.5, div_prob=0.5)
    mega = decode_beam_megakernel(
        dec, feat, 7, 10, beam_size=3, div_gamma=0.5, div_prob=0.5,
        block_b=4, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref.ids), np.asarray(mega.ids))


def _gru_cfg():
    return Config({"attn_cell_config": {"cell_type": "gru", "num_units": 16,
                                         "dim_e": 8, "dim_o": 16,
                                         "dim_embeddings": 8}})


def test_megakernel_gru_matches_decode_greedy_interpret():
    """The cell dispatch (ops/decoder_kernel.py:_cell_update) covers GRU:
    greedy megakernel == XLA decode_greedy for cell_type=gru."""
    dec = init_decoder_params(jax.random.PRNGKey(4), _gru_cfg(), n_tok=11,
                              n_channels=512)
    assert "gru" in dec and "lstm" not in dec
    feat = jax.random.normal(jax.random.PRNGKey(5), (5, 2, 4, 512), jnp.float32)
    ref = decode_greedy(dec, feat, 7, 10)
    mega = decode_greedy_megakernel(dec, feat, 7, 10, block_b=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(mega))


def test_beam_megakernel_gru_matches_decode_beam_interpret():
    from latex_ocr_tpu.models.decoding import decode_beam
    from latex_ocr_tpu.ops.decoder_kernel import decode_beam_megakernel

    dec = init_decoder_params(jax.random.PRNGKey(4), _gru_cfg(), n_tok=11,
                              n_channels=512)
    feat = jax.random.normal(jax.random.PRNGKey(6), (3, 2, 4, 512), jnp.float32)
    for alpha in (0.0, 0.6):
        ref = decode_beam(dec, feat, 7, 10, beam_size=3, length_norm_alpha=alpha)
        mega = decode_beam_megakernel(
            dec, feat, 7, 10, beam_size=3, length_norm_alpha=alpha,
            block_b=2, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ref.ids), np.asarray(mega.ids))
        np.testing.assert_allclose(
            np.asarray(ref.log_probs), np.asarray(mega.log_probs),
            rtol=1e-5, atol=1e-5,
        )
