"""Full-model decode parity against the independent torch oracle.

Above-cell-level parity (the r3 VERDICT's north-star gap): the COMPLETE
flagship attn-LSTM model — encoder conv stack + positional signal +
attention init state + deep-output step + greedy and beam decode with
finished-masking / flat top-k / parent backtracking / GNMT re-rank — is
run at equal weights through two independent implementations (JAX:
models/{encoder,decoder,decoding}.py; torch: evaluation/oracle.py) and
must produce token-identical output.

Two END regimes are pinned: an id the random-weight model never emits
(the loop runs to the cap — full-length accumulation parity) and the
model's attractor token (END fires immediately — finished-masking,
END-fill and early-exit parity). scripts/parity_oracle.py runs the same
comparison on real trained checkpoints, where ENDs fire at natural
positions; these tests pin the machinery in CI with random weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from latex_ocr_tpu.evaluation.oracle import TorchOracle  # noqa: E402
from latex_ocr_tpu.models.decoder import init_decoder_params  # noqa: E402
from latex_ocr_tpu.models.decoding import decode_beam, decode_greedy  # noqa: E402
from latex_ocr_tpu.models.encoder import encode, init_encoder_params  # noqa: E402
from latex_ocr_tpu.utils import Config  # noqa: E402

N_TOK = 50
MAX_LEN = 12
END_NEVER = 3  # random weights never argmax this id -> full-length decode
END_ATTRACTOR = 44  # the random model's fixed point -> END fires at once

CFG = Config(
    {
        "encoder_cnn": "vanilla",
        "positional_embeddings": True,
        "attn_cell_config": {
            "cell_type": "lstm",
            "num_units": 64,
            "dim_e": 48,
            "dim_o": 64,
            "dim_embeddings": 16,
        },
    }
)


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(7)
    enc_rng, dec_rng = jax.random.split(rng)
    params = {
        "encoder": init_encoder_params(enc_rng, CFG),
        "decoder": init_decoder_params(dec_rng, CFG, N_TOK),
    }
    images = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (3, 32, 104, 1), 0, 256),
        dtype=np.uint8,
    )
    feat_jax = encode(params["encoder"], jnp.asarray(images), CFG, jnp.float32)
    oracles = {e: TorchOracle(params, e) for e in (END_NEVER, END_ATTRACTOR)}
    feat_t = oracles[END_NEVER].encode(images)
    return params, feat_jax, feat_t, oracles


def test_encoder_matches_oracle(setup):
    _, feat_jax, feat_t, _ = setup
    assert feat_t.shape == feat_jax.shape
    np.testing.assert_allclose(np.asarray(feat_jax), feat_t, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("id_end", [END_NEVER, END_ATTRACTOR])
def test_greedy_token_identical(setup, id_end):
    params, feat_jax, feat_t, oracles = setup
    ids_jax = np.asarray(decode_greedy(params["decoder"], feat_jax, MAX_LEN, id_end))
    ids_t = oracles[id_end].decode_greedy(feat_t, MAX_LEN)
    if id_end == END_ATTRACTOR:  # the END-fill + early-exit regime is real
        assert (ids_jax == id_end).all()
    else:  # the full-length regime is real
        assert not (ids_jax == id_end).any()
    np.testing.assert_array_equal(ids_jax, ids_t)


@pytest.mark.parametrize("id_end", [END_NEVER, END_ATTRACTOR])
@pytest.mark.parametrize("beam_size", [2, 4])
def test_beam_token_identical(setup, beam_size, id_end):
    params, feat_jax, feat_t, oracles = setup
    out = decode_beam(params["decoder"], feat_jax, MAX_LEN, id_end, beam_size)
    ids_t, lp_t = oracles[id_end].decode_beam(feat_t, MAX_LEN, beam_size)
    np.testing.assert_array_equal(np.asarray(out.ids), ids_t)
    np.testing.assert_allclose(np.asarray(out.log_probs), lp_t, rtol=1e-4, atol=1e-4)


def test_gru_family_token_identical():
    """Same full-model parity for the attn-GRU family (BASELINE config #1):
    torch.nn.GRUCell drives the oracle's recurrence with directly-copied
    weights."""
    cfg = Config(
        {
            "encoder_cnn": "vanilla",
            "positional_embeddings": True,
            "attn_cell_config": {
                "cell_type": "gru",
                "num_units": 64,
                "dim_e": 48,
                "dim_o": 64,
                "dim_embeddings": 16,
            },
        }
    )
    rng = jax.random.PRNGKey(11)
    enc_rng, dec_rng = jax.random.split(rng)
    params = {
        "encoder": init_encoder_params(enc_rng, cfg),
        "decoder": init_decoder_params(dec_rng, cfg, N_TOK),
    }
    images = np.asarray(
        jax.random.randint(jax.random.PRNGKey(2), (2, 32, 104, 1), 0, 256),
        dtype=np.uint8,
    )
    feat_jax = encode(params["encoder"], jnp.asarray(images), cfg, jnp.float32)
    oracle = TorchOracle(params, END_NEVER)
    feat_t = oracle.encode(images)

    ids_jax = np.asarray(decode_greedy(params["decoder"], feat_jax, MAX_LEN, END_NEVER))
    np.testing.assert_array_equal(ids_jax, oracle.decode_greedy(feat_t, MAX_LEN))
    out = decode_beam(params["decoder"], feat_jax, MAX_LEN, END_NEVER, 2)
    ids_t, lp_t = oracle.decode_beam(feat_t, MAX_LEN, 2)
    np.testing.assert_array_equal(np.asarray(out.ids), ids_t)
    np.testing.assert_allclose(np.asarray(out.log_probs), lp_t, rtol=1e-4, atol=1e-4)


def test_beam_gnmt_rerank_identical(setup):
    params, feat_jax, feat_t, oracles = setup
    out = decode_beam(
        params["decoder"], feat_jax, MAX_LEN, END_NEVER, 4, length_norm_alpha=0.6
    )
    ids_t, lp_t = oracles[END_NEVER].decode_beam(
        feat_t, MAX_LEN, 4, length_norm_alpha=0.6
    )
    np.testing.assert_array_equal(np.asarray(out.ids), ids_t)
    np.testing.assert_allclose(np.asarray(out.log_probs), lp_t, rtol=1e-4, atol=1e-4)


class TestTransformerFamily:
    """Same full-model parity for the r4 flagship (transformer decoder):
    the oracle re-runs a full causal pass over the emitted prefix each
    step — the polar opposite of the JAX KV-cache incremental loop — so
    token-identical output checks both routes end-to-end."""

    N_HEADS = 4
    TF_CFG = Config(
        {
            "encoder_cnn": "vanilla",
            "positional_embeddings": True,
            "decoder_arch": "transformer",
            "transformer_config": {
                "num_layers": 2,
                "num_heads": 4,
                "dim_model": 32,
                "dim_ff": 64,
            },
            "attn_cell_config": {"cell_type": "lstm", "num_units": 16,
                                  "dim_e": 8, "dim_o": 16, "dim_embeddings": 8},
        }
    )

    @pytest.fixture(scope="class")
    def tf_setup(self):
        from latex_ocr_tpu.evaluation.oracle import make_oracle
        from latex_ocr_tpu.models.transformer import (
            init_transformer_decoder_params,
        )

        rng = jax.random.PRNGKey(21)
        enc_rng, dec_rng = jax.random.split(rng)
        params = {
            "encoder": init_encoder_params(enc_rng, self.TF_CFG),
            "decoder": init_transformer_decoder_params(dec_rng, self.TF_CFG, N_TOK),
        }
        images = np.asarray(
            jax.random.randint(jax.random.PRNGKey(4), (3, 32, 104, 1), 0, 256),
            dtype=np.uint8,
        )
        feat_jax = encode(params["encoder"], jnp.asarray(images), self.TF_CFG, jnp.float32)
        oracle = make_oracle(params, END_NEVER, num_heads=self.N_HEADS)
        feat_t = oracle.encode(images)
        np.testing.assert_allclose(np.asarray(feat_jax), feat_t, rtol=1e-4, atol=1e-4)
        return params, feat_jax, feat_t, oracle

    def test_greedy_token_identical(self, tf_setup):
        from latex_ocr_tpu.models.transformer import transformer_decode_greedy

        params, feat_jax, feat_t, oracle = tf_setup
        ids_jax = np.asarray(
            transformer_decode_greedy(
                params["decoder"], feat_jax, MAX_LEN, END_NEVER, num_heads=self.N_HEADS
            )
        )
        assert not (ids_jax == END_NEVER).any()  # the full-length regime is real
        np.testing.assert_array_equal(ids_jax, oracle.decode_greedy(feat_t, MAX_LEN))

    def test_greedy_end_attractor(self, tf_setup):
        """END on the random model's first-step argmax: finished-masking,
        END-fill and early-exit parity."""
        from latex_ocr_tpu.evaluation.oracle import make_oracle
        from latex_ocr_tpu.models.transformer import transformer_decode_greedy

        params, feat_jax, feat_t, _ = tf_setup
        first = np.asarray(
            transformer_decode_greedy(
                params["decoder"], feat_jax, 1, END_NEVER, num_heads=self.N_HEADS
            )
        )[0, 0]
        oracle = make_oracle(params, int(first), num_heads=self.N_HEADS)
        ids_jax = np.asarray(
            transformer_decode_greedy(
                params["decoder"], feat_jax, MAX_LEN, int(first), num_heads=self.N_HEADS
            )
        )
        assert (ids_jax[0] == int(first)).all()
        np.testing.assert_array_equal(ids_jax, oracle.decode_greedy(feat_t, MAX_LEN))

    @pytest.mark.parametrize("beam_size,alpha", [(2, 0.0), (4, 0.6)])
    def test_beam_token_identical(self, tf_setup, beam_size, alpha):
        from latex_ocr_tpu.models.transformer import transformer_decode_beam

        params, feat_jax, feat_t, oracle = tf_setup
        out = transformer_decode_beam(
            params["decoder"], feat_jax, MAX_LEN, END_NEVER, beam_size,
            length_norm_alpha=alpha, num_heads=self.N_HEADS,
        )
        ids_t, lp_t = oracle.decode_beam(feat_t, MAX_LEN, beam_size, length_norm_alpha=alpha)
        np.testing.assert_array_equal(np.asarray(out.ids), ids_t)
        np.testing.assert_allclose(np.asarray(out.log_probs), lp_t, rtol=1e-4, atol=1e-4)
