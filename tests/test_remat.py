"""Remat path: gradients identical with and without checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np

from latex_ocr_tpu.models.decoder import (
    init_decoder_params,
    masked_ce_loss,
    teacher_forcing_logits,
)
from latex_ocr_tpu.utils import Config

CFG = Config({
    "attn_cell_config": {"cell_type": "lstm", "num_units": 16, "dim_e": 8,
                          "dim_o": 16, "dim_embeddings": 8},
})


def test_remat_grads_match():
    dec = init_decoder_params(jax.random.PRNGKey(0), CFG, n_tok=9, n_channels=512)
    feat = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 3, 512))
    formula = jnp.array([[1, 2, 8, 0], [3, 8, 0, 0]], jnp.int32)
    lengths = jnp.array([3, 2], jnp.int32)

    def loss(p, remat):
        logits = teacher_forcing_logits(p, feat, formula, remat=remat)
        return masked_ce_loss(logits, formula, lengths)[0]

    g_plain = jax.grad(lambda p: loss(p, False))(dec)
    g_remat = jax.grad(lambda p: loss(p, True))(dec)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain), jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
