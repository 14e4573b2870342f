"""Training megakernel (ops/train_kernel.py) parity vs the XLA scan.

Interpret mode on the CPU mesh: forward logits and the full gradient tree
must match models/decoder.py teacher_forcing_logits to float32 tolerance
(the kernel backward is hand-derived, so this is the correctness gate).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latex_ocr_tpu.models.decoder import init_decoder_params, teacher_forcing_logits
from latex_ocr_tpu.ops.train_kernel import teacher_forcing_fused, train_block_b
from latex_ocr_tpu.utils import Config


@pytest.fixture(scope="module")
def setup():
    cfg = Config({
        "attn_cell_config": {"cell_type": "lstm", "num_units": 32, "dim_e": 16,
                              "dim_o": 32, "dim_embeddings": 8},
    })
    V = 20
    dec = init_decoder_params(jax.random.PRNGKey(0), cfg, V, 24)
    B, R, C, T = 16, 12, 24, 9
    feat = jax.random.normal(jax.random.PRNGKey(1), (B, R, C), jnp.float32)
    formula = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, V)
    return dec, feat, formula, V


def _loss(logits, formula, V):
    return jnp.sum(jax.nn.log_softmax(logits) * jax.nn.one_hot(formula, V)) / 16


def test_forward_matches_xla_scan(setup):
    dec, feat, formula, V = setup
    ref = teacher_forcing_logits(dec, feat, formula, remat=False)
    got = teacher_forcing_fused(dec, feat, formula, block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gradients_match_xla_scan(setup):
    """Every parameter grad (incl. through att_img / initial state /
    embedding gather, which stay in XLA) matches the autodiff scan."""
    dec, feat, formula, V = setup

    g_ref = jax.grad(
        lambda dp: _loss(teacher_forcing_logits(dp, feat, formula, remat=False), formula, V)
    )(dec)
    g_mega = jax.grad(
        lambda dp: _loss(
            teacher_forcing_fused(dp, feat, formula, block_b=8, interpret=True), formula, V
        )
    )(dec)

    leaves_r = jax.tree_util.tree_leaves_with_path(g_ref)
    leaves_m = jax.tree_util.tree_leaves_with_path(g_mega)
    assert len(leaves_r) == len(leaves_m)
    for (k, a), (_, b) in zip(
        sorted(leaves_r, key=lambda kv: str(kv[0])),
        sorted(leaves_m, key=lambda kv: str(kv[0])),
    ):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.max(np.abs(a)) + 1e-8
        np.testing.assert_allclose(
            b / denom, a / denom, rtol=0, atol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
        )


def test_feature_grad_flows_to_encoder(setup):
    """d(loss)/d(feat) must flow through the kernel boundary (the encoder
    trains through d_att_img + d_regions + the initial-state path)."""
    dec, feat, formula, V = setup

    g_ref = jax.grad(
        lambda f: _loss(teacher_forcing_logits(dec, f, formula, remat=False), formula, V)
    )(feat)
    g_mega = jax.grad(
        lambda f: _loss(
            teacher_forcing_fused(dec, f, formula, block_b=8, interpret=True), formula, V
        )
    )(feat)
    denom = np.max(np.abs(np.asarray(g_ref))) + 1e-8
    np.testing.assert_allclose(
        np.asarray(g_mega) / denom, np.asarray(g_ref) / denom, rtol=0, atol=5e-4
    )


def test_batch_padding(setup):
    """B not divisible by block_b pads internally and slices back."""
    dec, feat, formula, V = setup
    ref = teacher_forcing_logits(dec, feat[:13], formula[:13], remat=False)
    got = teacher_forcing_fused(dec, feat[:13], formula[:13], block_b=8, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_block_budget_fallback():
    """Huge-bucket shapes must report 0 (caller falls back to XLA)."""
    assert train_block_b(92, 256, 512, 2) >= 32  # bench shape fits
    assert train_block_b(40000, 256, 512, 4) == 0  # absurd R does not
