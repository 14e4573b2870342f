"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latex_ocr_tpu.ops.attention import (
    fused_attention_context,
    reference_attention_context,
)


@pytest.mark.parametrize("beams", [1, 3])
@pytest.mark.parametrize("R", [7, 130, 512])
def test_fused_attention_matches_reference(beams, R):
    B, E, C = 2, 16, 32
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    att_img = jax.random.normal(k1, (B, R, E), jnp.float32)
    regions = jax.random.normal(k2, (B, R, C), jnp.float32)
    att_h = jax.random.normal(k3, (B * beams, E), jnp.float32)
    beta = jax.random.normal(k4, (E,), jnp.float32)

    got = fused_attention_context(
        att_img, regions, att_h, beta, beams=beams, block_r=128, interpret=True
    )
    want = reference_attention_context(att_img, regions, att_h, beta, beams=beams)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_attention_extreme_scores_stable():
    """Online softmax must survive large score magnitudes."""
    B, R, E, C = 1, 64, 8, 16
    att_img = jnp.full((B, R, E), 3.0)
    att_img = att_img.at[0, 5].set(-3.0)
    regions = jnp.ones((B, R, C))
    att_h = jnp.full((1, E), 2.0)
    beta = jnp.full((E,), 50.0)  # scores ~ +-400

    got = fused_attention_context(
        att_img, regions, att_h, beta, beams=1, block_r=128, interpret=True
    )
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), 1.0, rtol=1e-4)
