"""Diversity-penalty beam search (Li et al. 2016) unit behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from latex_ocr_tpu.models.decoding import _div_penalty


def test_div_penalty_ranks_and_gamma_one_noop():
    logp = jnp.log(jnp.array([[[0.5, 0.3, 0.2]]]))  # (B=1, K=1, V=3)
    # gamma=1 -> log(1)=0 penalty even when always applied
    out = _div_penalty(logp, 1.0, 1.0, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(logp), rtol=1e-6)

    # gamma<1, always applied: penalty = log(gamma) * rank (rank 0 = best)
    gamma = 0.5
    out = _div_penalty(logp, gamma, 1.0, jax.random.PRNGKey(0))
    expected = np.asarray(logp) + np.log(gamma) * np.array([[[0.0, 1.0, 2.0]]])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_div_penalty_can_reorder_topk():
    # two candidates nearly tied: penalty on rank must demote the 2nd-best
    # enough to let a candidate from another beam through a flat top-k
    logp = jnp.array([[[np.log(0.5), np.log(0.49), np.log(0.01)]]])
    out = _div_penalty(logp, 0.1, 1.0, jax.random.PRNGKey(0))
    # rank penalties: 0, log(.1), 2log(.1)
    assert float(out[0, 0, 1]) < float(out[0, 0, 0]) + np.log(0.1) + 1e-6
