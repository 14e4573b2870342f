"""2-D sinusoidal positional signal for image feature grids.

Same math as the tensor2tensor ``add_timing_signal_nd`` the reference uses
(reference model/components/positional.py:10-65): channels are split across
the spatial dims; each gets sin/cos at geometric timescales spanning
[min_timescale, max_timescale]. Computed once per feature-grid shape at
trace time — XLA constant-folds it into the encoder program.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def add_timing_signal_nd(
    x: jnp.ndarray, min_timescale: float = 1.0, max_timescale: float = 1.0e4
) -> jnp.ndarray:
    """Add an n-d positional signal to ``x`` of shape [B, d1, ..., dn, C]."""
    num_dims = x.ndim - 2
    channels = x.shape[-1]
    num_timescales = channels // (num_dims * 2)
    log_increment = math.log(max_timescale / min_timescale) / max(1, num_timescales - 1)
    inv_timescales = min_timescale * jnp.exp(
        jnp.arange(num_timescales, dtype=jnp.float32) * -log_increment
    )

    out = x
    for dim in range(num_dims):
        length = x.shape[dim + 1]
        position = jnp.arange(length, dtype=jnp.float32)
        scaled_time = position[:, None] * inv_timescales[None, :]
        signal = jnp.concatenate([jnp.sin(scaled_time), jnp.cos(scaled_time)], axis=1)
        prepad = dim * 2 * num_timescales
        postpad = channels - (dim + 1) * 2 * num_timescales
        signal = jnp.pad(signal, [(0, 0), (prepad, postpad)])
        # reshape to broadcast over batch and the other spatial dims
        shape = [1] * (x.ndim - 1) + [channels]
        shape[dim + 1] = length
        out = out + signal.reshape(shape).astype(x.dtype)
    return out
