"""CNN image encoder: uint8 formula image -> (B, H', W', 512) feature grid.

Architecture matches the reference encoder's capability surface
(reference model/encoder.py:26-67, both "vanilla" and "cnn" variants):

    norm (x-128)/128
    conv3x3(64)  relu  -> maxpool 2x2
    conv3x3(128) relu  -> maxpool 2x2
    conv3x3(256) relu
    conv3x3(256) relu  -> [vanilla] maxpool (2,1)
    conv3x3(512) relu  -> [vanilla] maxpool (1,2)
                          [cnn]     conv (2,4)/2 linear
    conv3x3(512) VALID relu
    [+ 2-D sinusoidal positional signal]

TPU-first details: NHWC layout with HWIO kernels (XLA's native conv
layout on TPU), optional bfloat16 compute with fp32 parameters, and all
shapes static per image bucket so each bucket compiles exactly one
program that XLA tiles onto the MXU.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _glorot_uniform(rng, shape):
    """TF1 conv2d/dense default initializer."""
    if len(shape) == 4:  # HWIO
        fan_in = shape[0] * shape[1] * shape[2]
        fan_out = shape[0] * shape[1] * shape[3]
    else:
        fan_in, fan_out = shape[0], shape[-1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, jnp.float32, -limit, limit)


# (name, kernel_hw, in_ch, out_ch)
_CONV_STACK = (
    ("conv1", (3, 3), 1, 64),
    ("conv2", (3, 3), 64, 128),
    ("conv3", (3, 3), 128, 256),
    ("conv4", (3, 3), 256, 256),
    ("conv5", (3, 3), 256, 512),
    ("conv6", (3, 3), 512, 512),
)


def init_encoder_params(rng, config) -> Dict[str, Dict[str, jnp.ndarray]]:
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    keys = jax.random.split(rng, len(_CONV_STACK) + 1)
    for key, (name, k_hw, c_in, c_out) in zip(keys, _CONV_STACK):
        params[name] = {
            "w": _glorot_uniform(key, (*k_hw, c_in, c_out)),
            "b": jnp.zeros((c_out,), jnp.float32),
        }
    if getattr(config, "encoder_cnn", "vanilla") == "cnn":
        params["conv_stride"] = {
            "w": _glorot_uniform(keys[-1], (2, 4, 512, 512)),
            "b": jnp.zeros((512,), jnp.float32),
        }
    return params


def _conv2d(x, w, b, *, stride=(1, 1), padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(y.dtype)


def _max_pool(x, window: Tuple[int, int], stride: Tuple[int, int]):
    # -inf init is required for XLA to lower this to the differentiable
    # reduce-window-max (finfo.min falls back to a non-autodiff reduction)
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding="SAME",
    )


def encode(
    params: Dict,
    images_u8: jnp.ndarray,
    config,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Encode a uint8 image batch (B, H, W, 1) into a feature grid.

    Returns (B, H', W', 512) in ``compute_dtype``; for "vanilla",
    H' = H/8 - 2 and W' = W/8 - 2.
    """
    from .positional import add_timing_signal_nd

    variant = getattr(config, "encoder_cnn", "vanilla")
    x = (images_u8.astype(jnp.float32) - 128.0) / 128.0
    x = x.astype(compute_dtype)

    x = jax.nn.relu(_conv2d(x, params["conv1"]["w"], params["conv1"]["b"]))
    x = _max_pool(x, (2, 2), (2, 2))
    x = jax.nn.relu(_conv2d(x, params["conv2"]["w"], params["conv2"]["b"]))
    x = _max_pool(x, (2, 2), (2, 2))
    x = jax.nn.relu(_conv2d(x, params["conv3"]["w"], params["conv3"]["b"]))
    x = jax.nn.relu(_conv2d(x, params["conv4"]["w"], params["conv4"]["b"]))
    if variant == "vanilla":
        x = _max_pool(x, (2, 1), (2, 1))
    x = jax.nn.relu(_conv2d(x, params["conv5"]["w"], params["conv5"]["b"]))
    if variant == "vanilla":
        x = _max_pool(x, (1, 2), (1, 2))
    elif variant == "cnn":
        # strided linear conv replaces the two asymmetric pools
        x = _conv2d(x, params["conv_stride"]["w"], params["conv_stride"]["b"], stride=(2, 2))
    x = jax.nn.relu(_conv2d(x, params["conv6"]["w"], params["conv6"]["b"], padding="VALID"))

    if getattr(config, "positional_embeddings", True):
        x = add_timing_signal_nd(x)
    return x


def feature_grid_shape(config, image_hw: Tuple[int, int]) -> Tuple[int, int]:
    """Static (H', W') of the encoder output for an input (H, W).

    Mirrors the reference's getWH CNN-shape mimic
    (visualize_attention.py:22-30): three /2 reductions then -2 from the
    VALID conv.
    """
    h, w = image_hw
    variant = getattr(config, "encoder_cnn", "vanilla")

    def ceil_div(a, b):
        return -(-a // b)

    if variant == "vanilla":
        hh = ceil_div(ceil_div(ceil_div(h, 2), 2), 2) - 2
        ww = ceil_div(ceil_div(ceil_div(w, 2), 2), 2) - 2
    else:
        hh = ceil_div(ceil_div(ceil_div(h, 2), 2), 2) - 2
        ww = ceil_div(ceil_div(ceil_div(w, 2), 2), 2) - 2
    return (max(1, hh), max(1, ww))
