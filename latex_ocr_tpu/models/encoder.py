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

# residual family: stem + 4 stages of 2 residual blocks, widths chosen to end
# at 512 channels with the same /8 - 2 spatial contract as "vanilla"
_RESNET_WIDTHS = (64, 128, 256, 512)


def _conv_param(rng, k_hw, c_in, c_out):
    return {
        "w": _glorot_uniform(rng, (*k_hw, c_in, c_out)),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def init_encoder_params(rng, config) -> Dict[str, Dict[str, jnp.ndarray]]:
    variant = getattr(config, "encoder_cnn", "vanilla")
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    if variant in ("vanilla", "cnn"):
        keys = jax.random.split(rng, len(_CONV_STACK) + 1)
        for key, (name, k_hw, c_in, c_out) in zip(keys, _CONV_STACK):
            params[name] = _conv_param(key, k_hw, c_in, c_out)
        if variant == "cnn":
            params["conv_stride"] = _conv_param(keys[-1], (2, 4), 512, 512)
        return params
    if variant == "resnet":
        ks = iter(jax.random.split(rng, 64))
        params["stem"] = _conv_param(next(ks), (3, 3), 1, _RESNET_WIDTHS[0])
        c_in = _RESNET_WIDTHS[0]
        for si, width in enumerate(_RESNET_WIDTHS):
            for bi in range(2):
                conv2 = _conv_param(next(ks), (3, 3), width, width)
                # damp the residual branch's last conv: blocks start near
                # identity, keeping activation scale bounded without
                # normalization layers, while a nonzero kernel keeps the
                # gradient path to conv1 open (a strict zero init blocks it)
                conv2["w"] = conv2["w"] * 0.1
                blk = {
                    "conv1": _conv_param(next(ks), (3, 3), c_in if bi == 0 else width, width),
                    "conv2": conv2,
                }
                if bi == 0 and c_in != width:
                    blk["proj"] = _conv_param(next(ks), (1, 1), c_in, width)
                params[f"stage{si}_block{bi}"] = blk
            c_in = width
        params["head"] = _conv_param(next(ks), (3, 3), 512, 512)
        return params
    if variant == "densenet":
        ks = iter(jax.random.split(rng, 64))
        growth = 64
        params["stem"] = _conv_param(next(ks), (3, 3), 1, growth)
        c = growth
        for si in range(3):  # 3 dense stages, 3 layers each, then transition
            for li in range(3):
                p = _conv_param(next(ks), (3, 3), c, growth)
                # damp each dense layer so the concatenated feature scale
                # stays bounded through the stage (no norm layers)
                p["w"] = p["w"] * 0.3
                params[f"dense{si}_layer{li}"] = p
                c += growth
            out_c = min(512, c // 2) if si < 2 else 512
            params[f"transition{si}"] = _conv_param(next(ks), (1, 1), c, out_c)
            c = out_c
        params["head"] = _conv_param(next(ks), (3, 3), 512, 512)
        return params
    raise NotImplementedError(f"Unknown encoder_cnn variant {variant!r}")


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
    # reduce-window-max (finfo.min falls back to a non-autodiff reduction).
    # Measured (round 2, interleaved A/B at the bench shape): this
    # SelectAndScatter-gradient formulation BEATS both a 6-D reshape +
    # axis-max (encoder fwd+bwd 20.9 -> 26.7 ms; the reshape breaks the
    # conv layouts) and strided-slice maximums (49.7 ms) — keep it.
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
    """Encode a uint8 image batch (B, H, W, 1|3) into a feature grid.

    Preprocessing is on-device and fused into this program: 3-channel
    inputs are luma-greyscaled and every input is normalized by
    ``(x - 128) / 128`` (ops/preprocess.py) as part of conv1's operand —
    no host float math, uint8 over the wire.

    Returns (B, H', W', 512) in ``compute_dtype`` with H' = H/8 - 2 and
    W' = W/8 - 2 across all variants (same spatial contract, so the
    attention-region geometry and the visualization reshape are shared).

    Variants (capability surface of reference encoder.py:32-60 plus the
    torch model zoo ResNet/DenseNet families, SURVEY.md §2.1):
        vanilla  — conv/maxpool stack with asymmetric (2,1)/(1,2) pools
        cnn      — strided linear conv replaces the asymmetric pools
        resnet   — residual basic blocks, 4 stages
        densenet — dense blocks with 1x1 transitions
    """
    from ..ops.preprocess import greyscale_normalize
    from .positional import add_timing_signal_nd

    variant = getattr(config, "encoder_cnn", "vanilla")
    x = greyscale_normalize(images_u8, compute_dtype)

    if variant in ("vanilla", "cnn"):
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
        else:
            # strided linear conv replaces the two asymmetric pools
            x = _conv2d(x, params["conv_stride"]["w"], params["conv_stride"]["b"], stride=(2, 2))
        x = jax.nn.relu(_conv2d(x, params["conv6"]["w"], params["conv6"]["b"], padding="VALID"))
    elif variant == "resnet":
        x = jax.nn.relu(_conv2d(x, params["stem"]["w"], params["stem"]["b"]))
        x = _max_pool(x, (2, 2), (2, 2))
        for si in range(len(_RESNET_WIDTHS)):
            for bi in range(2):
                blk = params[f"stage{si}_block{bi}"]
                y = jax.nn.relu(_conv2d(x, blk["conv1"]["w"], blk["conv1"]["b"]))
                y = _conv2d(y, blk["conv2"]["w"], blk["conv2"]["b"])
                sc = x
                if "proj" in blk:
                    sc = _conv2d(x, blk["proj"]["w"], blk["proj"]["b"])
                x = jax.nn.relu(y + sc)
            if si in (1, 2):  # two more /2 reductions -> total /8
                x = _max_pool(x, (2, 2), (2, 2))
        x = jax.nn.relu(_conv2d(x, params["head"]["w"], params["head"]["b"], padding="VALID"))
    elif variant == "densenet":
        x = jax.nn.relu(_conv2d(x, params["stem"]["w"], params["stem"]["b"]))
        x = _max_pool(x, (2, 2), (2, 2))
        for si in range(3):
            feats = [x]
            for li in range(3):
                inp = jnp.concatenate(feats, axis=-1)
                p = params[f"dense{si}_layer{li}"]
                feats.append(jax.nn.relu(_conv2d(inp, p["w"], p["b"])))
            x = jnp.concatenate(feats, axis=-1)
            t = params[f"transition{si}"]
            x = jax.nn.relu(_conv2d(x, t["w"], t["b"]))
            if si < 2:
                x = _max_pool(x, (2, 2), (2, 2))
        x = jax.nn.relu(_conv2d(x, params["head"]["w"], params["head"]["b"], padding="VALID"))
    else:
        raise NotImplementedError(variant)

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

    def ceil_div(a, b):
        return -(-a // b)

    # both encoder variants reduce /2/2/2 then lose 2 to the VALID conv
    hh = ceil_div(ceil_div(ceil_div(h, 2), 2), 2) - 2
    ww = ceil_div(ceil_div(ceil_div(w, 2), 2), 2) - 2
    return (max(1, hh), max(1, ww))
