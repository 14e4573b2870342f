"""Encoder feature-map introspection: dump per-stage activation images.

Capability match for the reference's per-conv-layer TensorBoard image
summaries (reference model/encoder.py:70-78, one channel per layer):
re-runs the encoder capturing each stage's activations and writes the
first channel of every stage as a normalized PNG.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np


def encoder_stage_outputs(params: Dict, image_u8, config) -> List[Tuple[str, np.ndarray]]:
    """Run the encoder stage by stage; returns [(stage_name, (H, W) map)].

    Captures the first channel of each intermediate, mirroring the
    reference's one-channel image summaries.
    """
    import jax
    import jax.numpy as jnp

    from ..models.encoder import _conv2d, _max_pool

    variant = getattr(config, "encoder_cnn", "vanilla")
    x = (jnp.asarray(image_u8).astype(jnp.float32) - 128.0) / 128.0
    outs: List[Tuple[str, np.ndarray]] = []

    def cap(name, t):
        outs.append((name, np.asarray(t[0, :, :, 0], np.float32)))

    if variant in ("vanilla", "cnn"):
        x = jax.nn.relu(_conv2d(x, params["conv1"]["w"], params["conv1"]["b"]))
        cap("conv1", x)
        x = _max_pool(x, (2, 2), (2, 2))
        x = jax.nn.relu(_conv2d(x, params["conv2"]["w"], params["conv2"]["b"]))
        cap("conv2", x)
        x = _max_pool(x, (2, 2), (2, 2))
        x = jax.nn.relu(_conv2d(x, params["conv3"]["w"], params["conv3"]["b"]))
        cap("conv3", x)
        x = jax.nn.relu(_conv2d(x, params["conv4"]["w"], params["conv4"]["b"]))
        cap("conv4", x)
        if variant == "vanilla":
            x = _max_pool(x, (2, 1), (2, 1))
        x = jax.nn.relu(_conv2d(x, params["conv5"]["w"], params["conv5"]["b"]))
        cap("conv5", x)
        if variant == "vanilla":
            x = _max_pool(x, (1, 2), (1, 2))
        else:
            x = _conv2d(x, params["conv_stride"]["w"], params["conv_stride"]["b"], stride=(2, 2))
        x = jax.nn.relu(_conv2d(x, params["conv6"]["w"], params["conv6"]["b"], padding="VALID"))
        cap("conv6", x)
    else:
        # resnet/densenet: capture the full encoder output only
        from ..models.encoder import encode

        feat = encode(params, jnp.asarray(image_u8), config)
        outs.append(("encoder_out", np.asarray(feat[0, :, :, 0], np.float32)))
    return outs


def dump_feature_maps(params: Dict, image_u8, config, out_dir: str) -> List[str]:
    """Write each stage's first-channel activation as a normalized PNG."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, fmap in encoder_stage_outputs(params, image_u8, config):
        lo, hi = float(fmap.min()), float(fmap.max())
        norm = (fmap - lo) / max(1e-8, hi - lo)
        img = Image.fromarray((norm * 255).astype(np.uint8))
        path = os.path.join(out_dir, f"{name}.png")
        img.save(path)
        paths.append(path)
    return paths
