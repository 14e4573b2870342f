"""On-device image preprocessing: fused uint8 -> normalized feature input.

The reference preprocesses on host with PIL/numpy (reference
model/utils/image.py:67-71 greyscale luma; encoder.py:26-27 normalize) and
feeds float batches through feed_dict. Here the *device program* owns both
steps: the encoder consumes raw uint8 batches — greyscale (1- or 3-channel)
— and the luma transform + (x-128)/128 normalize run as XLA ops that fuse
directly into the first conv's input, so the preprocessing costs no extra
HBM round-trip and the host->device transfer stays uint8 (1 or 3 bytes per
pixel instead of 4-byte floats).

Written as plain XLA rather than a Pallas kernel deliberately: both steps
are elementwise, so XLA fuses them into conv1's operand and the op count is
dominated by the conv itself — a hand kernel could only re-create the same
fusion (same reasoning as the train-megakernel refutation, docs/design.md
§11). The one preprocessing stage kept on host is the white-pad memcpy into
the batch canvas (native/batch_assembler.cpp, 0.76 ms for a full 256-image
training batch): padding on device would need one compiled program per raw
request shape — an unbounded compile surface — to save a microsecond-scale
uint8 copy.

What runs where (the full preprocessing inventory, SURVEY.md §2.1):
    host, build-time only : render, crop-to-ink, +8px border, bucket snap,
                            LANCZOS /2 (data/images.py — PIL/file work)
    host, per batch       : uint8 white-pad memcpy into the canvas
    device, per batch     : greyscale luma + normalize (this module), fused
                            into the encoder program
"""

from __future__ import annotations

import jax.numpy as jnp

# ITU-R BT.601 luma weights — identical to the host path (data/images.py
# greyscale, reference model/utils/image.py:67-71)
_LUMA = (0.299, 0.587, 0.114)


def greyscale_normalize(images_u8: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    """Fused on-device greyscale + normalize: uint8 (B, H, W, C) -> (B, H, W, 1).

    C may be 1 (already grey: training batches, rendered datasets) or 3
    (raw RGB, e.g. serving/predict requests) — the 3-channel path computes
    the same luma as the host ``data.images.greyscale`` bit-exactly
    (floor to integer before normalizing, matching numpy's uint8 cast),
    so a model trained on host-greyscaled data serves raw RGB unchanged.

    Output is ``(x - 128) / 128`` in ``compute_dtype`` (reference
    encoder.py:26-27). The subtract/scale happen in fp32 before the cast so
    bf16 sees the centered value, not a rounded 0..255 one.
    """
    if images_u8.ndim != 4:
        raise ValueError(f"expected (B, H, W, C) uint8, got shape {images_u8.shape}")
    c = images_u8.shape[-1]
    x = images_u8.astype(jnp.float32)
    if c == 3:
        luma = x[..., 0] * _LUMA[0] + x[..., 1] * _LUMA[1] + x[..., 2] * _LUMA[2]
        x = jnp.floor(luma)[..., None]  # numpy uint8-cast truncation
    elif c != 1:
        raise ValueError(f"expected 1 or 3 channels, got {c}")
    return ((x - 128.0) / 128.0).astype(compute_dtype)
