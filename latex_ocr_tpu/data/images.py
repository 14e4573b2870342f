"""Host-side image utilities: greyscale, crop-to-ink, bucket padding,
downsampling, batch padding.

These keep the reference's dataset file contract (model/utils/image.py:15-161)
so rendered datasets interchange: images are white-background (255) uint8,
cropped to ink, padded +8px each side, snapped up to the first fitting bucket
from the config bucket table, then LANCZOS-downsampled by 2.

The *on-device* counterpart (uint8 greyscale + normalize, fused into the
encoder program) lives in `latex_ocr_tpu.ops.preprocess` — the host keeps
only what must touch PIL/os (build-time render/crop/bucket work) plus the
uint8 white-pad memcpy into each batch canvas.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


def read_img(path: str) -> np.ndarray:
    """Read an image file to a numpy array (H, W) or (H, W, C) uint8."""
    with Image.open(path) as im:
        return np.asarray(im)


def greyscale(state: np.ndarray) -> np.ndarray:
    """Luma transform (H, W, 3) -> (H, W, 1) uint8.

    Already-grey inputs pass through with a channel axis added. Computed
    in float32 so the result is bit-identical to the fused on-device path
    (ops/preprocess.py) — f64 would round the other way at integer
    boundaries on ~0.02% of pixels.
    """
    if state.ndim == 2:
        return state[:, :, np.newaxis].astype(np.uint8)
    if state.shape[-1] == 1:
        return state.astype(np.uint8)
    x = state.astype(np.float32)
    luma = (
        x[..., 0] * np.float32(0.299)
        + x[..., 1] * np.float32(0.587)
        + x[..., 2] * np.float32(0.114)
    )
    return luma[:, :, np.newaxis].astype(np.uint8)


def downsample(state: np.ndarray) -> np.ndarray:
    """Stride-2 spatial subsample of an (H, W, C) array."""
    return state[::2, ::2, :]


def get_max_shape(arrays: Sequence[np.ndarray]) -> List[int]:
    """Per-axis max over a list of equally-ranked arrays."""
    shapes = [list(a.shape) for a in arrays]
    return [max(dims) for dims in zip(*shapes)]


def pad_batch_images(
    images: Sequence[np.ndarray], max_shape: Optional[Sequence[int]] = None
) -> np.ndarray:
    """Stack variable-size images into one uint8 batch, padding with white."""
    if max_shape is None:
        max_shape = get_max_shape(images)
    batch = np.full([len(images)] + list(max_shape), 255, dtype=np.uint8)
    for i, img in enumerate(images):
        batch[i, : img.shape[0], : img.shape[1]] = img
    return batch


def get_new_size(
    old_size: Tuple[int, int], buckets: Optional[Sequence[Sequence[int]]]
) -> Tuple[int, int]:
    """Snap a (width, height) to the first bucket that fits, else keep it."""
    if buckets is None:
        return old_size
    w, h = old_size
    for w_b, h_b in buckets:
        if w_b >= w and h_b >= h:
            return (w_b, h_b)
    return old_size


def pad_image(
    img_path: str,
    output_path: str,
    pad_size: Sequence[int] = (8, 8, 8, 8),
    buckets: Optional[Sequence[Sequence[int]]] = None,
) -> None:
    """Add a white border then grow the canvas to the first fitting bucket."""
    top, left, bottom, right = pad_size
    with Image.open(img_path) as old_im:
        old_size = (old_im.size[0] + left + right, old_im.size[1] + top + bottom)
        new_size = get_new_size(old_size, buckets)
        new_im = Image.new("RGB", new_size, (255, 255, 255))
        new_im.paste(old_im, (left, top))
        new_im.save(output_path)


def crop_image(img_path: str, output_path: str) -> bool:
    """Crop to the bounding box of non-white pixels; False if image is blank."""
    with Image.open(img_path) as im:
        grey = im.convert("L")
        data = np.asarray(grey, dtype=np.uint8)
        ys, xs = np.where(data != 255)
        if ys.size == 0:
            grey.save(output_path)
            return False
        cropped = grey.crop((xs.min(), ys.min(), xs.max() + 1, ys.max() + 1))
        cropped.save(output_path)
        return True


def downsample_image(img_path: str, output_path: str, ratio: int = 2) -> bool:
    """LANCZOS-downsample an image file by an integer ratio."""
    assert ratio >= 1, ratio
    if ratio == 1:
        return True
    with Image.open(img_path) as im:
        new_size = (im.size[0] // ratio, im.size[1] // ratio)
        im.resize(new_size, Image.LANCZOS).save(output_path)
    return True


def bucket_shape_after_downsample(
    bucket: Sequence[int], down_ratio: int = 2
) -> Tuple[int, int]:
    """Stored-image (H, W) for a (width, height) bucket after the build-time
    downsample, matching PIL's integer division resize."""
    w, h = bucket
    return (h // down_ratio, w // down_ratio)
