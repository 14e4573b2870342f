"""Raw image cache: decode the dataset once, then mmap for fast epochs.

PNG decoding via PIL costs milliseconds per image; at production batch
rates the host becomes the bottleneck long before the TPU does. The cache
stores every decoded greyscale image contiguously in one ``images.bin``
blob plus an ``index.npz`` of (offset, height, width); epochs after the
first mmap the blob (zero decode, zero copy until batch assembly) and
batches are assembled by the native multithreaded batcher
(native/batch_assembler.cpp).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np

from .images import greyscale, read_img
from .native_batcher import assemble_batch


class RawImageCache:
    def __init__(self, blob: np.ndarray, offsets: np.ndarray, heights: np.ndarray, widths: np.ndarray):
        self.blob = blob
        self.offsets = offsets
        self.heights = heights
        self.widths = widths

    @classmethod
    def build(cls, image_paths: Sequence[str], cache_dir: str) -> "RawImageCache":
        """Decode ``image_paths`` (ordered) into a cache under ``cache_dir``.

        Reuses an existing cache if it matches the image count.
        """
        os.makedirs(cache_dir, exist_ok=True)
        bin_path = os.path.join(cache_dir, "images.bin")
        idx_path = os.path.join(cache_dir, "index.npz")
        if os.path.exists(bin_path) and os.path.exists(idx_path):
            idx = np.load(idx_path)
            if len(idx["offsets"]) == len(image_paths):
                return cls.load(cache_dir)

        offsets: List[int] = []
        heights: List[int] = []
        widths: List[int] = []
        pos = 0
        with open(bin_path, "wb") as f:
            for path in image_paths:
                img = greyscale(read_img(path))[:, :, 0]
                offsets.append(pos)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                data = np.ascontiguousarray(img).tobytes()
                f.write(data)
                pos += len(data)
        np.savez(
            idx_path,
            offsets=np.asarray(offsets, np.int64),
            heights=np.asarray(heights, np.int32),
            widths=np.asarray(widths, np.int32),
        )
        return cls.load(cache_dir)

    @classmethod
    def load(cls, cache_dir: str) -> "RawImageCache":
        idx = np.load(os.path.join(cache_dir, "index.npz"))
        blob = np.memmap(os.path.join(cache_dir, "images.bin"), dtype=np.uint8, mode="r")
        return cls(blob, idx["offsets"], idx["heights"], idx["widths"])

    def __len__(self) -> int:
        return len(self.offsets)

    def image(self, i: int) -> np.ndarray:
        h, w = int(self.heights[i]), int(self.widths[i])
        start = int(self.offsets[i])
        return np.asarray(self.blob[start : start + h * w]).reshape(h, w)

    def shape(self, i: int) -> Tuple[int, int]:
        return (int(self.heights[i]), int(self.widths[i]))

    def batch(
        self,
        indices: Sequence[int],
        batch_capacity: int,
        out_h: int,
        out_w: int,
        n_threads: int = 4,
    ) -> np.ndarray:
        """Assemble a white-padded uint8 batch natively."""
        return assemble_batch(
            np.asarray(self.blob),
            self.offsets,
            self.heights,
            self.widths,
            np.asarray(indices, np.int32),
            batch_capacity,
            out_h,
            out_w,
            n_threads=n_threads,
        )
