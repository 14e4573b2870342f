"""Image metrics: render-and-compare exact match + column Levenshtein.

Same definitions as the reference (model/evaluation/image.py:9-99,
originally from Harvard NLP's im2markup eval): each image is transposed,
binarized at <=128, every pixel column becomes one integer "character",
and the two column-sequences are compared with Levenshtein. Missing
hypothesis images count as a full-width miss.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

from ..data.images import read_img
from ..utils.general import get_files
from .text import levenshtein


def img_edit_distance(img1: np.ndarray, img2: np.ndarray) -> Tuple[int, float]:
    """Column-wise Levenshtein between two (H, W, 1) uint8 images.

    Returns (distance, max sequence length).
    """
    a = np.transpose(img1[:, :, 0])  # (W, H)
    b = np.transpose(img2[:, :, 0])
    a_bits = (a <= 128).astype(np.uint8)
    b_bits = (b <= 128).astype(np.uint8)

    # encode each pixel column as one int; pad the shorter height with 0s
    h = max(a_bits.shape[1], b_bits.shape[1])

    def encode(cols: np.ndarray) -> list:
        pad = h - cols.shape[1]
        if pad:
            cols = np.pad(cols, ((0, 0), (0, pad)))
        # big-endian bit packing of each column into a python int
        return [int("".join(map(str, col)), 2) for col in cols]

    seq1, seq2 = encode(a_bits), encode(b_bits)
    return levenshtein(seq1, seq2), float(max(len(seq1), len(seq2)))


def score_dirs(
    dir_ref: str, dir_hyp: str, prepro_img: Callable[[np.ndarray], np.ndarray]
) -> Dict[str, float]:
    """Pair rendered ref/hyp PNGs by filename; image EM + Levenshtein ratio."""
    img_refs = [f for f in get_files(dir_ref) if f.endswith(".png")]
    hyp_names = {f for f in get_files(dir_hyp) if f.endswith(".png")}

    em_total = 0
    dist_total = 0.0
    length_total = 0.0
    n = 0
    import os

    for name in img_refs:
        ref = prepro_img(read_img(os.path.join(dir_ref, name)))
        if name in hyp_names:
            hyp = prepro_img(read_img(os.path.join(dir_hyp, name)))
            dist, length = img_edit_distance(ref, hyp)
        else:
            dist = length = float(ref.shape[1])
        dist_total += dist
        length_total += length
        if dist < 1:
            em_total += 1
        n += 1

    return {
        "EM": em_total / float(n) if n else 0.0,
        "Lev": 1.0 - dist_total / length_total if length_total else 0.0,
    }
