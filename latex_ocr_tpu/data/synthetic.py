"""Synthetic formula renderer: deterministic procedural glyphs.

Stands in for the pdflatex/ImageMagick toolchain when it is absent (CI,
render-less hosts): each distinct token maps — via a stable CRC-based hash —
to a unique glyph bitmap, and a formula renders as its glyphs drawn left to
right with small deterministic baseline offsets. The output then goes through
the exact same crop-to-ink / pad-to-bucket / downsample treatment as real
LaTeX renders, so every downstream stage (bucketing, batching, training,
image metrics) is exercised faithfully, and the image -> token-sequence task
remains genuinely learnable end to end.
"""

from __future__ import annotations

import zlib
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from .images import get_new_size

GLYPH_H = 24
GLYPH_W = 16
_BASELINE_PAD = 6


def _token_glyph(token: str) -> np.ndarray:
    """Deterministic (GLYPH_H, GLYPH_W) uint8 ink mask for a token."""
    seed = zlib.crc32(token.encode("utf-8")) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    # sparse strokes: a handful of horizontal/vertical bars + dots gives
    # visually distinct, high-contrast glyphs
    glyph = np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    for _ in range(3 + seed % 3):
        if rng.random() < 0.5:
            r = int(rng.integers(2, GLYPH_H - 2))
            c0, c1 = sorted(rng.integers(1, GLYPH_W - 1, size=2))
            glyph[r : r + 2, c0 : c1 + 2] = 255
        else:
            c = int(rng.integers(2, GLYPH_W - 2))
            r0, r1 = sorted(rng.integers(1, GLYPH_H - 1, size=2))
            glyph[r0 : r1 + 2, c : c + 2] = 255
    # guarantee non-empty ink
    glyph[GLYPH_H // 2, GLYPH_W // 2] = 255
    return glyph


_GLYPH_CACHE: dict = {}


def token_glyph(token: str) -> np.ndarray:
    g = _GLYPH_CACHE.get(token)
    if g is None:
        g = _token_glyph(token)
        _GLYPH_CACHE[token] = g
    return g


def render_formula_array(formula: str, handwritten: bool = False, seed: int = 0) -> np.ndarray:
    """Render a formula into an (H, W) uint8 array, white background.

    ``handwritten`` adds per-instance deformation (glyph jitter, variable
    advance, stroke dropout, background speckle) to emulate a
    CROHME-style handwritten distribution — harder inputs, same task
    (BASELINE.json config #4).
    """
    tokens = [t for t in formula.strip().split(" ") if t]
    if not tokens:
        tokens = ["?"]
    rng = np.random.default_rng(zlib.crc32(formula.encode()) ^ seed)
    width = len(tokens) * (GLYPH_W + 4) + 2 * _BASELINE_PAD
    height = GLYPH_H + 6 * _BASELINE_PAD
    canvas = np.zeros((height, width), dtype=np.uint8)
    x = _BASELINE_PAD
    for i, tok in enumerate(tokens):
        # deterministic per-position baseline jitter (sub/superscript flavour)
        dy = (zlib.crc32(f"{tok}:{i}".encode()) % (2 * _BASELINE_PAD)) - _BASELINE_PAD
        glyph = token_glyph(tok)
        if handwritten:
            dy += int(rng.integers(-3, 4))
            dx = int(rng.integers(-1, 3))
            if rng.random() < 0.3:  # stroke dropout
                mask = rng.random(glyph.shape) > 0.15
                glyph = glyph * mask
            x += dx
        y = min(max(0, 2 * _BASELINE_PAD + dy), height - GLYPH_H)
        canvas[y : y + GLYPH_H, x : x + GLYPH_W] = np.maximum(
            canvas[y : y + GLYPH_H, x : x + GLYPH_W], glyph
        )
        x += GLYPH_W + (int(rng.integers(1, 5)) if handwritten else 2)
    out = 255 - canvas  # ink is dark on white
    if handwritten:
        speckle = rng.random(out.shape) < 0.003
        out = np.where(speckle, 128, out).astype(np.uint8)
    return out


def render_synthetic_formula(
    formula: str,
    output_path: str,
    buckets: Optional[Sequence[Sequence[int]]] = None,
    down_ratio: int = 2,
    pad: int = 8,
    handwritten: bool = False,
) -> bool:
    """Render a formula PNG with the same crop/pad/bucket/downsample contract
    as the LaTeX pipeline."""
    arr = render_formula_array(formula, handwritten=handwritten)

    # crop to ink
    ys, xs = np.where(arr != 255)
    if ys.size == 0:
        return False
    arr = arr[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]

    # pad +pad each side, snap to bucket
    h, w = arr.shape
    old_size = (w + 2 * pad, h + 2 * pad)
    new_w, new_h = get_new_size(old_size, buckets)
    canvas = np.full((new_h, new_w), 255, dtype=np.uint8)
    canvas[pad : pad + h, pad : pad + w] = arr

    img = Image.fromarray(canvas)
    if down_ratio > 1:
        img = img.resize((new_w // down_ratio, new_h // down_ratio), Image.LANCZOS)
    img.save(output_path)
    return True


def make_synthetic_dataset(
    out_dir: str,
    n_train: int = 60,
    n_val: int = 20,
    n_test: int = 20,
    vocab_tokens: Optional[Sequence[str]] = None,
    min_len: int = 3,
    max_len: int = 12,
    seed: int = 0,
    buckets: Optional[Sequence[Sequence[int]]] = None,
    n_threads: int = 4,
    handwritten: bool = False,
) -> dict:
    """Generate a complete small dataset (formulas + images + matching +
    vocab) under ``out_dir``. Returns the path dict used to build configs."""
    import os

    from .render import build_images

    if vocab_tokens is None:
        vocab_tokens = [
            "x", "y", "z", "a", "b", "c", "0", "1", "2", "3",
            "+", "-", "=", "(", ")", r"\frac", r"\sqrt", "^", "_", r"\alpha",
            r"\beta", r"\sum", r"\int", "{", "}",
        ]
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    paths: dict = {}
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        formulas = []
        for _ in range(n):
            length = int(rng.integers(min_len, max_len + 1))
            formulas.append(" ".join(rng.choice(vocab_tokens, size=length)))
        formulas_path = os.path.join(out_dir, f"{split}.formulas.norm.txt")
        with open(formulas_path, "w") as f:
            f.write("\n".join(formulas) + "\n")

        dir_images = os.path.join(out_dir, f"images_{split}/")
        matching_path = os.path.join(out_dir, f"{split}.matching.txt")
        result = build_images(
            dict(enumerate(formulas)), dir_images, buckets=buckets,
            n_threads=n_threads, force_synthetic=True, handwritten=handwritten,
        )
        with open(matching_path, "w") as f:
            for path_img, idx in sorted(result, key=lambda r: r[1]):
                if path_img is not False:
                    f.write(f"{path_img} {idx}\n")
        paths[f"path_formulas_{split}"] = formulas_path
        paths[f"dir_images_{split}"] = dir_images
        paths[f"path_matching_{split}"] = matching_path

    vocab_path = os.path.join(out_dir, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(sorted(vocab_tokens)))
    paths["path_vocab"] = vocab_path
    return paths
