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


# ------------------------------------------------------ stroke handwriting

_STROKE_H = 28
_STROKE_W = 20


def _token_strokes(token: str):
    """Deterministic pen strokes for a token: 1-3 polylines of 3-5 control
    points in the unit square. Every instance of the token shares these
    (they ARE the glyph identity); per-instance deformation happens at
    render time."""
    seed = zlib.crc32(b"strokes:" + token.encode("utf-8")) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    strokes = []
    for _ in range(1 + seed % 3):
        n_pts = int(rng.integers(3, 6))
        strokes.append(rng.random((n_pts, 2)))
    return strokes


_STROKE_CACHE: dict = {}


def token_strokes(token: str):
    s = _STROKE_CACHE.get(token)
    if s is None:
        s = _token_strokes(token)
        _STROKE_CACHE[token] = s
    return s


def _pen_path(pts: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Densify a control polyline into a smooth pen trajectory (px coords)."""
    seg = np.hypot(*np.diff(pts, axis=0).T)
    n = max(8, int(seg.sum() * 2.5))
    t = np.concatenate([[0.0], np.cumsum(seg)])
    t = t / max(t[-1], 1e-6)
    ti = np.linspace(0.0, 1.0, n)
    xs = np.interp(ti, t, pts[:, 0])
    ys = np.interp(ti, t, pts[:, 1])
    # box-smooth with edge padding: rounds polyline corners into pen curves
    k = 5
    pad_x = np.pad(xs, k // 2, mode="edge")
    pad_y = np.pad(ys, k // 2, mode="edge")
    kernel = np.ones(k) / k
    xs = np.convolve(pad_x, kernel, mode="valid")
    ys = np.convolve(pad_y, kernel, mode="valid")
    return np.stack([xs, ys], axis=1)


def _draw_pen_stroke(canvas: np.ndarray, path: np.ndarray, base_radius: float,
                     intensity: int, rng: np.random.Generator) -> None:
    """Stamp disks of smoothly varying radius along the path (max-blend ink)."""
    n = len(path)
    # smooth thickness profile: pen pressure varies along the stroke
    prof = rng.random(max(4, n // 8))
    prof = np.interp(np.linspace(0, 1, n), np.linspace(0, 1, len(prof)), prof)
    radii = base_radius * (0.65 + 0.7 * prof)
    H, W = canvas.shape
    # one vectorized union-of-disks mask over the stroke's bounding box
    # (identical ink to per-point stamping, ~an order of magnitude faster)
    r_max = float(radii.max())
    y0 = max(0, int(np.floor(path[:, 1].min() - r_max)) - 1)
    y1 = min(H, int(np.ceil(path[:, 1].max() + r_max)) + 2)
    x0 = max(0, int(np.floor(path[:, 0].min() - r_max)) - 1)
    x1 = min(W, int(np.ceil(path[:, 0].max() + r_max)) + 2)
    if y0 >= y1 or x0 >= x1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    d2 = (yy[None] - path[:, 1, None, None]) ** 2 + (xx[None] - path[:, 0, None, None]) ** 2
    mask = (d2 <= (radii ** 2 + 0.25)[:, None, None]).any(axis=0)
    region = canvas[y0:y1, x0:x1]
    np.maximum(region, np.where(mask, intensity, 0).astype(np.uint8), out=region)


def render_stroke_formula_array(formula: str, seed: int = 0) -> np.ndarray:
    """CROHME-style stroke handwriting: each token drawn as smooth
    variable-thickness pen trajectories with per-instance control-point
    perturbation, a global slant, baseline wobble across the formula,
    per-token scale jitter, and varying ink tone. Far closer to a
    handwriting distribution than the jitter style (which deforms printed
    bitmaps), while staying deterministic in (formula, seed)."""
    tokens = [t for t in formula.strip().split(" ") if t]
    if not tokens:
        tokens = ["?"]
    rng = np.random.default_rng((zlib.crc32(formula.encode()) ^ seed) & 0xFFFFFFFF)
    slant = rng.uniform(-0.15, 0.35)  # dx per dy, like italic handwriting
    height = _STROKE_H + 8 * _BASELINE_PAD
    width = int(len(tokens) * (_STROKE_W + 6) + 2 * _BASELINE_PAD
                + abs(slant) * height) + _STROKE_W
    canvas = np.zeros((height, width), dtype=np.uint8)
    # negative slant shifts ink left near the top — shift the origin so the
    # first token's strokes stay on-canvas
    x = float(_BASELINE_PAD) + max(0.0, -slant * height)
    baseline = 3.0 * _BASELINE_PAD
    for i, tok in enumerate(tokens):
        # structural baseline offset (sub/superscript flavour, same hash
        # contract as the printed renderer) + smooth handwriting wobble
        dy = (zlib.crc32(f"{tok}:{i}".encode()) % (2 * _BASELINE_PAD)) - _BASELINE_PAD
        baseline = np.clip(
            baseline + rng.normal(0.0, 1.2), 2.0 * _BASELINE_PAD, 4.0 * _BASELINE_PAD
        )
        scale = rng.uniform(0.85, 1.15)
        gh, gw = _STROKE_H * scale, _STROKE_W * scale
        tone = int(rng.integers(150, 256))  # ink intensity (inverted later)
        thickness = rng.uniform(0.9, 1.9)
        for pts in token_strokes(tok):
            p = pts + rng.normal(0.0, 0.06, pts.shape)  # per-instance wobble
            px = np.empty_like(p)
            py_ = baseline + dy + p[:, 1] * gh
            px[:, 0] = x + p[:, 0] * gw + slant * (height - py_)  # shear
            px[:, 1] = py_
            path = _pen_path(px, rng)
            _draw_pen_stroke(canvas, path, thickness, tone, rng)
        x += gw + rng.uniform(1.0, 6.0)
    out = 255 - canvas
    # paper texture + occasional smudge specks
    speckle = rng.random(out.shape) < 0.002
    out = np.where(speckle, rng.integers(90, 200), out).astype(np.uint8)
    return out


def render_formula_array(formula: str, handwritten=False, seed: int = 0) -> np.ndarray:
    """Render a formula into an (H, W) uint8 array, white background.

    ``handwritten`` selects the distribution: False = printed glyphs;
    True (or "jitter") = printed glyphs + per-instance deformation (glyph
    jitter, variable advance, stroke dropout, background speckle);
    "stroke" = the pen-trajectory handwriting renderer
    (`render_stroke_formula_array`) — CROHME-style smooth strokes
    (BASELINE.json config #4);
    "layout" = the 2-D structural layout renderer (`data/layout.py`):
    \\frac/^/_/\\sqrt/arrays laid out as TeX boxes, so the decoder must
    serialize 2-D structure — the behavior real pdflatex rasters have
    (reference model/utils/image.py:164-207).
    """
    if handwritten == "stroke":
        return render_stroke_formula_array(formula, seed=seed)
    if handwritten == "layout":
        from .layout import render_layout_formula_array

        return render_layout_formula_array(formula, seed=seed)
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
    handwritten=False,  # False | True/'jitter' | 'stroke'
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
    handwritten=False,  # False | True/'jitter' | 'stroke' | 'layout'
    structured: bool = False,
) -> dict:
    """Generate a complete small dataset (formulas + images + matching +
    vocab) under ``out_dir``. Returns the path dict used to build configs.

    ``structured=True`` samples grammatically valid 2-D structures
    (balanced braces, \\frac/^/_/\\sqrt/limits — layout.py
    sample_structured_formula) with uniform-random leaves instead of flat
    uniform token strings: the grounding-phase analogue for the 'layout'
    raster, where structural tokens must be inferred from geometry rather
    than read as glyphs."""
    import os

    from .render import build_images

    if structured:
        from .layout import is_structural, sample_structured_formula

    if vocab_tokens is None:
        vocab_tokens = [
            "x", "y", "z", "a", "b", "c", "0", "1", "2", "3",
            "+", "-", "=", "(", ")", r"\frac", r"\sqrt", "^", "_", r"\alpha",
            r"\beta", r"\sum", r"\int", "{", "}",
        ]
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    paths: dict = {}
    leaves = None
    if structured:
        leaves = [t for t in vocab_tokens if not is_structural(t)] or ["x"]
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        formulas = []
        for _ in range(n):
            if structured:
                formulas.append(sample_structured_formula(
                    leaves, rng, min_len=min_len, max_len=max_len))
            else:
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
