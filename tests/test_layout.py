"""2-D structural layout engine tests (data/layout.py).

The layout raster is the round-5 answer to the "1-D glyph transcription
vs 2-D structure serialization" gap: real pdflatex rasters (reference
model/utils/image.py:164-207) stack \\frac boxes, raise/lower scripts,
and draw radicals — these tests pin that the proxy raster now does too,
and that the structure-aware data utilities preserve renderability.
"""

import numpy as np
import pytest

from latex_ocr_tpu.data.layout import (
    is_structural,
    leaf_positions,
    parse_formula,
    render_layout_formula_array,
    sample_structured_formula,
    structural_shuffle,
)


def _ink_bbox(arr):
    ys, xs = np.where(arr != 255)
    return ys.min(), ys.max(), xs.min(), xs.max()


def test_contract_white_bg_uint8():
    arr = render_layout_formula_array(r"x + y")
    assert arr.dtype == np.uint8 and arr.ndim == 2
    assert arr[0, 0] == 255  # white background
    assert (arr != 255).any()  # has ink


def test_deterministic():
    f = r"\frac { a } { b } ^ { 2 }"
    a = render_layout_formula_array(f)
    b = render_layout_formula_array(f)
    assert a.shape == b.shape and (a == b).all()


def test_frac_stacks_vertically():
    """A fraction must be taller than the same leaves in a flat row, and
    numerator ink must sit strictly above denominator ink."""
    flat = render_layout_formula_array("a b")
    frac = render_layout_formula_array(r"\frac { a } { b }")
    fh = _ink_bbox(frac)
    flat_h = _ink_bbox(flat)
    assert (fh[1] - fh[0]) > 1.5 * (flat_h[1] - flat_h[0])
    # the bar row (a full-width dark run) separates num from den
    ink = frac != 255
    row_frac = ink.mean(axis=1)
    bar_row = int(np.argmax(row_frac))
    assert ink[: bar_row - 1].any() and ink[bar_row + 2 :].any()


def test_superscript_raised_subscript_lowered():
    base = render_layout_formula_array("x")
    sup = render_layout_formula_array(r"x ^ { 2 }")
    sub = render_layout_formula_array(r"x _ { 2 }")
    # script variants are taller than the bare base
    assert sup.shape[0] > base.shape[0]
    assert sub.shape[0] > base.shape[0]
    # and differ from each other: sup ink centroid is above sub's
    def centroid_y(a):
        ys, _ = np.where(a != 255)
        return ys.mean() / a.shape[0]

    assert centroid_y(sup) < centroid_y(sub)


def test_script_glyphs_shrink():
    """The exponent glyph renders smaller than the base glyph."""
    tree = parse_formula(r"x ^ { y }".split())
    assert tree[0] == "scripts"


def test_limits_ops_stack_above_below():
    """\\sum with limits places sub BELOW and sup ABOVE the operator; the
    composite is much taller than the bare operator."""
    bare = render_layout_formula_array(r"\sum")
    lim = render_layout_formula_array(r"\sum _ { i = 1 } ^ { n }")
    assert lim.shape[0] > 2 * bare.shape[0] - 10


def test_sqrt_has_vinculum():
    """Radical: a near-full-width horizontal line above the argument."""
    arr = render_layout_formula_array(r"\sqrt { x + y }")
    ink = arr != 255
    y0, y1, x0, x1 = _ink_bbox(arr)
    top_rows = ink[y0 : y0 + 4, x0 : x1 + 1]
    # one of the top rows covers most of the width (the vinculum)
    assert top_rows.mean(axis=1).max() > 0.7


def test_braces_are_invisible():
    """{ } group tokens carry no ink: ink of 'x y' == ink of '{ x y }'."""
    a = render_layout_formula_array("x y")
    b = render_layout_formula_array("{ x y }")
    ya, xa = np.where(a != 255)
    yb, xb = np.where(b != 255)
    assert len(ya) == len(yb)  # identical ink mass


def test_array_grid_rows_and_cols():
    one = render_layout_formula_array("a")
    grid = render_layout_formula_array(
        r"\begin{array} { c c } a & b \\ c & d \end{array}")
    assert grid.shape[0] > 1.7 * one.shape[0]
    assert grid.shape[1] > 1.5 * one.shape[1]


def test_left_right_fence_stretches():
    """\\left( around a tall body stretches the paren to body height."""
    tall = render_layout_formula_array(r"\left( \frac { a } { b } \right)")
    flat = render_layout_formula_array(r"( \frac { a } { b } )")
    # same height ballpark; fenced version must not be shorter
    assert tall.shape[0] >= flat.shape[0] - 2


def test_malformed_streams_never_raise():
    rng = np.random.default_rng(7)
    toks = ["{", "}", "^", "_", r"\frac", r"\sqrt", "x", "&", r"\\",
            r"\left(", r"\right)", r"\begin{array}", r"\end{array}",
            r"\bar", r"\mathrm", r"\big", "1", "+", r"\atop"]
    for _ in range(200):
        n = int(rng.integers(1, 60))
        f = " ".join(rng.choice(toks, size=n))
        arr = render_layout_formula_array(f)
        assert arr.dtype == np.uint8 and arr.ndim == 2
        assert arr.shape[0] <= 4096 and arr.shape[1] <= 4096


def test_real_formulas_smoke():
    """Every 40th real val formula renders with bounded canvas."""
    import os

    path = "/root/reference/data/val.formulas.norm.txt"
    if not os.path.exists(path):
        pytest.skip("reference data not present")
    with open(path) as f:
        forms = [ln.strip() for ln in f if ln.strip()][::40]
    for fo in forms:
        arr = render_layout_formula_array(fo)
        assert (arr != 255).any()
        assert arr.shape[0] <= 4096 and arr.shape[1] <= 4096


def test_is_structural_classification():
    for t in ("{", "}", "^", "_", r"\frac", r"\left(", r"\right.",
              r"\begin{array}", r"\mathrm", r"\,", r"\Bigg"):
        assert is_structural(t), t
    for t in ("x", "1", "+", r"\alpha", r"\sum", "(", "[", r"\infty"):
        assert not is_structural(t), t


def test_leaf_positions_only_visible():
    toks = r"\frac { a } { b } ^ { 2 }".split()
    pos = leaf_positions(toks)
    assert [toks[i] for i in pos] == ["a", "b", "2"]


def test_structural_shuffle_preserves_structure():
    f = r"\frac { a + b } { c } = x ^ { 2 }"
    rng = np.random.default_rng(3)
    out = structural_shuffle(f, rng)
    toks, orig = out.split(), f.split()
    assert len(toks) == len(orig)
    assert sorted(toks) == sorted(orig)  # multiset unchanged
    # structural skeleton unchanged
    skel = [t for t in orig if is_structural(t)]
    skel2 = [t for t in toks if is_structural(t)]
    assert skel == skel2
    # structure positions identical
    for i, t in enumerate(orig):
        if is_structural(t):
            assert toks[i] == t
    # and it still renders
    assert (render_layout_formula_array(out) != 255).any()


def test_sample_structured_formula_valid():
    leaves = ["x", "y", "1", "+"]
    rng = np.random.default_rng(0)
    for _ in range(100):
        f = sample_structured_formula(leaves, rng, min_len=3, max_len=30)
        toks = f.split()
        assert 1 <= len(toks) <= 30
        depth = 0
        for t in toks:
            depth += t == "{"
            depth -= t == "}"
            assert depth >= 0
        assert depth == 0
        assert (render_layout_formula_array(f) != 255).any()


def test_2d_more_compact_than_flat():
    """Width collapses vs the 1-D row on script/frac-heavy formulas —
    the property the BUCKETS_2D table is designed around."""
    from latex_ocr_tpu.data.synthetic import render_formula_array

    f = (r"\sum _ { i = 1 } ^ { n } \frac { x _ { i } ^ { 2 } } "
         r"{ \sqrt { 1 + y _ { i } } }")
    flat = render_formula_array(f)
    lay = render_formula_array(f, handwritten="layout")
    assert lay.shape[1] < 0.75 * flat.shape[1]
    assert lay.shape[0] > flat.shape[0]  # and gains height


def test_leaf_positions_exclude_invisible_contexts():
    """Tokens consumed with no ink (array column specs, \\hspace/\\label
    arguments, \\phantom bodies) must not be shuffle/OOV targets: swapping
    a visible glyph into such a slot makes its label pixel-unrecoverable."""
    import numpy as np

    from latex_ocr_tpu.data.layout import leaf_positions, structural_shuffle

    f = r"\begin{array} { c c } x & y \\ 1 & 2 \end{array}"
    toks = f.split()
    leaves = [toks[i] for i in leaf_positions(toks)]
    assert sorted(leaves) == ["1", "2", "x", "y"], leaves
    # the column spec survives any shuffle
    for seed in range(5):
        assert "{ c c }" in structural_shuffle(f, np.random.default_rng(seed))

    t2 = r"a \hspace { 2 m m } b \label { e q } c".split()
    assert [t2[i] for i in leaf_positions(t2)] == ["a", "b", "c"]

    t3 = r"a \phantom { x y } b \vphantom { Q } c".split()
    assert [t3[i] for i in leaf_positions(t3)] == ["a", "b", "c"]


def test_over_infix_outside_groups():
    """TeX treats \\over as an infix in the current group even with no
    braces; previously a top-level \\over fell through to a fake leaf
    glyph (flat row) while is_structural() claimed it was structural."""
    from latex_ocr_tpu.data.layout import (
        is_structural,
        leaf_positions,
        render_layout_formula_array,
    )

    flat = render_layout_formula_array("a b")
    over = render_layout_formula_array(r"a \over b")
    # stacked: taller and narrower than the 2-leaf row
    assert over.shape[0] > flat.shape[0]
    assert over.shape[1] < flat.shape[1]
    # consistency: structural tokens are never visible leaves
    toks = r"a \over b".split()
    assert is_structural(r"\over")
    assert [toks[i] for i in leaf_positions(toks)] == ["a", "b"]
    # also inside environment cells and fence bodies
    cell = render_layout_formula_array(
        r"\begin{pmatrix} a \over b & c \end{pmatrix}")
    assert cell.size > 0
