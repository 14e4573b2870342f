#!/usr/bin/env python
"""Build the im2latexSyn dataset: REAL im2latex formulas, synthetic raster.

The environment has no egress and no LaTeX toolchain, but the upstream
reference checkout ships the im2latex-100k val/test formula files
(reference data/val.formulas.norm.txt 8,475 lines, test.formulas.norm.txt
9,444 lines). This script reads those REAL token sequences at runtime
(nothing is copied into this repo) and renders them with the synthetic
glyph rasterizer — so quality numbers measure learning the *real* LaTeX
token distribution (vocab ~500, lengths to 150, true n-gram structure)
through the full pipeline; only the rasterizer differs from the real
task.

Split: train = the val-file formulas; val/test = disjoint slices of the
test-file formulas. Formulas too wide for the bucket table are dropped at
render time exactly like the reference's pad_image->False path.

Usage:
    python scripts/build_im2latex_syn.py          # defaults to /root/reference/data
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click

# 12-bucket table: the standard 8 plus wide rows for long formulas
# (raw glyph row is ~20 px/token, so [2400,200] covers ~118 tokens)
BUCKETS = [
    [240, 100], [320, 80], [400, 100], [480, 100], [560, 100],
    [720, 120], [800, 100], [1000, 200], [1200, 200], [1600, 200],
    [2000, 200], [2400, 200],
]

# --style layout table: 2-D structural renders are much more compact than
# glyph rows (scripts shrink, fractions stack) — measured over 800 real
# formulas: W p50/p99/max = 419/894/1081, H = 61/104/167 (crop+2x8 pad).
# This 15-bucket table was waste-optimized against that distribution
# (38% padding waste, 0 over-size drops; the 1-D table would waste 64%).
BUCKETS_2D = [
    [200, 60], [280, 70], [360, 70], [360, 110], [440, 80], [520, 80],
    [520, 120], [600, 90], [680, 90], [760, 100], [840, 100], [920, 110],
    [1000, 120], [1100, 140], [1200, 200],
]


@click.command()
@click.option("--source", default="/root/reference/data",
              help="Dir holding val.formulas.norm.txt / test.formulas.norm.txt")
@click.option("--out", default="data/im2latexSyn")
@click.option("--n-val", default=500)
@click.option("--n-test", default=1500)
@click.option("--max-len", default=150)
@click.option("--n-threads", default=8)
@click.option("--augment-ngram", default=0,
              help="Append N trigram-sampled formulas (backoff to bigram/"
                   "unigram) drawn from the real train corpus. Makes decoder "
                   "memorization impossible at small corpus sizes while "
                   "keeping the token distribution real; eval splits stay "
                   "100% real formulas.")
@click.option("--oov-inject", default=0.0,
              help="Fraction of AUGMENTED lines that get 1-3 synthetic "
                   "never-in-vocab tokens (each unique, so min_count keeps "
                   "them out of the vocab; the raster draws each as a novel "
                   "glyph and form_prepro labels them _UNK). Teaches the "
                   "decoder the novelty->_UNK mapping: the natural corpus "
                   "has too few OOV instances (~344 over 69 glyphs) for it "
                   "to emerge, and ~1.4%% of real test formulas contain an "
                   "OOV token - a measured EM ceiling without this.")
@click.option("--rare-boost", default=0.0,
              help="Oversample rare glyphs in shuffle augmentation: source "
                   "lines are drawn with probability proportional to "
                   "(1/min token count)^boost instead of uniformly. Rare "
                   "in-vocab glyphs are the measured confusion source after "
                   "OOV training (the decoder overcalls _UNK on glyphs it "
                   "has seen too few times to tell from novel ones).")
@click.option("--length-boost", default=0.0,
              help="Additionally weight shuffle-augmentation source lines "
                   "by (token count)^boost. Long formulas are the largest "
                   "remaining miss cluster (12/42 at ref length 125-149 on "
                   "the D' model, 4 of them decoding to the length cap "
                   "without END) — more long-row attention exposure is the "
                   "data-side lever. Composes with --rare-boost "
                   "(weights multiply).")
@click.option("--style", default="flat",
              type=click.Choice(["flat", "layout"]),
              help="raster style: 'flat' = 1-D glyph rows (the r1-r4 "
                   "proxy); 'layout' = the 2-D structural TeX box renderer "
                   "(data/layout.py) — \\frac/^/_/\\sqrt/arrays laid out "
                   "the way real pdflatex rasters are, so the decoder must "
                   "serialize 2-D structure. Selects the waste-optimized "
                   "BUCKETS_2D table and structure-aware augmentation "
                   "(leaf-only shuffle, leaf-only OOV injection).")
@click.option("--augment-mode", default="trigram",
              type=click.Choice(["trigram", "shuffle"]),
              help="trigram: n-gram LM samples (real-looking grammar — but "
                   "gives the decoder a cheap LM shortcut that can stall "
                   "attention grounding at the n-gram entropy floor). "
                   "shuffle: random permutations of real formulas — same "
                   "token/length distribution, NO learnable sequence "
                   "structure, so the only way to reduce loss on augmented "
                   "samples is to read the pixels (mirrors why the "
                   "random-token synth task grounds reliably).")
def main(source, out, n_val, n_test, max_len, n_threads, style,
         augment_ngram, oov_inject, rare_boost, length_boost, augment_mode):
    from collections import Counter

    from latex_ocr_tpu.data.render import build_images
    from latex_ocr_tpu.data.vocab import pad_vocab, write_vocab

    buckets = BUCKETS_2D if style == "layout" else BUCKETS
    raster = "layout" if style == "layout" else False
    if style == "layout":
        from latex_ocr_tpu.data.layout import leaf_positions, structural_shuffle

    src_val = os.path.join(source, "val.formulas.norm.txt")
    src_test = os.path.join(source, "test.formulas.norm.txt")
    if not (os.path.exists(src_val) and os.path.exists(src_test)):
        raise click.ClickException(
            f"real formula files not found under {source} — point --source at "
            "a dir with val.formulas.norm.txt/test.formulas.norm.txt"
        )

    def load(path):
        with open(path) as f:
            return [ln.strip() for ln in f if ln.strip()]

    train_formulas = [f for f in load(src_val) if len(f.split()) <= max_len]
    pool = [f for f in load(src_test) if len(f.split()) <= max_len]
    val_formulas, test_formulas = pool[:n_val], pool[n_val : n_val + n_test]
    click.echo(
        f"real formulas: train {len(train_formulas)}, val {len(val_formulas)}, "
        f"test {len(test_formulas)} (<= {max_len} tokens)"
    )

    if augment_ngram:
        import numpy as np

        rng = np.random.default_rng(23)
        # trigram table with bigram/unigram backoff over the train corpus
        tri, bi, uni, lengths = {}, {}, Counter(), []
        for f in train_formulas:
            toks = f.split()
            lengths.append(len(toks))
            uni.update(toks)
            for i in range(len(toks) - 1):
                bi.setdefault(toks[i], []).append(toks[i + 1])
            for i in range(len(toks) - 2):
                tri.setdefault((toks[i], toks[i + 1]), []).append(toks[i + 2])
        uni_toks = list(uni)
        uni_p = np.array([uni[t] for t in uni_toks], np.float64)
        uni_p /= uni_p.sum()
        seen = set(train_formulas)
        src_p = None
        if rare_boost or length_boost:
            if augment_mode != "shuffle":
                raise click.ClickException(
                    "--rare-boost/--length-boost reweight the shuffle-mode "
                    "source-line draw and have no effect on trigram "
                    "sampling — add --augment-mode shuffle (a silently "
                    "unboosted multi-minute render helps no one)"
                )
            weights = np.ones(len(train_formulas), np.float64)
            if rare_boost:
                min_counts = np.array(
                    [min(uni[t] for t in f.split()) for f in train_formulas],
                    np.float64,
                )
                weights *= min_counts ** (-rare_boost)
            if length_boost:
                lens = np.array(
                    [len(f.split()) for f in train_formulas], np.float64
                )
                weights *= lens ** length_boost
            src_p = weights / weights.sum()
            # pre-draw weighted indices in batches: rng.choice(p=...) per
            # draw rebuilds the O(n) cumulative distribution every call
            src_cum = np.cumsum(src_p)
            src_cum[-1] = 1.0
        sampled = []
        attempts = 0
        while len(sampled) < augment_ngram:
            attempts += 1
            if attempts > 20 * augment_ngram + 1000:
                # tiny corpora can exhaust the distinct-permutation space;
                # ship what we have instead of spinning forever
                click.echo(f"WARNING: augmentation saturated at {len(sampled)}/"
                           f"{augment_ngram} unique samples; continuing")
                break
            if augment_mode == "shuffle":
                if src_p is not None:
                    idx = int(np.searchsorted(src_cum, rng.random(), side="right"))
                    src = train_formulas[min(idx, len(train_formulas) - 1)]
                else:
                    src = train_formulas[int(rng.integers(0, len(train_formulas)))]
                if style == "layout":
                    # 2-D raster: structural tokens carry no ink — a blind
                    # permutation scatters { } ^ _ into pixel-unrecoverable
                    # positions (irreducible-loss noise). Permute only the
                    # visible leaves: token multiset unchanged, n-gram
                    # shortcut destroyed, structure stays renderable.
                    toks = structural_shuffle(src, rng).split()
                else:
                    toks = list(rng.permutation(src.split()))
            else:
                L = int(lengths[int(rng.integers(0, len(lengths)))])
                toks = [str(rng.choice(uni_toks, p=uni_p))]
                while len(toks) < L:
                    nxt = None
                    if len(toks) >= 2 and (toks[-2], toks[-1]) in tri:
                        cands = tri[(toks[-2], toks[-1])]
                        nxt = cands[int(rng.integers(0, len(cands)))]
                    elif toks[-1] in bi:
                        cands = bi[toks[-1]]
                        nxt = cands[int(rng.integers(0, len(cands)))]
                    else:
                        nxt = str(rng.choice(uni_toks, p=uni_p))
                    toks.append(nxt)
            if oov_inject and rng.random() < oov_inject:
                if style == "layout":
                    # only replace visible leaves — swapping a structural
                    # token for an OOV glyph would change the 2-D layout
                    # itself, not just one glyph
                    cand = leaf_positions(toks)
                else:
                    cand = list(range(len(toks)))
                for j in range(int(rng.integers(1, 4))):
                    if not cand:
                        break
                    pos = int(cand[int(rng.integers(0, len(cand)))])
                    toks[pos] = (
                        f"oov{len(sampled)}_{j}_{int(rng.integers(0, 1 << 20)):05x}"
                    )
            f = " ".join(toks)
            if f not in seen:  # unique, and never a real eval formula
                seen.add(f)
                sampled.append(f)
        train_formulas = train_formulas + sampled
        click.echo(f"augmented train with {len(sampled)} {augment_mode}-sampled "
                   f"formulas -> {len(train_formulas)} total")

    os.makedirs(out, exist_ok=True)
    for split, formulas in (
        ("train", train_formulas), ("val", val_formulas), ("test", test_formulas)
    ):
        fpath = os.path.join(out, f"{split}.formulas.norm.txt")
        # the incremental render (build_images, reference image.py:238-245
        # semantics) skips existing PNGs BY INDEX — if this split's formula
        # list changed since the last build (e.g. a different --augment-mode
        # into the same --out), every skipped image silently belongs to the
        # OLD formula at that index and the dataset is poisoned (measured:
        # 24k mismatched pairs held training at the LM floor while val, whose
        # formulas hadn't changed, kept improving). Guard by content: clear
        # the split's images and cache when the formula list differs.
        new_content = "\n".join(formulas) + "\n"
        old_content = None
        if os.path.exists(fpath):
            with open(fpath) as f:
                old_content = f.read()
        # the raster style is part of the content identity too: the same
        # formula list re-rendered with a different --style must not reuse
        # the other style's PNGs (sentinel file, NOT a line in the formulas
        # file — line numbers there are the matching-file contract)
        style_path = os.path.join(out, f".{split}.style")
        old_style = None
        if os.path.exists(style_path):
            with open(style_path) as f:
                old_style = f.read().strip()
        elif old_content is not None:
            old_style = "flat"  # pre-sentinel builds were all flat
        if old_content is not None and (
            old_content != new_content or old_style != style
        ):
            import shutil

            click.echo(f"{split}: formula list changed since last build — "
                       "clearing stale renders + cache")
            for stale in (os.path.join(out, f"images_{split}"),
                          os.path.join(out, f"cache_{split}")):
                shutil.rmtree(stale, ignore_errors=True)
        with open(fpath, "w") as f:
            f.write(new_content)
        with open(style_path, "w") as f:
            f.write(style + "\n")
        dir_images = os.path.join(out, f"images_{split}/")
        result = build_images(
            dict(enumerate(formulas)), dir_images, buckets=buckets,
            n_threads=n_threads, force_synthetic=True, handwritten=raster,
        )
        with open(os.path.join(out, f"{split}.matching.txt"), "w") as f:
            for path_img, idx in sorted(result, key=lambda r: r[1]):
                f.write(f"{path_img} {idx}\n")
        click.echo(f"{split}: rendered {len(result)}/{len(formulas)} "
                   "(over-wide formulas dropped, reference pad_image semantics)")

    # reference vocab contract: token-level, min_count 10 (reference
    # configs/vocab.json + text.py build_vocab semantics)
    counter = Counter()
    for f in train_formulas:
        counter.update(f.split())
    vocab = sorted(tok for tok, c in counter.items() if c >= 10)
    # lane-align V and keep compiled shapes stable across rebuilds whose
    # raw token counts wobble (data/vocab.py:pad_vocab)
    vocab = pad_vocab(vocab, 128)
    write_vocab(vocab, os.path.join(out, "vocab.txt"))
    click.echo(f"vocab: {len(vocab)} tokens (min_count=10, padded to 128-lane)")

    with open(os.path.join(out, "buckets.json"), "w") as f:
        json.dump(buckets, f)
    click.echo("done")


if __name__ == "__main__":
    main()
