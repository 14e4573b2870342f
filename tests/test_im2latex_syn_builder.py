"""Tests for scripts/build_im2latex_syn.py, especially --oov-inject.

The builder reads REAL formula files (reference data layout:
val.formulas.norm.txt as train source, test.formulas.norm.txt sliced into
val/test) and renders them with the synthetic raster. --oov-inject places
1-3 unique never-in-vocab tokens into a fraction of the augmented lines so
the decoder can learn the novelty->_UNK mapping (reference text.py:26-40
form_prepro semantics: any token outside the vocab maps to _UNK).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILDER = os.path.join(REPO, "scripts", "build_im2latex_syn.py")


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    """Run the builder once on a tiny corpus with every augmented line OOV."""
    root = tmp_path_factory.mktemp("i2l_syn")
    source = root / "source"
    source.mkdir()
    base_toks = ["a", "b", "c", "x", "y", "+", "-", "{", "}"]
    # 40 train-source lines over a tiny vocab; every token clears min_count 10
    lines = []
    for i in range(40):
        toks = [base_toks[(i + j) % len(base_toks)] for j in range(3 + i % 5)]
        lines.append(" ".join(toks))
    (source / "val.formulas.norm.txt").write_text("\n".join(lines) + "\n")
    (source / "test.formulas.norm.txt").write_text("\n".join(lines[::-1]) + "\n")

    out = root / "out"
    proc = subprocess.run(
        [
            sys.executable, BUILDER,
            "--source", str(source), "--out", str(out),
            "--n-val", "4", "--n-test", "4", "--n-threads", "2",
            "--augment-ngram", "20", "--augment-mode", "shuffle",
            "--oov-inject", "1.0",
        ],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return out


def test_oov_tokens_injected_into_augmented_lines(built):
    train = (built / "train.formulas.norm.txt").read_text().splitlines()
    # 40 originals + up to 20 augmented (shuffle dedup may drop a few)
    assert len(train) > 40
    augmented = train[40:]
    oov_lines = [l for l in augmented if any(t.startswith("oov") for t in l.split())]
    assert len(oov_lines) == len(augmented)  # --oov-inject 1.0
    for line in oov_lines:
        n = sum(t.startswith("oov") for t in line.split())
        assert 1 <= n <= 3


def test_oov_tokens_are_unique_and_stay_out_of_vocab(built):
    train = (built / "train.formulas.norm.txt").read_text().splitlines()
    oov = [t for l in train for t in l.split() if t.startswith("oov")]
    assert len(oov) == len(set(oov))  # unique => always below min_count
    vocab = (built / "vocab.txt").read_text().split()
    assert not any(t.startswith("oov") for t in vocab)
    # lane alignment (pad_vocab to 128 with specials): reserved fillers present
    assert any(t.startswith("_RSV") for t in vocab)


def test_form_prepro_maps_injected_tokens_to_unk(built):
    from latex_ocr_tpu.data.vocab import Vocab
    from latex_ocr_tpu.utils import Config

    cfg = Config({"path_vocab": str(built / "vocab.txt"), "min_count_tok": 1,
                  "unk": "_UNK", "pad": "_PAD", "end": "_END"})
    vocab = Vocab(cfg)
    train = (built / "train.formulas.norm.txt").read_text().splitlines()
    line = next(l for l in train if any(t.startswith("oov") for t in l.split()))
    ids = vocab.form_prepro(line)
    toks = line.split()
    assert len(ids) == len(toks)
    for tok, tid in zip(toks, ids):
        if tok.startswith("oov"):
            assert tid == vocab.id_unk
        else:
            assert tid != vocab.id_unk


def test_rare_boost_oversamples_rare_glyph_lines(tmp_path):
    """With --rare-boost, shuffle-augmentation source lines are drawn
    proportional to (1/min token count)^boost: lines holding the rarest
    glyphs dominate the augmented set instead of appearing at base rate."""
    source = tmp_path / "source"
    source.mkdir()
    base = ["a", "b", "c", "+", "x", "y", "{", "}"]
    # varied 8-token lines -> permutation space far exceeds the 40 requested
    common = [" ".join(base[(i + j) % len(base)] for j in range(8))
              for i in range(39)]
    rare_line = "a \\varpi b x y c + {"  # \varpi appears exactly once
    lines = common + [rare_line]
    (source / "val.formulas.norm.txt").write_text("\n".join(lines) + "\n")
    (source / "test.formulas.norm.txt").write_text("\n".join(lines) + "\n")

    out = tmp_path / "out"
    proc = subprocess.run(
        [
            sys.executable, BUILDER,
            "--source", str(source), "--out", str(out),
            "--n-val", "2", "--n-test", "2", "--n-threads", "2",
            "--augment-ngram", "40", "--augment-mode", "shuffle",
            "--rare-boost", "1.0",
        ],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    train = (out / "train.formulas.norm.txt").read_text().splitlines()
    augmented = train[40:]
    assert augmented
    rare_rate = sum("\\varpi" in l.split() for l in augmented) / len(augmented)
    # base rate is 1/40 = 2.5%; inverse-frequency weighting makes the rare
    # line ~49% of draws ((1/1) vs 39*(1/39) weight mass)
    assert rare_rate > 0.25, f"rare line rate {rare_rate:.2f} not boosted"


def test_length_boost_oversamples_long_lines(tmp_path):
    """--length-boost weights source lines by len^boost: the long lines'
    share of augmented draws rises well above their corpus share."""
    source = tmp_path / "source"
    source.mkdir()
    base = ["a", "b", "c", "+", "x", "y", "{", "}"]
    short = [" ".join(base[(i + j) % len(base)] for j in range(4))
             for i in range(36)]
    longs = [" ".join(base[(i + j) % len(base)] for j in range(40))
             for i in range(4)]
    lines = short + longs  # long lines are 10% of the corpus, 10x the length
    (source / "val.formulas.norm.txt").write_text("\n".join(lines) + "\n")
    (source / "test.formulas.norm.txt").write_text("\n".join(lines) + "\n")

    out = tmp_path / "out"
    proc = subprocess.run(
        [
            sys.executable, BUILDER,
            "--source", str(source), "--out", str(out),
            "--n-val", "2", "--n-test", "2", "--n-threads", "2",
            "--augment-ngram", "40", "--augment-mode", "shuffle",
            "--length-boost", "1.0",
        ],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    train = (out / "train.formulas.norm.txt").read_text().splitlines()
    augmented = train[40:]
    assert augmented
    long_rate = sum(len(l.split()) == 40 for l in augmented) / len(augmented)
    # base share 10%; len-weighted share = 4*40 / (36*4 + 4*40) = 52.6%
    assert long_rate > 0.3, f"long-line rate {long_rate:.2f} not boosted"


def test_rebuild_with_changed_formulas_clears_stale_renders(tmp_path):
    """The incremental render skips existing PNGs by index; rebuilding the
    same --out with different formula content must clear stale images or
    the dataset is silently poisoned (image i belongs to the OLD line i)."""
    source = tmp_path / "source"
    source.mkdir()
    base = ["a", "b", "c", "+", "x", "y", "{", "}"]
    lines = [" ".join(base[(i + j) % len(base)] for j in range(6))
             for i in range(20)]
    (source / "val.formulas.norm.txt").write_text("\n".join(lines) + "\n")
    (source / "test.formulas.norm.txt").write_text("\n".join(lines) + "\n")
    out = tmp_path / "out"

    def build(mode):
        proc = subprocess.run(
            [
                sys.executable, BUILDER,
                "--source", str(source), "--out", str(out),
                "--n-val", "2", "--n-test", "2", "--n-threads", "2",
                "--augment-ngram", "10", "--augment-mode", mode,
            ],
            capture_output=True, text=True, timeout=600,
            env=dict(os.environ, JAX_PLATFORMS="cpu"),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return proc

    build("shuffle")
    img = out / "images_train" / "25.png"  # an augmented-line render
    before = img.read_bytes()
    proc = build("trigram")  # different augmented lines, same out dir
    assert "clearing stale renders" in proc.stdout
    # image 25 must now raster the NEW line 25, not the stale shuffle one
    assert not img.exists() or img.read_bytes() != before
    train = (out / "train.formulas.norm.txt").read_text().splitlines()
    matching = (out / "train.matching.txt").read_text().splitlines()
    assert len(matching) == len(train)


def test_boost_with_trigram_mode_is_an_error(tmp_path):
    """The boosts reweight the shuffle-mode source draw; combining them
    with trigram sampling must fail fast, not silently render an
    unboosted dataset."""
    source = tmp_path / "source"
    source.mkdir()
    (source / "val.formulas.norm.txt").write_text("a b c\nb c a\n")
    (source / "test.formulas.norm.txt").write_text("a b c\nb c a\n")
    proc = subprocess.run(
        [
            sys.executable, BUILDER,
            "--source", str(source), "--out", str(tmp_path / "out"),
            "--n-val", "1", "--n-test", "1", "--n-threads", "1",
            "--augment-ngram", "4", "--rare-boost", "1.0",
        ],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert proc.returncode != 0
    assert "--augment-mode shuffle" in proc.stderr + proc.stdout


def test_oov_lines_render_and_reach_matching_file(built):
    train = (built / "train.formulas.norm.txt").read_text().splitlines()
    matching = (built / "train.matching.txt").read_text().splitlines()
    rendered_ids = {int(l.split()[1]) for l in matching}
    oov_ids = {i for i, l in enumerate(train)
               if any(t.startswith("oov") for t in l.split())}
    # novel glyphs must raster like any other token (none dropped for OOV-ness;
    # over-wide lines are the only legitimate drop and these are all short)
    assert oov_ids <= rendered_ids
    for l in matching[:3]:
        assert os.path.exists(built / "images_train" / l.split()[0])
