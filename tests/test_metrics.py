"""Tests for text/image metrics — golden values match the reference
definitions (nltk corpus BLEU-4, Levenshtein ratio, exact match)."""

import numpy as np

from latex_ocr_tpu.evaluation.text import (
    bleu_score,
    edit_distance,
    exact_match_score,
    levenshtein,
    score_files,
    write_answers,
)
from latex_ocr_tpu.evaluation.image import img_edit_distance, score_dirs


def test_levenshtein_basics():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein([], [1, 2]) == 2
    assert levenshtein([1, 2, 3], [1, 2, 3]) == 0
    assert levenshtein(["a", "b"], ["b"]) == 1


def test_exact_match_and_edit_distance():
    refs = [["a", "b"], ["c"]]
    hyps = [["a", "b"], ["d"]]
    assert exact_match_score(refs, hyps) == 0.5
    # lev: 0 + 1; maxlen: 2 + 1 -> 1 - 1/3
    assert abs(edit_distance(refs, hyps) - (1 - 1 / 3)) < 1e-9


def test_bleu_perfect_match():
    refs = [["a", "b", "c", "d", "e"]]
    assert abs(bleu_score(refs, refs) - 1.0) < 1e-9


def test_write_answers_and_score_files(tmp_path):
    rev_vocab = {0: "x", 1: "y", 2: "_END"}
    refs = [[0, 1, 2], [1, 2]]
    hyps = [[[0, 1, 2], [1, 2]]]  # perfect hypotheses (rank 0)
    files = write_answers(refs, hyps, rev_vocab, str(tmp_path) + "/", id_end=2)
    assert len(files) == 2
    scores = score_files(files[0], files[1])
    assert scores["ExactMatchScore"] == 100.0
    assert scores["EditDistance"] == 100.0


def test_img_edit_distance_identical_and_shifted():
    img = np.full((8, 6, 1), 255, np.uint8)
    img[2:5, 1:3, 0] = 0
    dist, length = img_edit_distance(img, img)
    assert dist == 0 and length == 6.0
    shifted = np.roll(img, 1, axis=1)
    dist2, _ = img_edit_distance(img, shifted)
    assert dist2 > 0


def test_score_dirs_missing_hyp(tmp_path):
    from PIL import Image

    ref_dir = tmp_path / "ref"
    hyp_dir = tmp_path / "hyp"
    ref_dir.mkdir()
    hyp_dir.mkdir()
    arr = np.full((8, 6), 255, np.uint8)
    arr[2:4, 2:4] = 0
    Image.fromarray(arr).save(ref_dir / "0.png")
    Image.fromarray(arr).save(ref_dir / "1.png")
    Image.fromarray(arr).save(hyp_dir / "0.png")  # hyp 1 missing

    prepro = lambda x: x[:, :, None] if x.ndim == 2 else x
    scores = score_dirs(str(ref_dir) + "/", str(hyp_dir) + "/", prepro)
    assert scores["EM"] == 0.5  # one exact, one full miss
    assert 0 < scores["Lev"] < 1


def test_metrics_writer_jsonl_and_tensorboard(tmp_path, monkeypatch):
    """Scalars land in metrics.jsonl and, when a TB backend is importable,
    as real event files under <run>/tb/ (reference parity: base.py:85-93)."""
    import json

    from latex_ocr_tpu.utils.metrics import MetricsWriter

    # conftest disables TB suite-wide (torch import cost); re-enable here —
    # this is the one test that pins the event-file parity behavior
    monkeypatch.delenv("LATEX_OCR_NO_TB", raising=False)
    w = MetricsWriter(str(tmp_path))
    w.write(0, {"loss": 1.5}, epoch=0)
    w.write(10, {"loss": 0.5, "lr": 1e-3}, epoch=0)
    w.close()

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [l["step"] for l in lines] == [0, 10]
    assert lines[1]["lr"] == 1e-3

    try:
        from torch.utils.tensorboard import SummaryWriter  # noqa: F401
        has_tb = True
    except Exception:
        has_tb = False
    if has_tb:
        tb_dir = tmp_path / "tb"
        events = list(tb_dir.glob("events.out.tfevents.*"))
        assert events, "TB backend available but no event file written"


def test_fit_temperature_and_calibration_report():
    """Temperature fitting recovers a known miscalibration and ECE drops
    after scaling; reliability rows are well-formed."""
    import numpy as np

    from latex_ocr_tpu.evaluation.text import (calibration_report,
                                               fit_temperature)

    rng = np.random.default_rng(0)
    n = 4000
    # true probability of correctness per sample
    p_true = rng.uniform(0.05, 0.95, n)
    correct = rng.random(n) < p_true
    # model reports OVERCONFIDENT log-probs: s = 0.4 * log p  (p^0.4 > p)
    scores = 0.4 * np.log(p_true)
    T = fit_temperature(scores, correct)
    # recovering the true probabilities needs s / T = log p  => T ~= 0.4
    assert 0.25 < T < 0.6, T
    rep = calibration_report(scores, correct, temperature=T)
    assert rep["ece_calibrated"] < rep["ece_raw"] * 0.5, rep
    rows = [r for r in rep["reliability"] if r[4]]
    assert rows and all(0.0 <= r[2] <= 1.0 and 0.0 <= r[3] <= 1.0 for r in rows)

    # degenerate outcomes: no fit
    assert fit_temperature([-0.1, -0.2], [True, True]) == 1.0
    assert fit_temperature([], []) == 1.0
