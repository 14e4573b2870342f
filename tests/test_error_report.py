"""Tests for evaluation.report (decode-error breakdown).

Artifact layout matches the reference's write_answers output
(reference model/evaluation/text.py:107-145): one formula per line,
ref.txt / hyp_0.txt paired by line number.
"""

from latex_ocr_tpu.evaluation.report import analyze_answers, format_report


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_analyze_answers_breakdown(tmp_path):
    refs = [
        "a b c",                    # exact
        "a _UNK b",                 # OOV line, exact
        "a _UNK c",                 # OOV line, missed (substitution)
        "x y z w",                  # overcalled _UNK (in-vocab -> _UNK)
        "p q",                      # length-mismatch miss
        " ".join(["t"] * 30),       # long line, exact
    ]
    hyps = [
        "a b c",
        "a _UNK b",
        "a \\ast c",
        "x _UNK z w",
        "p q r",
        " ".join(["t"] * 30),
    ]
    r = analyze_answers(
        _write(tmp_path, "ref.txt", refs),
        _write(tmp_path, "hyp_0.txt", hyps),
        length_bucket=25,
    )
    assert r["n"] == 6 and r["misses"] == 3
    assert r["exact_match"] == 50.0
    assert r["oov_lines"] == {"total": 2, "exact": 1}
    assert r["overcalled_unk_misses"] == 1
    assert r["by_length"]["0-24"] == {"missed": 3, "total": 5}
    assert r["by_length"]["25-49"] == {"missed": 0, "total": 1}
    pairs = {(c["ref"], c["hyp"]) for c in r["top_confusions"]}
    assert ("_UNK", "\\ast") in pairs and ("y", "_UNK") in pairs

    text = format_report(r)
    assert "exact match 50.00%" in text
    assert "OOV lines" in text and "1/2 exact" in text


def test_analyze_answers_all_exact(tmp_path):
    refs = ["a b", "c d e"]
    r = analyze_answers(
        _write(tmp_path, "ref.txt", refs),
        _write(tmp_path, "hyp_0.txt", refs),
    )
    assert r["misses"] == 0 and r["exact_match"] == 100.0
    assert r["overcalled_unk_misses"] == 0 and r["top_confusions"] == []
    assert r["dropped_unpaired_lines"] == 0


def test_truncated_hyp_artifact_is_flagged(tmp_path):
    """A partial hyp file (crashed evaluate) must not read as a clean
    report over the surviving prefix."""
    refs = ["a b", "c d", "e f", "g h"]
    r = analyze_answers(
        _write(tmp_path, "ref.txt", refs),
        _write(tmp_path, "hyp_0.txt", refs[:1]),
    )
    assert r["n"] == 1 and r["dropped_unpaired_lines"] == 3
    assert "WARNING" in format_report(r)


def test_selective_report_math(tmp_path):
    """EM at confidence coverage: sorting by score descending, coverage-P
    EM counts only the top P% — the rejection operating curve."""
    from latex_ocr_tpu.evaluation.text import selective_report

    refs = ["a b", "c d", "e f", "g h"]
    hyps = ["a b", "c d", "x x", "y y"]  # first two correct
    # confidences separate correct (high) from wrong (low), one inversion
    scores = [-0.1, -0.3, -0.2, -5.0]
    rp = tmp_path / "ref.txt"
    hp = tmp_path / "hyp.txt"
    rp.write_text("\n".join(refs) + "\n")
    hp.write_text("\n".join(hyps) + "\n")
    rep = selective_report(str(rp), str(hp), scores)
    assert rep["EM_cov100"] == 50.0
    # top 50% by score = lines 0 (-0.1) and 2 (-0.2): one correct
    assert rep["EM_cov50"] == 50.0
    # top 75% = lines 0, 2, 1 -> 2/3 correct
    assert abs(rep["EM_cov75"] - 100.0 * 2 / 3) < 1e-9
    assert rep["conf_correct_mean"] == (-0.1 - 0.3) / 2
    assert rep["conf_wrong_mean"] == (-0.2 - 5.0) / 2
    assert rep["conf_at_cov50"] == -0.2
