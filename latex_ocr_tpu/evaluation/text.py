"""Text metrics: BLEU-4, exact match, token edit distance, answer files.

Same metric definitions as the reference (model/evaluation/text.py:12-145):
nltk corpus BLEU-4 with uniform 0.25 weights, 1 - Σlev/Σmaxlen token
Levenshtein ratio, exact sequence match, and the ref.txt / hyp_i.txt
answer-file layout. Levenshtein is implemented natively (the `distance`
pypi package is not available) with a two-row DP.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import nltk

from ..data.vocab import load_formulas, truncate_end
from ..utils.general import init_dir

__all__ = [
    "bleu_score",
    "edit_distance",
    "exact_match_score",
    "levenshtein",
    "score_files",
    "truncate_end",
    "write_answers",
]


def levenshtein(a: Sequence, b: Sequence) -> int:
    """Classic edit distance (insert/delete/substitute, all cost 1)."""
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        curr = [i]
        for j, cb in enumerate(b, 1):
            curr.append(min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = curr
    return prev[-1]


def score_files(path_ref: str, path_hyp: str) -> Dict[str, float]:
    """Score a hypothesis file against a reference file (×100 metrics)."""
    formulas_ref = load_formulas(path_ref)
    formulas_hyp = load_formulas(path_hyp)
    assert len(formulas_ref) == len(formulas_hyp)

    refs = [ref.split(" ") for _, ref in formulas_ref.items()]
    hyps = [hyp.split(" ") for _, hyp in formulas_hyp.items()]

    return {
        "BLEU-4": bleu_score(refs, hyps) * 100,
        "ExactMatchScore": exact_match_score(refs, hyps) * 100,
        "EditDistance": edit_distance(refs, hyps) * 100,
    }


def exact_match_score(references: Sequence, hypotheses: Sequence) -> float:
    matches = sum(1 for r, h in zip(references, hypotheses) if list(r) == list(h))
    return matches / float(max(len(hypotheses), 1))


def bleu_score(references: Sequence, hypotheses: Sequence) -> float:
    wrapped = [[list(r)] for r in references]
    return nltk.translate.bleu_score.corpus_bleu(
        wrapped, [list(h) for h in hypotheses], weights=(0.25, 0.25, 0.25, 0.25)
    )


def edit_distance(references: Sequence, hypotheses: Sequence) -> float:
    """1 - Σ levenshtein / Σ max(len) over the corpus; 1 is perfect."""
    d_total, len_total = 0, 0
    for ref, hyp in zip(references, hypotheses):
        d_total += levenshtein(list(ref), list(hyp))
        len_total += max(len(ref), len(hyp))
    return 1.0 - d_total / float(max(len_total, 1))


def write_answers(
    references: Sequence[Sequence[int]],
    hypotheses: Sequence[Sequence[Sequence[int]]],
    rev_vocab: Dict[int, str],
    dir_name: str,
    id_end: int,
) -> List[str]:
    """Write ref.txt plus hyp_i.txt per hypothesis rank; returns paths."""

    def to_str(ids) -> str:
        return " ".join(rev_vocab[int(i)] for i in truncate_end(ids, id_end))

    init_dir(dir_name)
    paths = [os.path.join(dir_name, "ref.txt")]
    with open(paths[0], "w") as f:
        for ref in references:
            f.write(to_str(ref) + "\n")
    for i, hyp_list in enumerate(hypotheses):
        assert len(references) == len(hyp_list)
        path = os.path.join(dir_name, f"hyp_{i}.txt")
        with open(path, "w") as f:
            for hyp in hyp_list:
                f.write(to_str(hyp) + "\n")
        paths.append(path)
    return paths


def selective_report(
    path_ref: str, path_hyp: str, scores: Sequence[float]
) -> Dict[str, float]:
    """Selective-prediction report: quality when low-confidence outputs
    are rejected.

    ``scores`` are per-line confidences (``decode_step_scored``: sequence
    log-probs, or beam re-rank scores), aligned with the ref/hyp files.
    Sorting by confidence descending, ``EM_cov{P}`` is the exact-match
    rate among the top P% most-confident predictions — the operating
    curve a production deployment reads to pick a rejection threshold
    ("accept the top 90%, route the rest to review"). Also reports the
    mean confidence of correct vs incorrect lines (separation is what
    makes rejection work) and the confidence threshold at each coverage.
    """
    import numpy as np

    with open(path_ref) as f:
        refs = [line.strip() for line in f]
    with open(path_hyp) as f:
        hyps = [line.strip() for line in f]
    scores = np.asarray(list(scores), dtype=np.float64)
    assert len(refs) == len(hyps) == len(scores), (
        len(refs), len(hyps), len(scores))
    if len(refs) == 0:
        return {}
    correct = np.array([r == h for r, h in zip(refs, hyps)], dtype=bool)
    order = np.argsort(-scores)
    out: Dict[str, float] = {}
    n = len(refs)
    for pct in (100, 90, 75, 50):
        k = max(1, int(round(n * pct / 100.0)))
        top = order[:k]
        out[f"EM_cov{pct}"] = 100.0 * float(correct[top].mean())
        out[f"conf_at_cov{pct}"] = float(scores[order[k - 1]])
    if correct.any():
        out["conf_correct_mean"] = float(scores[correct].mean())
    if (~correct).any():
        out["conf_wrong_mean"] = float(scores[~correct].mean())
    return out


def fit_temperature(scores: Sequence[float], correct: Sequence[bool]) -> float:
    """Fit a temperature T for sequence-level confidence calibration.

    ``scores`` are sequence log-probs (decode_step_scored); the model's
    implied probability-of-correct is ``exp(s)``, and temperature scaling
    rescales it to ``exp(s / T)``. T minimizes the NLL of the binary
    exact-match outcomes (the standard Guo et al. 2017 recipe, applied at
    the sequence level since selective prediction consumes sequence
    confidences). Pure-numpy golden-section search over log T.
    """
    import numpy as np

    s = np.asarray(list(scores), dtype=np.float64)
    c = np.asarray(list(correct), dtype=bool)
    if len(s) == 0 or c.all() or not c.any():
        # degenerate outcomes (all right / all wrong): no signal to fit
        return 1.0

    def nll(log_t: float) -> float:
        p = np.exp(np.minimum(0.0, s / np.exp(log_t)))
        p = np.clip(p, 1e-12, 1.0 - 1e-12)
        return float(-(np.log(p[c]).sum() + np.log(1.0 - p[~c]).sum()))

    lo, hi = -4.0, 4.0
    gr = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    x1 = b - gr * (b - a)
    x2 = a + gr * (b - a)
    f1, f2 = nll(x1), nll(x2)
    for _ in range(60):
        if f1 < f2:
            b, x2, f2 = x2, x1, f1
            x1 = b - gr * (b - a)
            f1 = nll(x1)
        else:
            a, x1, f1 = x1, x2, f2
            x2 = a + gr * (b - a)
            f2 = nll(x2)
    return float(np.exp((a + b) / 2.0))


def calibration_report(
    scores: Sequence[float],
    correct: Sequence[bool],
    temperature: float = 1.0,
    n_bins: int = 10,
) -> Dict[str, object]:
    """ECE + reliability table for sequence-level confidences.

    ``temperature`` rescales log-prob scores (fit it on a HELD-OUT split
    with fit_temperature; fitting and evaluating on the same data
    understates miscalibration). Returns ECE for the raw (T=1) and
    temperature-scaled confidences plus the scaled reliability table
    [(bin_lo, bin_hi, mean_conf, accuracy, count), ...] — a calibrated
    model's mean_conf tracks accuracy in every bin.
    """
    import numpy as np

    s = np.asarray(list(scores), dtype=np.float64)
    c = np.asarray(list(correct), dtype=np.float64)
    if len(s) == 0:
        return {}

    def _ece(p: "np.ndarray"):
        edges = np.linspace(0.0, 1.0, n_bins + 1)
        ece = 0.0
        rows = []
        for i in range(n_bins):
            m = (p >= edges[i]) & (p < edges[i + 1] if i < n_bins - 1 else p <= edges[i + 1])
            if not m.any():
                rows.append((float(edges[i]), float(edges[i + 1]), None, None, 0))
                continue
            conf = float(p[m].mean())
            acc = float(c[m].mean())
            ece += (m.sum() / len(p)) * abs(conf - acc)
            rows.append((float(edges[i]), float(edges[i + 1]), conf, acc, int(m.sum())))
        return float(ece), rows

    p_raw = np.exp(np.minimum(0.0, s))
    p_cal = np.exp(np.minimum(0.0, s / max(1e-9, temperature)))
    ece_raw, _ = _ece(p_raw)
    ece_cal, rows = _ece(p_cal)
    return {
        "temperature": float(temperature),
        "ece_raw": ece_raw,
        "ece_calibrated": ece_cal,
        "reliability": rows,
    }
