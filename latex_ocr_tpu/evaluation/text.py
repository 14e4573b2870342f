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
