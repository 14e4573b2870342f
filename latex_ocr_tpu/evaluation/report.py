"""Decode-error breakdown over ref/hyp prediction artifacts.

Consumes the ``ref.txt`` / ``hyp_i.txt`` files that evaluation persists
(same artifact layout as the reference's write_answers, reference
model/evaluation/text.py:107-145) and segments the misses along the axes
that have driven quality work on this framework: formula length, OOV
lines (reference form_prepro maps out-of-vocab tokens to ``_UNK``,
reference model/utils/text.py:26-40), overcalled-``_UNK`` substitutions,
and token-level confusion pairs.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List

UNK = "_UNK"


def analyze_answers(
    path_ref: str,
    path_hyp: str,
    length_bucket: int = 25,
    top_confusions: int = 10,
) -> Dict:
    """Return a JSON-serializable error breakdown of hyp vs ref."""
    # read directly (one formula per line, paired by line number) — the
    # load_formulas helper prints progress, which would pollute --json output
    with open(path_ref) as f:
        refs = [ln.strip() for ln in f]
    with open(path_hyp) as f:
        hyps = [ln.strip() for ln in f]
    n = min(len(refs), len(hyps))
    # a partial hyp file (crashed evaluate) must not masquerade as a clean
    # report over the surviving prefix — carry the dropped count
    dropped = max(len(refs), len(hyps)) - n
    refs, hyps = refs[:n], hyps[:n]

    by_length: Dict[int, List[int]] = {}  # bucket lo -> [misses, total]
    oov_total = oov_hit = 0
    overcalled_unk = 0
    confusions: Counter = Counter()
    misses = 0

    for r, h in zip(refs, hyps):
        rt, ht = r.split(), h.split()
        lo = (len(rt) // length_bucket) * length_bucket
        bucket = by_length.setdefault(lo, [0, 0])
        bucket[1] += 1
        is_oov = UNK in rt
        if is_oov:
            oov_total += 1
        if r == h:
            if is_oov:
                oov_hit += 1
            continue
        misses += 1
        bucket[0] += 1
        if len(rt) == len(ht):
            subs = [(a, b) for a, b in zip(rt, ht) if a != b]
            confusions.update(subs)
            if not is_oov and any(b == UNK for _, b in subs):
                overcalled_unk += 1

    return {
        "n": n,
        "dropped_unpaired_lines": dropped,
        "exact_match": round(100.0 * (n - misses) / max(n, 1), 3),
        "misses": misses,
        "by_length": {
            f"{lo}-{lo + length_bucket - 1}": {"missed": m, "total": t}
            for lo, (m, t) in sorted(by_length.items())
        },
        "oov_lines": {"total": oov_total, "exact": oov_hit},
        "overcalled_unk_misses": overcalled_unk,
        "top_confusions": [
            {"ref": a, "hyp": b, "count": c}
            for (a, b), c in confusions.most_common(top_confusions)
        ],
    }


def format_report(report: Dict) -> str:
    lines = [
        f"n={report['n']}  exact match {report['exact_match']:.2f}%  "
        f"({report['misses']} misses)",
    ]
    if report.get("dropped_unpaired_lines"):
        lines.append(
            f"WARNING: ref/hyp line counts differ — "
            f"{report['dropped_unpaired_lines']} unpaired lines dropped "
            "(truncated or mismatched artifact?)"
        )
    lines += [
        "",
        "| ref length | missed / total |",
        "|---|---|",
    ]
    for rng, row in report["by_length"].items():
        lines.append(f"| {rng} | {row['missed']} / {row['total']} |")
    oov = report["oov_lines"]
    lines += [
        "",
        f"OOV lines (ref contains {UNK}): {oov['exact']}/{oov['total']} exact",
        f"overcalled-{UNK} misses (in-vocab token decoded as {UNK}): "
        f"{report['overcalled_unk_misses']}",
    ]
    if report["top_confusions"]:
        lines += ["", "top token confusions (ref -> hyp):"]
        for c in report["top_confusions"]:
            lines.append(f"  {c['ref']} -> {c['hyp']}  x{c['count']}")
    return "\n".join(lines)
