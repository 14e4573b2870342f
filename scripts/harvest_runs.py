#!/usr/bin/env python
"""Re-score finished runs' test artifacts into one table (no chip needed).

Each training run writes decode artifacts (`formulas_test/ref.txt`,
`hyp_0.txt`) and logs the final `- Eval:` line (with perplexity) to
`model.log`. This harvester recomputes BLEU-4/EM/EditDistance from the
artifacts with the canonical scorer (evaluation/text.py — byte-identical
to what the trainer logged) and pulls the last logged perplexity, so
results can be tabulated after the fact even if the queue log is gone.

    python scripts/harvest_runs.py results/gruSpread_* results/im2latex2d*_lstm
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def harvest(run: str):
    from latex_ocr_tpu.evaluation.text import score_files

    run = run.rstrip("/")
    ref = os.path.join(run, "formulas_test", "ref.txt")
    hyp = os.path.join(run, "formulas_test", "hyp_0.txt")
    if not (os.path.exists(ref) and os.path.exists(hyp)):
        return {"run": run, "status": "no test artifacts"}
    scores = score_files(ref, hyp)
    ppl = None
    log = os.path.join(run, "model.log")
    if os.path.exists(log):
        for line in open(log):
            m = re.search(r"perplexity is ([0-9.]+)", line)
            if m:
                ppl = float(m.group(1))  # keep last
    out = {"run": run, **{k: round(v, 2) for k, v in scores.items()}}
    if ppl is not None:
        out["ppl_last_eval"] = ppl
    return out


def main():
    runs = sys.argv[1:]
    if not runs:
        print(__doc__)
        return
    rows = [harvest(r) for r in runs]
    for r in rows:
        print(json.dumps(r), flush=True)
    ok = [r for r in rows if "ExactMatchScore" in r]
    if ok:
        print("\n| run | BLEU-4 | EM | EditDist |")
        print("|---|---|---|---|")
        for r in ok:
            print(f"| {r['run']} | {r['BLEU-4']:.2f} | "
                  f"{r['ExactMatchScore']:.2f} | {r['EditDistance']:.2f} |")


if __name__ == "__main__":
    main()
