#!/bin/bash
# GRU stability A/B (design.md §16.8): same data, same seed, same lr —
# ONLY the gradient-clip norm differs. The Uni phase is the chain's worst
# spiker (19 loss spikes >3.0 from converged at lr 5e-4 with the
# LSTM-tuned clip 5.0, r3 overnight run); §16.8's diagnosis says clip 5.0
# is ~500x the converged gradient scale and never engages. If the
# diagnosis is right, clip 1.0 kills the spikes without slowing
# convergence. Both runs warm-start from the SAME EZ-phase donor.
set -e
cd "$(dirname "$0")/.."

GRU=(--cell-type gru --dropout 1.0 --n-epochs 20 --max-length 110
     --data-dir data/im2latexUni --warm-start results/im2latexEZ_gru)

python scripts/train_im2latex_syn.py "${GRU[@]}" --clip 5.0 \
    --out results/gruClipAB_c5/
python scripts/train_im2latex_syn.py "${GRU[@]}" --clip 1.0 \
    --out results/gruClipAB_c1/

python - <<'EOF'
import json

def spikes(path):
    """loss excursions >3.0 after the run first converges below 1.0
    (the RESULTS.md 'Stability at scale' counting rule)."""
    losses = [json.loads(l)["loss"] for l in open(path) if '"loss"' in l]
    converged = False
    n, in_spike = 0, False
    for x in losses:
        if not converged:
            converged = x < 1.0
            continue
        if x > 3.0 and not in_spike:
            n += 1
            in_spike = True
        elif x < 1.0:
            in_spike = False
    return n, min(losses), losses[-1]

for tag in ("c5", "c1"):
    n, lo, last = spikes(f"results/gruClipAB_{tag}/metrics.jsonl")
    print(json.dumps({"clip": 5.0 if tag == "c5" else 1.0,
                      "spikes_gt3_from_converged": n,
                      "min_loss": round(lo, 4), "final_loss": round(last, 4)}))
EOF
echo "GRU CLIP AB DONE"
