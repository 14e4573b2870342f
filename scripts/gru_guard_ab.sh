#!/bin/bash
# GRU stability: SpikeGuard measurement arm (design.md §16.8, round 4).
# The clip A/B refuted tighter clipping; this runs the SAME worst-spiker
# phase (Uni, 20 epochs, lr 5e-4, same EZ donor, same seed, clip 5.0 —
# bit-comparable to results/gruClipAB_c5) with the loss-spike lr cooldown
# on, and reports the census side by side: spike count, steps spent
# degraded (loss > 1.0 after first convergence), final loss, test EM.
set -e
cd "$(dirname "$0")/.."

python scripts/train_im2latex_syn.py --cell-type gru --dropout 1.0 \
    --n-epochs 20 --max-length 110 --data-dir data/im2latexUni \
    --warm-start results/im2latexEZ_gru --clip 5.0 --spike-guard \
    --out results/gruGuardAB/

python - <<'PYEOF'
import json

def census(path):
    losses = [json.loads(l)["loss"] for l in open(path) if '"loss"' in l]
    converged = False
    n, in_spike, degraded = 0, False, 0
    for x in losses:
        if not converged:
            converged = x < 1.0
            continue
        if x > 1.0:
            degraded += 1  # sampled rows spent off the converged floor
        if x > 3.0 and not in_spike:
            n += 1
            in_spike = True
        elif x < 1.0:
            in_spike = False
    return {"spikes_gt3": n, "degraded_samples_gt1": degraded,
            "min_loss": round(min(losses), 4),
            "final_loss": round(losses[-1], 4), "n_samples": len(losses)}

for tag, label in (("results/gruClipAB_c5", "control (clip 5.0)"),
                   ("results/gruGuardAB", "spike_guard (clip 5.0)")):
    print(json.dumps({"arm": label, **census(tag + "/metrics.jsonl")}))
PYEOF
echo "GRU GUARD AB DONE"
