#!/bin/bash
# GRU stability: ConvergenceGate measurement arm (design.md §16.8, round 4).
#
# Third same-seed arm on the worst-spiker phase (Uni, 20 epochs, lr 5e-4,
# same EZ donor, clip 5.0 — bit-comparable to results/gruClipAB_c5 and
# results/gruGuardAB). The clip A/B refuted tighter clipping; the
# SpikeGuard A/B refuted the reactive lr cooldown (recovery needs full
# lr). This arm tests the onset-side mechanism the two refutations point
# to: full schedule lr while grounding/recovering, capped at the measured
# spike-free 2e-4 once converged (utils/lr_schedule.py ConvergenceGate).
# Predictions if the mechanism analysis is right: ~zero post-convergence
# ignitions, no stuck-at-LM-floor budget loss, test EM >= the unguarded
# control's 61.0.
set -e
cd "$(dirname "$0")/.."

python scripts/train_im2latex_syn.py --cell-type gru --dropout 1.0 \
    --n-epochs 20 --max-length 110 --data-dir data/im2latexUni \
    --warm-start results/im2latexEZ_gru --clip 5.0 --converge-cap 2e-4 \
    --out results/gruGateAB/

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
                   ("results/gruGuardAB", "spike_guard (cooldown)"),
                   ("results/gruGateAB", "converge_cap 2e-4")):
    print(json.dumps({"arm": label, **census(tag + "/metrics.jsonl")}))
PYEOF
echo "GRU GATE AB DONE"
