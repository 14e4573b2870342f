#!/bin/bash
# GRU stabilizer spread (r4): seeds 1 and 2 for the unguarded control and
# the composed mechanism arm (update_clip 1.0 + ema_decay 0.999), on the
# worst-spiker phase. Seed 0 pairs already exist (results/gruClipAB_c5,
# results/gruComboAB). --seed drives the epoch reshuffle, so each seed is
# a genuinely distinct SGD trajectory (the r3 "3-seed fiction" lesson).
# Upgrades the stabilizer recommendation from one-seed directional to a
# 3-pair spread.
set -e
cd "$(dirname "$0")/.."

for SEED in 1 2; do
    python scripts/train_im2latex_syn.py --cell-type gru --dropout 1.0 \
        --n-epochs 20 --max-length 110 --data-dir data/im2latexUni \
        --warm-start results/im2latexEZ_gru --clip 5.0 --seed "$SEED" \
        --out "results/gruSpread_ctl_s${SEED}/"
    python scripts/train_im2latex_syn.py --cell-type gru --dropout 1.0 \
        --n-epochs 20 --max-length 110 --data-dir data/im2latexUni \
        --warm-start results/im2latexEZ_gru --clip 5.0 --seed "$SEED" \
        --update-clip 1.0 --ema-decay 0.999 \
        --out "results/gruSpread_combo_s${SEED}/"
done

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
            degraded += 1
        if x > 3.0 and not in_spike:
            n += 1
            in_spike = True
        elif x < 1.0:
            in_spike = False
    return {"spikes_gt3": n, "degraded_samples_gt1": degraded,
            "min_loss": round(min(losses), 4),
            "final_loss": round(losses[-1], 4)}

for tag, label in (("results/gruClipAB_c5", "control s0"),
                   ("results/gruComboAB", "combo s0"),
                   ("results/gruSpread_ctl_s1", "control s1"),
                   ("results/gruSpread_combo_s1", "combo s1"),
                   ("results/gruSpread_ctl_s2", "control s2"),
                   ("results/gruSpread_combo_s2", "combo s2")):
    print(json.dumps({"arm": label, **census(tag + "/metrics.jsonl")}))
PYEOF
echo "GRU SEED SPREAD DONE"
