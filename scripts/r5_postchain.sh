#!/bin/bash
# Round-5 post-chain chip queue: waits for the 2-D chain (/tmp/chain2d.pid),
# then runs the remaining chip-bound verdict items:
#   1. composed stabilizer arm at 3 seeds (r4 VERDICT #4): control vs
#      update_clip 1.0 + ema_decay 0.999 on the GRU Uni phase, seeds
#      {0,1,2} — needs the flat EZ GRU donor rebuilt first (results/ is
#      not kept between rounds).
#   2. epoch-mix bench (r4 VERDICT #3) over the 2-D dataset through the
#      cached product pipeline.
set -e
cd "$(dirname "$0")/.."

if [ -f /tmp/chain2d.pid ]; then
    while kill -0 "$(cat /tmp/chain2d.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== chain2d finished; postchain starting $(date -u) ==="

# flat EZ GRU donor (train_im2latex_gru.sh A0 settings, verbatim)
[ -f results/im2latexEZ_gru/.chain_done ] || {
    python scripts/train_im2latex_syn.py --data-dir data/im2latexEZ \
        --out results/im2latexEZ_gru/ --clip 5.0 --dropout 1.0 --n-epochs 25 \
        --batch-size 64 --max-length 11 --lr-init 1e-3 --lr-min 1e-4 \
        --cell-type gru
    touch results/im2latexEZ_gru/.chain_done
}

for SEED in 0 1 2; do
    [ -f "results/gruSpread_ctl_s${SEED}/.chain_done" ] || {
        python scripts/train_im2latex_syn.py --cell-type gru --dropout 1.0 \
            --n-epochs 20 --max-length 110 --data-dir data/im2latexUni \
            --warm-start results/im2latexEZ_gru --clip 5.0 --seed "$SEED" \
            --out "results/gruSpread_ctl_s${SEED}/"
        touch "results/gruSpread_ctl_s${SEED}/.chain_done"
    }
    [ -f "results/gruSpread_combo_s${SEED}/.chain_done" ] || {
        python scripts/train_im2latex_syn.py --cell-type gru --dropout 1.0 \
            --n-epochs 20 --max-length 110 --data-dir data/im2latexUni \
            --warm-start results/im2latexEZ_gru --clip 5.0 --seed "$SEED" \
            --update-clip 1.0 --ema-decay 0.999 \
            --out "results/gruSpread_combo_s${SEED}/"
        touch "results/gruSpread_combo_s${SEED}/.chain_done"
    }
done

echo "=== spike census $(date -u) ==="
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

for seed in (0, 1, 2):
    for arm in ("ctl", "combo"):
        tag = f"results/gruSpread_{arm}_s{seed}"
        print(json.dumps({"arm": f"{arm} s{seed}",
                          **census(tag + "/metrics.jsonl")}))
PYEOF

echo "=== epoch-mix bench $(date -u) ==="
python bench.py --mix --mix-data data/im2latex2dSyn
echo "R5 POSTCHAIN DONE $(date -u)"
