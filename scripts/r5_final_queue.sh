#!/bin/bash
# Round-5 final catch-up queue: waits for the drill queue, then runs the
# remaining chip work highest-value-first. Whatever the round's wall-clock
# cuts off simply stays unrun — every item is idempotent and reports
# incrementally.
#   1. epoch-mix bench retry on the 2-D dataset (first attempt hit its
#      30-min timeout warming 18 fresh shape programs; the persistent
#      compile cache makes the retry mostly-warm)
#   2. composed-stabilizer spread (r4 VERDICT #4): ctl vs
#      update_clip+ema_decay on the GRU Uni phase, seeds 0..2, at 12
#      epochs per arm (r4 arms ran 20; the ctl-vs-combo contrast at equal
#      epochs is the measurement, and 12 epochs fits all three seeds in
#      the round's tail) — a spike census prints after every completed
#      seed pair so partial coverage still lands in the log
#   3. coverage-beta cells on the 2-D flagship (decode-lever check)
#   4. printed->handwritten calibration transfer (train 2 small models)
cd "$(dirname "$0")/.."

if [ -f /tmp/drillq5.pid ]; then
    while kill -0 "$(cat /tmp/drillq5.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== final queue starting $(date -u) ==="

echo "=== mix2d retry $(date -u) ==="
timeout 2700 python bench.py --mix --mix-data data/im2latex2dSyn \
    || echo "mix2d retry FAILED"

run_phase() {
    local out="$1"; shift
    [ -f "$out/.chain_done" ] && { echo "skip $out (done)"; return; }
    python scripts/train_im2latex_syn.py --out "$out/" "$@" || return 1
    touch "$out/.chain_done"
}

census() {
    python - <<'PYEOF'
import json, os

def census(path):
    losses = [json.loads(l)["loss"] for l in open(path) if '"loss"' in l]
    converged, n, in_spike, degraded = False, 0, False, 0
    for x in losses:
        if not converged:
            converged = x < 1.0
            continue
        if x > 1.0:
            degraded += 1
        if x > 3.0 and not in_spike:
            n, in_spike = n + 1, True
        elif x < 1.0:
            in_spike = False
    return {"spikes_gt3": n, "degraded_samples_gt1": degraded,
            "min_loss": round(min(losses), 4),
            "final_loss": round(losses[-1], 4)}

for seed in (0, 1, 2):
    for arm in ("ctl", "combo"):
        tag = f"results/gruSpread_{arm}_s{seed}"
        if os.path.exists(tag + "/metrics.jsonl"):
            print(json.dumps({"arm": f"{arm} s{seed}",
                              **census(tag + "/metrics.jsonl")}))
PYEOF
}

echo "=== composed-stabilizer spread $(date -u) ==="
run_phase results/im2latexEZ_gru --data-dir data/im2latexEZ \
    --clip 5.0 --dropout 1.0 --n-epochs 25 --batch-size 64 \
    --max-length 11 --lr-init 1e-3 --lr-min 1e-4 --cell-type gru \
    || echo "donor FAILED"
for SEED in 0 1 2; do
    run_phase "results/gruSpread_ctl_s${SEED}" --cell-type gru \
        --dropout 1.0 --n-epochs 12 --max-length 110 \
        --data-dir data/im2latexUni --warm-start results/im2latexEZ_gru \
        --clip 5.0 --seed "$SEED" || break
    run_phase "results/gruSpread_combo_s${SEED}" --cell-type gru \
        --dropout 1.0 --n-epochs 12 --max-length 110 \
        --data-dir data/im2latexUni --warm-start results/im2latexEZ_gru \
        --clip 5.0 --seed "$SEED" \
        --update-clip 1.0 --ema-decay 0.999 || break
    echo "=== spike census after seed ${SEED} $(date -u) ==="
    census
done

echo "=== coverage-beta cells (2-D flagship) $(date -u) ==="
timeout 3600 python scripts/sweep_beam_alpha.py \
    --results results/im2latex2dLong --data data/im2latex2dLong \
    --max-len 150 --beams 5 --alphas 0.6 --coverage-betas 0,0.2 \
    || echo "covbeta FAILED"

echo "=== printed->handwritten calibration transfer $(date -u) ==="
[ -d data/print5k ] || python scripts/build_synthetic.py --out data/print5k \
    --n-train 5000 --n-val 500 --n-test 500 --min-len 3 --max-len 20
[ -d data/hw5kStroke ] || python scripts/build_synthetic.py --out data/hw5kStroke \
    --n-train 5000 --n-val 500 --n-test 500 --min-len 3 --max-len 20 \
    --handwritten --hw-style stroke
[ -f results/print5k/.chain_done ] || {
    python scripts/train_handwritten.py --data-dir data/print5k \
        --out results/print5k/ --donor "" --seed 0 &&
    touch results/print5k/.chain_done
}
[ -f results/hw5kStroke_s0/.chain_done ] || {
    python scripts/train_handwritten.py --data-dir data/hw5kStroke \
        --out results/hw5kStroke_s0/ --donor results/print5k --seed 0 &&
    touch results/hw5kStroke_s0/.chain_done
}
python scripts/calibration_report.py --results results/print5k \
    --transfer results/hw5kStroke_s0 || echo "hwcalib FAILED"
echo "R5 FINAL QUEUE DONE $(date -u)"
