#!/bin/bash
# Round-5 master chip queue (replaces r5_postchain.sh + r5_calibration_queue.sh
# + r5_roofline_queue.sh as ONE priority-ordered chain; those scripts' waiters
# were killed when this took over — their work items appear below, reordered
# by VERDICT priority so wall-clock truncation costs the least-valuable leg).
#
# Order (after the 2-D flagship chain + beam sweep, /tmp/chain2d.pid):
#   1. attention GIF on a 2-D \frac image          (VERDICT #1, minutes)
#   2. epoch-mix bench over the 2-D dataset         (VERDICT #3 datum)
#   3. calibration report w/ cross-domain transfer  (VERDICT #7)
#   4. roofline decomposition + headline bench      (VERDICT #8)
#   5. LSTM + GRU chains on the 2-D raster          (VERDICT #1 family table;
#      B/C phases abbreviated 60->30 / 14->10 epochs to fit the round)
#   6. composed-stabilizer spread, 3 seeds x 2 arms (VERDICT #4) + census
#   7. (optional) printed->handwritten calibration transfer
#   8. (optional) coverage-beta cells on the 2-D flagship
# Every leg is idempotent (.chain_done markers) and failure-isolated.
cd "$(dirname "$0")/.."

if [ -f /tmp/chain2d.pid ]; then
    while kill -0 "$(cat /tmp/chain2d.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== master queue starting $(date -u) ==="

leg() {  # leg <name> <cmd...>: run once, isolate failures
    local name="$1"; shift
    [ -f "/tmp/r5leg_${name}.done" ] && { echo "skip leg $name (done)"; return; }
    echo "=== leg $name START $(date -u) ==="
    if "$@"; then
        touch "/tmp/r5leg_${name}.done"
        echo "=== leg $name DONE $(date -u) ==="
    else
        echo "=== leg $name FAILED ($?) $(date -u) ==="
    fi
}

# ---- 1. attention GIF on a fraction (2-D flagship) ----------------------
gif_leg() {
    local img
    img=$(python - <<'PYEOF'
# pick a short test formula containing \frac and print its image path
lines = [l.strip() for l in open("data/im2latex2dSyn/test.formulas.norm.txt")]
match = [l.split() for l in open("data/im2latex2dSyn/test.matching.txt")]
best = None
for png, idx in match:
    f = lines[int(idx)]
    toks = f.split()
    if "\\frac" in toks and 6 <= len(toks) <= 14:
        if best is None or len(toks) < best[1]:
            best = (png, len(toks), f)
if best is None:  # fall back to any \frac
    for png, idx in match:
        f = lines[int(idx)]
        if "\\frac" in f:
            best = (png, len(f.split()), f)
            break
print("data/im2latex2dSyn/images_test/" + best[0])
import sys
print("formula: " + best[2], file=sys.stderr)
PYEOF
)
    echo "GIF image: $img"
    timeout 900 python visualize_attention.py --results results/im2latex2dLong \
        --image "$img" --output results/images/vis2d/
}
leg gif gif_leg

# ---- 2. epoch-mix bench over the 2-D dataset ----------------------------
leg mix2d timeout 1800 python bench.py --mix --mix-data data/im2latex2dSyn

# ---- 3. calibration report: flagship 2-D + cross-domain transfer --------
leg calib2d timeout 1800 python scripts/calibration_report.py \
    --results results/im2latex2dLong --transfer results/im2latex2dSyn

# ---- 4. roofline + headline bench ---------------------------------------
leg roofline timeout 2400 python scripts/roofline_flagship.py --steps 20 --rounds 4
leg bench_headline timeout 1200 python bench.py

# ---- 5. family chains on the 2-D raster (abbreviated B/C) ---------------
run_phase() {  # run_phase <out-dir> <args...>
    local out="$1"; shift
    [ -f "$out/.chain_done" ] && { echo "skip $out (done)"; return; }
    python scripts/train_im2latex_syn.py --out "$out/" "$@" || return 1
    touch "$out/.chain_done"
}

lstm2d_leg() {
    run_phase results/im2latex2dEZ_lstm --data-dir data/im2latex2dEZ \
        --dropout 1.0 --n-epochs 25 --batch-size 64 --max-length 11 \
        --lr-init 1e-3 --lr-min 1e-4 &&
    run_phase results/im2latex2dUni_lstm --data-dir data/im2latex2dUni \
        --dropout 1.0 --n-epochs 20 --max-length 110 \
        --warm-start results/im2latex2dEZ_lstm &&
    run_phase results/im2latex2dSyn_lstm --data-dir data/im2latex2dSyn \
        --dropout 1.0 --n-epochs 30 --warm-start results/im2latex2dUni_lstm &&
    run_phase results/im2latex2dSynFinal_lstm --data-dir data/im2latex2dSyn \
        --dropout 1.0 --n-epochs 10 --warm-start results/im2latex2dSyn_lstm \
        --lr-init 2e-4 --lr-min 2e-5 --start-decay 1126 --end-decay 6756
}
leg lstm2d lstm2d_leg

gru2d_leg() {
    run_phase results/im2latex2dEZ_gru --data-dir data/im2latex2dEZ \
        --cell-type gru --clip 5.0 --dropout 1.0 --n-epochs 25 \
        --batch-size 64 --max-length 11 --lr-init 1e-3 --lr-min 1e-4 &&
    run_phase results/im2latex2dUni_gru --data-dir data/im2latex2dUni \
        --cell-type gru --clip 5.0 --dropout 1.0 --n-epochs 20 \
        --max-length 110 --warm-start results/im2latex2dEZ_gru &&
    run_phase results/im2latex2dSyn_gru --data-dir data/im2latex2dSyn \
        --cell-type gru --clip 5.0 --dropout 1.0 --n-epochs 30 \
        --warm-start results/im2latex2dUni_gru &&
    run_phase results/im2latex2dSynFinal_gru --data-dir data/im2latex2dSyn \
        --cell-type gru --dropout 1.0 --n-epochs 10 \
        --warm-start results/im2latex2dSyn_gru \
        --lr-init 2e-4 --lr-min 2e-5 --start-decay 1126 --end-decay 6756
}
leg gru2d gru2d_leg

# ---- 6. composed-stabilizer spread (3 seeds x {ctl, combo}) --------------
census() {  # tolerant spike census over whatever spread runs exist
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

spread_leg() {
    run_phase results/im2latexEZ_gru --data-dir data/im2latexEZ \
        --clip 5.0 --dropout 1.0 --n-epochs 25 --batch-size 64 \
        --max-length 11 --lr-init 1e-3 --lr-min 1e-4 --cell-type gru || return 1
    for SEED in 0 1 2; do
        run_phase "results/gruSpread_ctl_s${SEED}" --cell-type gru \
            --dropout 1.0 --n-epochs 20 --max-length 110 \
            --data-dir data/im2latexUni --warm-start results/im2latexEZ_gru \
            --clip 5.0 --seed "$SEED" || return 1
        run_phase "results/gruSpread_combo_s${SEED}" --cell-type gru \
            --dropout 1.0 --n-epochs 20 --max-length 110 \
            --data-dir data/im2latexUni --warm-start results/im2latexEZ_gru \
            --clip 5.0 --seed "$SEED" \
            --update-clip 1.0 --ema-decay 0.999 || return 1
        echo "=== spike census after seed ${SEED} $(date -u) ==="
        census
    done
}
leg spread spread_leg

# ---- 7. optional: printed->handwritten calibration transfer --------------
hwcalib_leg() {
    [ -d data/print5k ] || python scripts/build_synthetic.py --out data/print5k \
        --n-train 5000 --n-val 500 --n-test 500 --min-len 3 --max-len 20 || return 1
    [ -d data/hw5kStroke ] || python scripts/build_synthetic.py --out data/hw5kStroke \
        --n-train 5000 --n-val 500 --n-test 500 --min-len 3 --max-len 20 \
        --handwritten --hw-style stroke || return 1
    [ -f results/print5k/.chain_done ] || {
        python scripts/train_handwritten.py --data-dir data/print5k \
            --out results/print5k/ --donor "" --seed 0 || return 1
        touch results/print5k/.chain_done
    }
    [ -f results/hw5kStroke_s0/.chain_done ] || {
        python scripts/train_handwritten.py --data-dir data/hw5kStroke \
            --out results/hw5kStroke_s0/ --donor results/print5k --seed 0 || return 1
        touch results/hw5kStroke_s0/.chain_done
    }
    python scripts/calibration_report.py --results results/print5k \
        --transfer results/hw5kStroke_s0
}
leg hwcalib hwcalib_leg

# ---- 8. optional: coverage-beta cells on the 2-D flagship ----------------
leg covbeta timeout 3600 python scripts/sweep_beam_alpha.py \
    --results results/im2latex2dLong --data data/im2latex2dLong --max-len 150 \
    --beams 5 --alphas 0.6 --coverage-betas 0.2,0.4

echo "R5 MASTER QUEUE DONE $(date -u)"
