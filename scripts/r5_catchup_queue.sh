#!/bin/bash
# Round-5 catch-up queue: the remaining chip work after the session restart
# (the master/final queues died with the previous session; their completed
# legs are skipped by the on-disk .chain_done / results state, and the two
# broken legs are fixed here):
#   * lstm2d/gru2d EZ grounding phases now use --lr-mode noam --warmup 800 —
#     the plain 1e-3 cold start never grounds Bahdanau attention on the 2-D
#     structural raster (25 epochs at the unigram floor, EM 0.00), while an
#     8-epoch noam probe grounds to EM 75. The transformer flagship already
#     grounded via the same warm-up; later phases warm-start a grounded
#     model and keep their r4 hyperparameters.
#   * the composed-stabilizer spread runs at the r4 arm length (20 epochs)
#     instead of the final queue's 12-epoch compromise, so the 3-seed table
#     extends the r4 single-seed A/B row-for-row.
# Order: cheapest/highest-VERDICT-value first. Every leg is idempotent.
cd "$(dirname "$0")/.."

leg() {  # leg <name> <cmd...>: run once, isolate failures
    local name="$1"; shift
    [ -f "/tmp/r5c_${name}.done" ] && { echo "skip leg $name (done)"; return; }
    echo "=== leg $name START $(date -u) ==="
    if "$@"; then
        touch "/tmp/r5c_${name}.done"
        echo "=== leg $name DONE $(date -u) ==="
    else
        echo "=== leg $name FAILED ($?) $(date -u) ==="
    fi
}

run_phase() {  # run_phase <out-dir> <args...>: skip if already done
    local out="$1"; shift
    [ -f "$out/.chain_done" ] && { echo "skip $out (done)"; return; }
    python scripts/train_im2latex_syn.py --out "$out/" "$@" || return 1
    touch "$out/.chain_done"
}

# ---- 1. epoch-mix bench on the 2-D dataset (VERDICT #3) ------------------
# two earlier 30-min attempts warmed the persistent compile cache; give the
# retry 75 min so a mostly-warm pass can also finish its timed epochs
leg mix2d timeout 4500 python bench.py --mix --mix-data data/im2latex2dSyn

# ---- 2. composed-stabilizer spread, 3 seeds x {ctl, combo} (VERDICT #4) --
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

spread_leg() {
    run_phase results/im2latexEZ_gru --data-dir data/im2latexEZ \
        --clip 5.0 --dropout 1.0 --n-epochs 25 --batch-size 64 \
        --max-length 11 --lr-init 1e-3 --lr-min 1e-4 --cell-type gru \
        || return 1
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

# ---- 3. LSTM family chain on the 2-D raster (VERDICT #1 family table) ----
lstm2d_leg() {
    run_phase results/im2latex2dEZ_lstm --data-dir data/im2latex2dEZ \
        --dropout 1.0 --n-epochs 25 --batch-size 64 --max-length 11 \
        --lr-init 1e-3 --lr-min 1e-4 --lr-mode noam --warmup 800 &&
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

# ---- 4. GRU family chain on the 2-D raster -------------------------------
gru2d_leg() {
    run_phase results/im2latex2dEZ_gru --data-dir data/im2latex2dEZ \
        --cell-type gru --clip 5.0 --dropout 1.0 --n-epochs 25 \
        --batch-size 64 --max-length 11 --lr-init 1e-3 --lr-min 1e-4 \
        --lr-mode noam --warmup 800 &&
    run_phase results/im2latex2dUni_gru --data-dir data/im2latex2dUni \
        --cell-type gru --clip 5.0 --dropout 1.0 --n-epochs 20 \
        --max-length 110 --warm-start results/im2latex2dEZ_gru \
        --update-clip 1.0 --ema-decay 0.999 &&
    run_phase results/im2latex2dSyn_gru --data-dir data/im2latex2dSyn \
        --cell-type gru --clip 5.0 --dropout 1.0 --n-epochs 30 \
        --warm-start results/im2latex2dUni_gru \
        --update-clip 1.0 --ema-decay 0.999 &&
    run_phase results/im2latex2dSynFinal_gru --data-dir data/im2latex2dSyn \
        --cell-type gru --dropout 1.0 --n-epochs 10 \
        --warm-start results/im2latex2dSyn_gru \
        --lr-init 2e-4 --lr-min 2e-5 --start-decay 1126 --end-decay 6756
}
leg gru2d gru2d_leg

# ---- 5. printed->handwritten calibration transfer (VERDICT #7 tail) ------
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

# ---- 6. coverage-beta cells on the 2-D flagship (decode lever) -----------
leg covbeta timeout 3600 python scripts/sweep_beam_alpha.py \
    --results results/im2latex2dLong --data data/im2latex2dLong --max-len 150 \
    --beams 5 --alphas 0.6 --coverage-betas 0,0.2

echo "R5 CATCHUP QUEUE DONE $(date -u)"
