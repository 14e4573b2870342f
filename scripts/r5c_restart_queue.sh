#!/bin/bash
# Round-5 restart queue: the machine was re-provisioned mid-round (all
# gitignored results/ and generated datasets lost; every MEASURED number
# is already committed in RESULTS.md). This queue re-runs, in judge-value
# order, exactly the two r4-VERDICT items whose evidence had not landed
# in RESULTS.md before the restart, then the optional hwcalib leg:
#   1. composed-stabilizer 3-seed spread (VERDICT #4): ctl vs
#      update_clip+ema_decay, GRU Uni phase, seeds 0..2, 12 epochs/arm,
#      spike census after every completed seed pair.
#   2. `make full` drill train+eval on the cached product pipeline
#      (VERDICT #2) — replaces the r4 host-pipeline 126 img/s row.
#      Waits for the CPU-side dataset rebuild marker.
#   3. printed->handwritten calibration transfer (VERDICT #7 addendum).
# Every leg is idempotent (.chain_done / .done markers) and reports
# incrementally, so a wall-clock cutoff still leaves partial evidence.
cd "$(dirname "$0")/.."

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

echo "=== restart queue starting $(date -u) ==="

# ---- 1. composed-stabilizer spread ------------------------------------
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

# ---- 2. drill train+eval on the cached pipeline -----------------------
if [ -f /tmp/r5c_drill.done ]; then
    echo "skip drill (done)"
else
    echo "=== waiting for drill data build $(date -u) ==="
    for _ in $(seq 1 240); do
        [ -f /tmp/r5c_drilldata.done ] && break
        sleep 30
    done
    if [ -f /tmp/r5c_drilldata.done ]; then
        echo "=== drill train leg START $(date -u) ==="
        if timeout 5400 python train.py --data=configs/data.json \
                --vocab=configs/vocab.json \
                --training=configs/training_drill.json \
                --model=configs/model.json --output=results/full/ \
           && timeout 1800 python evaluate_txt.py --results=results/full/ \
                --batch_size 64; then
            touch /tmp/r5c_drill.done
            echo "=== drill DONE $(date -u) ==="
        else
            echo "=== drill FAILED ($?) $(date -u) ==="
        fi
    else
        echo "=== drill data never arrived — skipping $(date -u) ==="
    fi
fi

# ---- 3. printed->handwritten calibration transfer ---------------------
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

echo "R5 RESTART QUEUE DONE $(date -u)"
