#!/bin/bash
# Round-5 final catch-up queue: waits for the drill queue, then retries /
# runs whatever the earlier queues could not fit, cheapest-first.
#   1. epoch-mix bench retry on the 2-D dataset (first attempt hit its
#      30-min timeout warming 18 fresh shape programs; the persistent
#      compile cache makes the retry mostly-warm)
#   2. coverage-beta cells on the 2-D flagship (decode-lever check)
#   3. printed->handwritten calibration transfer (train 2 small models)
cd "$(dirname "$0")/.."

if [ -f /tmp/drillq5.pid ]; then
    while kill -0 "$(cat /tmp/drillq5.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== final queue starting $(date -u) ==="

echo "=== mix2d retry $(date -u) ==="
timeout 2700 python bench.py --mix --mix-data data/im2latex2dSyn \
    || echo "mix2d retry FAILED"

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
