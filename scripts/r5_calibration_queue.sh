#!/bin/bash
# Round-5 chip queue, leg 2: waits for r5_postchain (/tmp/postchain5.pid),
# then runs the calibration work (r4 VERDICT #7):
#   1. stroke-handwriting corpus + printed donor + one fine-tune seed
#      (the transfer-domain checkpoint; corpora per train_hw_stroke.sh)
#   2. calibration_report on the 2-D flagship with printed->handwritten
#      threshold-transfer check
set -e
cd "$(dirname "$0")/.."

if [ -f /tmp/postchain5.pid ]; then
    while kill -0 "$(cat /tmp/postchain5.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== calibration queue starting $(date -u) ==="

[ -d data/print5k ] || python scripts/build_synthetic.py --out data/print5k \
    --n-train 5000 --n-val 500 --n-test 500 --min-len 3 --max-len 20
[ -d data/hw5kStroke ] || python scripts/build_synthetic.py --out data/hw5kStroke \
    --n-train 5000 --n-val 500 --n-test 500 --min-len 3 --max-len 20 \
    --handwritten --hw-style stroke

[ -f results/print5k/.chain_done ] || {
    python scripts/train_handwritten.py --data-dir data/print5k \
        --out results/print5k/ --donor "" --seed 0
    touch results/print5k/.chain_done
}
[ -f results/hw5kStroke_s0/.chain_done ] || {
    python scripts/train_handwritten.py --data-dir data/hw5kStroke \
        --out results/hw5kStroke_s0/ --donor results/print5k --seed 0
    touch results/hw5kStroke_s0/.chain_done
}

echo "=== calibration report (flagship 2-D, transfer=hw stroke) $(date -u) ==="
python scripts/calibration_report.py --results results/im2latex2dLong \
    --transfer results/hw5kStroke_s0
echo "=== calibration report (printed 5k donor) $(date -u) ==="
python scripts/calibration_report.py --results results/print5k \
    --transfer results/hw5kStroke_s0
echo "R5 CALIBRATION QUEUE DONE $(date -u)"
