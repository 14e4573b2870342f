#!/bin/bash
# Stroke-handwriting transfer (BASELINE config #4, round-3 stroke raster):
# 1. printed donor trained from scratch on the printed twin corpus
#    (data/print5k — SAME formulas as data/hw5kStroke, printed raster), then
# 2. three seeds fine-tune the donor on the stroke-handwriting corpus.
# Report mean±spread of the three HW5K TEST lines (RESULTS.md).
#
# Corpora (deterministic, both seed 11):
#   python scripts/build_synthetic.py --out data/print5k    --n-train 5000 \
#       --n-val 500 --n-test 500 --min-len 3 --max-len 20
#   python scripts/build_synthetic.py --out data/hw5kStroke --n-train 5000 \
#       --n-val 500 --n-test 500 --min-len 3 --max-len 20 \
#       --handwritten --hw-style stroke
set -e
cd "$(dirname "$0")/.."

python scripts/train_handwritten.py --data-dir data/print5k \
    --out results/print5k/ --donor "" --seed 0

for s in 0 1 2; do
    python scripts/train_handwritten.py --data-dir data/hw5kStroke \
        --out "results/hw5kStroke_s${s}/" --donor results/print5k --seed "$s"
done
