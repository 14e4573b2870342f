#!/bin/bash
# Real-raster readiness drill (VERDICT r2 next-round #9): the `make full`
# chain at im2latex scale — 70k train matching entries, the reference's
# real 21-bucket table (configs/data.json), REAL im2latex formula token
# sequences — through the actual CLIs:
#
#   formulas -> build.py (vocab + 70k/1k/2k renders; synthetic fallback)
#            -> mocked-pdflatex/magick subprocess leg (300 formulas,
#               real command contracts + bucket postprocess)
#            -> train.py (2-epoch smoke on the TPU)
#            -> evaluate_txt.py
#
# Nothing here is meant to converge; the point is that the day real data
# lands, `make full` runs to completion at the target volume.
set -e
cd "$(dirname "$0")/.."
python scripts/make_full_formulas.py
python build.py --data=configs/data.json --vocab=configs/vocab.json
python scripts/drill_mock_toolchain.py
python train.py --data=configs/data.json --vocab=configs/vocab.json \
    --training=configs/training_drill.json --model=configs/model.json \
    --output=results/full/
python evaluate_txt.py --results=results/full/ --batch_size 64
echo "DRILL DONE"
