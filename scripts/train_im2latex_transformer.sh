#!/bin/bash
# Transformer-decoder quality A/B: the IDENTICAL im2latexSyn curriculum as
# scripts/train_im2latex_curriculum.sh (phases A0 -> E, same datasets, same
# epochs, same lr constants), with the decoder swapped for the bench-winning
# transformer config (2L/8H/256d/1024ff — 9552 img/s vs the LSTM's 8045,
# design.md §16.1). This answers §16.1's open question: does the +19%
# throughput config match the LSTM's quality (test EM 98.60 greedy at phase
# E) on the same data, or does the family need transformer-shaped tuning?
#
# Datasets are built by scripts/train_im2latex_curriculum.sh (or the
# equivalent standalone build commands); this script only trains, so the
# A/B shares bit-identical data with the LSTM chain.
set -e
cd "$(dirname "$0")/.."

TF_ARGS=(--decoder-arch transformer
         --transformer-config '{"num_layers": 2, "num_heads": 8, "dim_model": 256, "dim_ff": 1024}')

for d in data/im2latexEZ data/im2latexUni data/im2latexSyn \
         data/im2latexSynOOV data/im2latexSynLong; do
    [ -f "$d/vocab.txt" ] || { echo "missing $d (run the dataset builds first)"; exit 1; }
done

python scripts/train_im2latex_syn.py --data-dir data/im2latexEZ \
    --out results/im2latexEZ_tf/ --dropout 1.0 --n-epochs 25 \
    --batch-size 64 --max-length 11 --lr-init 1e-3 --lr-min 1e-4 \
    "${TF_ARGS[@]}"

python scripts/train_im2latex_syn.py --data-dir data/im2latexUni \
    --out results/im2latexUni_tf/ --dropout 1.0 --n-epochs 20 \
    --max-length 110 --warm-start results/im2latexEZ_tf "${TF_ARGS[@]}"

python scripts/train_im2latex_syn.py --data-dir data/im2latexSyn \
    --out results/im2latexSyn_tf/ --dropout 1.0 --n-epochs 60 \
    --warm-start results/im2latexUni_tf "${TF_ARGS[@]}"

python scripts/train_im2latex_syn.py --data-dir data/im2latexSyn \
    --out results/im2latexSynFinal_tf/ --dropout 1.0 --n-epochs 14 \
    --warm-start results/im2latexSyn_tf --lr-init 2e-4 --lr-min 2e-5 \
    --start-decay 1126 --end-decay 6756 "${TF_ARGS[@]}"

python scripts/train_im2latex_syn.py --data-dir data/im2latexSynOOV \
    --out results/im2latexSynOOV_tf/ --dropout 1.0 --n-epochs 12 \
    --warm-start results/im2latexSynFinal_tf --lr-init 1e-4 --lr-min 2e-5 \
    --start-decay 1126 --end-decay 5630 "${TF_ARGS[@]}"

python scripts/train_im2latex_syn.py --data-dir data/im2latexSynLong \
    --out results/im2latexSynLongBoost_tf/ --dropout 1.0 --n-epochs 12 \
    --warm-start results/im2latexSynOOV_tf --lr-init 1e-4 --lr-min 2e-5 \
    --start-decay 1126 --end-decay 5630 "${TF_ARGS[@]}"

python scripts/sweep_beam_alpha.py --results results/im2latexSynLongBoost_tf \
    --data data/im2latexSynLong --max-len 150
