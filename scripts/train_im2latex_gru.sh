#!/bin/bash
# Attention-GRU quality run: the IDENTICAL im2latexSyn curriculum as
# scripts/train_im2latex_curriculum.sh (same datasets, same epochs, same lr
# constants), with the recurrence swapped to cell_type=gru (BASELINE config
# #1 names "attention-GRU"; the reference imports GRUCell at
# model/decoder.py:5 but hardwires LSTM — this run closes the label with a
# trained number instead of just a parity-pinned cell).
#
# Datasets are built by scripts/train_im2latex_curriculum.sh (or the
# equivalent standalone build commands); this script only trains, so the
# A/B shares bit-identical data with the LSTM and transformer chains.
set -e
cd "$(dirname "$0")/.."

# Clip stays at the shared 5.0: the r4 same-seed A/B (design.md §16.8,
# RESULTS.md "GRU stability A/B (r4)") REFUTED the tight-clip stabilizer —
# clip 1.0 still exploded 21x on the Uni phase and recovered ~5x slower
# (test EM 8.6 vs 61.0). The GRU family's lr>=5e-4 spikes self-recover and
# keep-best absorbs them (this chain finishes at EM 97.00; kept unchanged
# for round-over-round comparability). For spike-prone hot phases the
# MEASURED winners are `--update-clip 1.0 --ema-decay 0.999` (RESULTS.md
# "GRU stabilizer A/Bs (r4)": EM 64.0 / 64.6 vs the unguarded 61.0 on the
# worst-spiker arm); lr<=2e-4 merely trades spikes for 2.5x slower
# learning.
GRU_ARGS=(--cell-type gru)
GRU_HOT=(--clip 5.0)

for d in data/im2latexEZ data/im2latexUni data/im2latexSyn \
         data/im2latexSynOOV data/im2latexSynLong; do
    [ -f "$d/vocab.txt" ] || { echo "missing $d (run the dataset builds first)"; exit 1; }
done

python scripts/train_im2latex_syn.py --data-dir data/im2latexEZ \
    --out results/im2latexEZ_gru/ "${GRU_HOT[@]}" --dropout 1.0 --n-epochs 25 \
    --batch-size 64 --max-length 11 --lr-init 1e-3 --lr-min 1e-4 \
    "${GRU_ARGS[@]}"

python scripts/train_im2latex_syn.py --data-dir data/im2latexUni \
    --out results/im2latexUni_gru/ "${GRU_HOT[@]}" --dropout 1.0 --n-epochs 20 \
    --max-length 110 --warm-start results/im2latexEZ_gru "${GRU_ARGS[@]}"

python scripts/train_im2latex_syn.py --data-dir data/im2latexSyn \
    --out results/im2latexSyn_gru/ "${GRU_HOT[@]}" --dropout 1.0 --n-epochs 60 \
    --warm-start results/im2latexUni_gru "${GRU_ARGS[@]}"

python scripts/train_im2latex_syn.py --data-dir data/im2latexSyn \
    --out results/im2latexSynFinal_gru/ --dropout 1.0 --n-epochs 14 \
    --warm-start results/im2latexSyn_gru --lr-init 2e-4 --lr-min 2e-5 \
    --start-decay 1126 --end-decay 6756 "${GRU_ARGS[@]}"

python scripts/train_im2latex_syn.py --data-dir data/im2latexSynOOV \
    --out results/im2latexSynOOV_gru/ --dropout 1.0 --n-epochs 12 \
    --warm-start results/im2latexSynFinal_gru --lr-init 1e-4 --lr-min 2e-5 \
    --start-decay 1126 --end-decay 5630 "${GRU_ARGS[@]}"

python scripts/train_im2latex_syn.py --data-dir data/im2latexSynLong \
    --out results/im2latexSynLongBoost_gru/ --dropout 1.0 --n-epochs 12 \
    --warm-start results/im2latexSynOOV_gru --lr-init 1e-4 --lr-min 2e-5 \
    --start-decay 1126 --end-decay 5630 "${GRU_ARGS[@]}"

python scripts/sweep_beam_alpha.py --results results/im2latexSynLongBoost_gru \
    --data data/im2latexSynLong --max-len 150
