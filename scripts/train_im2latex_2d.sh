#!/bin/bash
# Round-5 headline (r4 VERDICT next-round #1): the tuned flagship recipe
# re-run on the 2-D STRUCTURAL raster (data/layout.py). Until now every
# quality number measured 1-D glyph transcription; these datasets render
# \frac/^/_/\sqrt/arrays as stacked TeX boxes, so the decoder must
# serialize a 2-D layout — the actual difficulty of im2latex (reference
# model/utils/image.py:164-207 renders through real pdflatex).
#
# Recipe = train_im2latex_transformer_tuned.sh verbatim (label smoothing
# 0.1 everywhere, noam warm-up on the cold phase, same epochs, same
# 2L/8H/256d/1024ff decoder) — only the raster and the structure-aware
# data ops differ:
#   * all datasets --style layout (BUCKETS_2D, leaf-only shuffle/OOV)
#   * EZ/Uni grounding phases sample VALID random structures
#     (sample_structured_formula) instead of flat uniform token strings:
#     with an invisible-token raster, flat uniform strings would make the
#     structural tokens unlearnable noise instead of grounding signal.
# Output dirs use the `_2d` suffix; the 1-D artifacts stay intact.
set -e
cd "$(dirname "$0")/.."

TF_ARGS=(--decoder-arch transformer
         --transformer-config '{"num_layers": 2, "num_heads": 8, "dim_model": 256, "dim_ff": 1024}'
         --label-smoothing 0.1)

echo "=== build 2-D datasets $(date -u) ==="
[ -f data/im2latex2dSyn/vocab.txt ] || python scripts/build_im2latex_syn.py \
    --out data/im2latex2dSyn --style layout \
    --augment-ngram 24000 --augment-mode shuffle

[ -f data/im2latex2dEZ/vocab.txt ] || python - <<'EOF'
import json
import shutil

from latex_ocr_tpu.data.synthetic import make_synthetic_dataset

# same vocab contract as the 1-D chain: phase datasets copy the canonical
# (padded) vocab verbatim so warm-started token ids line up
vocab = [l.strip() for l in open("data/im2latex2dSyn/vocab.txt") if l.strip()
         and not l.startswith("_RSV")]
buckets = json.load(open("data/im2latex2dSyn/buckets.json"))
# EZ structured formulas (<=11 tokens) measured: W<=211, H<=78
ez = [[120, 60], [160, 70], [220, 80]]
make_synthetic_dataset("data/im2latex2dEZ", n_train=20000, n_val=500,
                       n_test=500, vocab_tokens=vocab, min_len=3, max_len=11,
                       seed=11, buckets=ez, n_threads=8,
                       handwritten="layout", structured=True)
json.dump(ez, open("data/im2latex2dEZ/buckets.json", "w"))
# Uni structured formulas (<=110 tokens) measured: W<=1156, H<=79 — the
# BUCKETS_2D table covers
make_synthetic_dataset("data/im2latex2dUni", n_train=30000, n_val=500,
                       n_test=500, vocab_tokens=vocab, min_len=3, max_len=110,
                       seed=7, buckets=buckets, n_threads=8,
                       handwritten="layout", structured=True)
json.dump(buckets, open("data/im2latex2dUni/buckets.json", "w"))
for d in ("data/im2latex2dEZ", "data/im2latex2dUni"):
    shutil.copy("data/im2latex2dSyn/vocab.txt", d + "/vocab.txt")
EOF

[ -f data/im2latex2dOOV/vocab.txt ] || { python scripts/build_im2latex_syn.py \
    --out data/im2latex2dOOV --style layout \
    --augment-ngram 24000 --augment-mode shuffle --oov-inject 0.3 \
    --rare-boost 1.0 ; \
    cp data/im2latex2dSyn/vocab.txt data/im2latex2dOOV/vocab.txt ; }

[ -f data/im2latex2dLong/vocab.txt ] || { python scripts/build_im2latex_syn.py \
    --out data/im2latex2dLong --style layout \
    --augment-ngram 24000 --augment-mode shuffle --oov-inject 0.3 \
    --rare-boost 1.0 --length-boost 1.0 ; \
    cp data/im2latex2dSyn/vocab.txt data/im2latex2dLong/vocab.txt ; }

run_phase() {  # run_phase <out-dir> <args...>: skip if already done
    local out="$1"; shift
    [ -f "$out/.chain_done" ] && { echo "skip $out (done)"; return; }
    python scripts/train_im2latex_syn.py --out "$out/" "$@"
    touch "$out/.chain_done"
}

echo "=== A0 ground (EZ, noam) $(date -u) ==="
run_phase results/im2latex2dEZ --data-dir data/im2latex2dEZ \
    --dropout 1.0 --n-epochs 25 --batch-size 64 --max-length 11 \
    --lr-init 1e-3 --lr-min 1e-4 --lr-mode noam --warmup 800 "${TF_ARGS[@]}"

echo "=== A1 stretch (Uni) $(date -u) ==="
run_phase results/im2latex2dUni --data-dir data/im2latex2dUni \
    --dropout 1.0 --n-epochs 20 --max-length 110 \
    --warm-start results/im2latex2dEZ "${TF_ARGS[@]}"

echo "=== B real corpus $(date -u) ==="
run_phase results/im2latex2dSyn --data-dir data/im2latex2dSyn \
    --dropout 1.0 --n-epochs 60 \
    --warm-start results/im2latex2dUni "${TF_ARGS[@]}"

echo "=== C lr-decay polish $(date -u) ==="
run_phase results/im2latex2dSynFinal --data-dir data/im2latex2dSyn \
    --dropout 1.0 --n-epochs 14 --warm-start results/im2latex2dSyn \
    --lr-init 2e-4 --lr-min 2e-5 --start-decay 1126 --end-decay 6756 \
    "${TF_ARGS[@]}"

echo "=== D OOV fine-tune $(date -u) ==="
run_phase results/im2latex2dOOV --data-dir data/im2latex2dOOV \
    --dropout 1.0 --n-epochs 12 --warm-start results/im2latex2dSynFinal \
    --lr-init 1e-4 --lr-min 2e-5 --start-decay 1126 --end-decay 5630 \
    "${TF_ARGS[@]}"

echo "=== E length boost $(date -u) ==="
run_phase results/im2latex2dLong --data-dir data/im2latex2dLong \
    --dropout 1.0 --n-epochs 12 --warm-start results/im2latex2dOOV \
    --lr-init 1e-4 --lr-min 2e-5 --start-decay 1126 --end-decay 5630 \
    "${TF_ARGS[@]}"

echo "=== beam x alpha sweep $(date -u) ==="
python scripts/sweep_beam_alpha.py --results results/im2latex2dLong \
    --data data/im2latex2dLong --max-len 150
echo "2D CHAIN DONE $(date -u)"
