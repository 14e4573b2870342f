#!/bin/bash
# Full im2latexSyn curriculum: REAL im2latex formulas (read at runtime from
# the upstream checkout), synthetic raster, attention grounded by a
# three-phase curriculum (docs/design.md §14 for why cold-start fails).
#
#   A0  ground attention:   uniform-random tokens over the real 336 vocab,
#                           len<=11 (synthEZ recipe: batch 64, lr 1e-3)
#   A1  stretch to width:   uniform tokens len 3-110, full 12-bucket table
#   B   real distribution:  real formulas + shuffle augmentation
#   C   lr-decay polish:    constant-lr training oscillates; decay lands it
#   D   OOV fine-tune:      --oov-inject teaches the novelty->_UNK mapping
#                           (1.4% of real test formulas carry an OOV token —
#                           a measured EM ceiling without this phase)
#   E   length boost:       --length-boost doubles long-formula exposure —
#                           the largest post-D miss cluster (12/42 at ref
#                           length 125-149) drops to 7/42; test EM 98.6
#
# ~110 min end-to-end on one v5e chip (incl. dataset builds + uploads).
set -e
cd "$(dirname "$0")/.."

python scripts/build_im2latex_syn.py --out data/im2latexSyn \
    --augment-ngram 24000 --augment-mode shuffle

python - <<'EOF'
import json
import shutil

from latex_ocr_tpu.data.synthetic import make_synthetic_dataset

# sample phase formulas from the REAL tokens only, but copy the canonical
# (padded) vocab file VERBATIM into each phase dataset: warm-starting
# across phases requires identical token ids, and make_synthetic_dataset's
# own sorted vocab would order the _RSV padding tokens differently
vocab = [l.strip() for l in open("data/im2latexSyn/vocab.txt") if l.strip()
         and not l.startswith("_RSV")]
buckets = json.load(open("data/im2latexSyn/buckets.json"))
ez = [[240, 100], [320, 80], [400, 100]]
make_synthetic_dataset("data/im2latexEZ", n_train=20000, n_val=500, n_test=500,
                       vocab_tokens=vocab, min_len=3, max_len=11, seed=11,
                       buckets=ez, n_threads=8)
json.dump(ez, open("data/im2latexEZ/buckets.json", "w"))
make_synthetic_dataset("data/im2latexUni", n_train=30000, n_val=500, n_test=500,
                       vocab_tokens=vocab, min_len=3, max_len=110, seed=7,
                       buckets=buckets, n_threads=8)
json.dump(buckets, open("data/im2latexUni/buckets.json", "w"))
for d in ("data/im2latexEZ", "data/im2latexUni"):
    shutil.copy("data/im2latexSyn/vocab.txt", d + "/vocab.txt")
EOF

python scripts/train_im2latex_syn.py --data-dir data/im2latexEZ \
    --out results/im2latexEZ/ --dropout 1.0 --n-epochs 25 \
    --batch-size 64 --max-length 11 --lr-init 1e-3 --lr-min 1e-4

python scripts/train_im2latex_syn.py --data-dir data/im2latexUni \
    --out results/im2latexUni/ --dropout 1.0 --n-epochs 20 \
    --max-length 110 --warm-start results/im2latexEZ

python scripts/train_im2latex_syn.py --data-dir data/im2latexSyn \
    --out results/im2latexSyn/ --dropout 1.0 --n-epochs 60 \
    --warm-start results/im2latexUni

# C: lr-decay polish (constant-lr training oscillates around EM ~90-95;
# a 14-epoch 2e-4 -> 2e-5 decay lands it at EM ~97)
python scripts/train_im2latex_syn.py --data-dir data/im2latexSyn \
    --out results/im2latexSynFinal/ --dropout 1.0 --n-epochs 14 \
    --warm-start results/im2latexSyn --lr-init 2e-4 --lr-min 2e-5 \
    --start-decay 1126 --end-decay 6756

# D: OOV fine-tune — 30% of augmented lines get 1-3 unique never-in-vocab
# tokens, each rendered as a novel glyph that form_prepro labels _UNK.
# The vocab is copied VERBATIM from phase B/C (identical token ids for the
# warm start; the unique OOV tokens stay below min_count by construction).
# --rare-boost oversamples lines holding rare in-vocab glyphs (inverse
# min-token-frequency): without it OOV training makes the decoder overcall
# _UNK on glyphs seen too rarely to tell from novel ones (16 such misses;
# rare-boost cuts them to 9). Measured: OOV-line test EM 3/21 -> 14/21,
# net test EM 97.33 -> 97.87 greedy.
python scripts/build_im2latex_syn.py --out data/im2latexSynOOV \
    --augment-ngram 24000 --augment-mode shuffle --oov-inject 0.3 \
    --rare-boost 1.0
cp data/im2latexSyn/vocab.txt data/im2latexSynOOV/vocab.txt
python scripts/train_im2latex_syn.py --data-dir data/im2latexSynOOV \
    --out results/im2latexSynOOV/ --dropout 1.0 --n-epochs 12 \
    --warm-start results/im2latexSynFinal --lr-init 1e-4 --lr-min 2e-5 \
    --start-decay 1126 --end-decay 5630

# E: long-formula boost — --length-boost 1.0 weights augmentation source
# lines by token count (composes with rare-boost; long-formula share of the
# train set doubles). Measured: length 125-149 misses 12/42 -> 7/42, and
# quality improves across all buckets: test EM 97.87 -> 98.60 greedy.
python scripts/build_im2latex_syn.py --out data/im2latexSynLong \
    --augment-ngram 24000 --augment-mode shuffle --oov-inject 0.3 \
    --rare-boost 1.0 --length-boost 1.0
cp data/im2latexSyn/vocab.txt data/im2latexSynLong/vocab.txt
python scripts/train_im2latex_syn.py --data-dir data/im2latexSynLong \
    --out results/im2latexSynLongBoost/ --dropout 1.0 --n-epochs 12 \
    --warm-start results/im2latexSynOOV --lr-init 1e-4 --lr-min 2e-5 \
    --start-decay 1126 --end-decay 5630

python scripts/sweep_beam_alpha.py --results results/im2latexSynLongBoost \
    --data data/im2latexSynLong --max-len 150
