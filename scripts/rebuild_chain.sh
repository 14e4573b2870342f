#!/bin/bash
# Rebuild the synthetic datasets + the full training ladder
# (EZ -> curriculum -> 50k, plus handwritten transfer) end to end.
# Round-2 rerun: results/ and data/ are not kept between rounds.
# Phase-skip guards use a .chain_done sentinel written only on a clean
# phase exit — a non-empty model_weights dir proves nothing (a crashed
# run's first checkpoint would otherwise skip the rest of the phase).
set -e
cd "$(dirname "$0")/.."

echo "=== build datasets ==="
[ -d data/synthEZ ]   || python scripts/build_synthetic.py --out data/synthEZ --n-train 10000 --n-val 500 --n-test 500 --min-len 3 --max-len 10
[ -d data/synth10k ]  || python scripts/build_synthetic.py --out data/synth10k --n-train 10000 --n-val 500 --n-test 500
[ -d data/synth50k ]  || python scripts/build_synthetic.py --out data/synth50k --n-train 50000 --n-val 1000 --n-test 1000 --min-len 3 --max-len 50
[ -d data/hw400 ]     || python scripts/build_synthetic.py --out data/hw400 --n-train 400 --n-val 60 --n-test 60 --min-len 3 --max-len 20 --handwritten

echo "=== train synthEZ ==="
[ -f results/synthEZ/.chain_done ] || { ok=0; for i in 1 2 3; do python scripts/train_synthEZ.py && { ok=1; touch results/synthEZ/.chain_done; break; }; echo "train_synthEZ attempt $i died — auto-resume will continue"; done; [ "$ok" = 1 ] || { echo "train_synthEZ failed 3 attempts"; exit 1; }; }
echo "=== train curriculum (synth10k_cur) ==="
[ -f results/synth10k_cur/.chain_done ] || { ok=0; for i in 1 2 3; do python scripts/train_curriculum.py && { ok=1; touch results/synth10k_cur/.chain_done; break; }; echo "train_curriculum attempt $i died — auto-resume will continue"; done; [ "$ok" = 1 ] || { echo "train_curriculum failed 3 attempts"; exit 1; }; }
echo "=== train synth50k ==="
[ -f results/synth50k/.chain_done ] || { ok=0; for i in 1 2 3; do python scripts/train_synth50k.py && { ok=1; touch results/synth50k/.chain_done; break; }; echo "train_synth50k attempt $i died — auto-resume will continue"; done; [ "$ok" = 1 ] || { echo "train_synth50k failed 3 attempts"; exit 1; }; }
echo "=== beam eval + handwritten transfer ==="
python scripts/eval_beam_and_handwritten.py
echo "=== beam x alpha sweep (BASELINE config #3) ==="
python scripts/sweep_beam_alpha.py --results results/synth50k --data data/synth50k --max-len 51
echo "=== serving QPS benches (warm-started) ==="
python scripts/bench_serving.py --results results/synth50k --data data/synth50k
echo "=== chain done ==="
