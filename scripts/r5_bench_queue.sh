#!/bin/bash
# Round-5 bench queue: runs after r5_tail_queue.sh. Measures the bf16
# cross-KV decode win (beam megakernel bb=8 -> 16 at K=5/R=300) and
# re-prints the headline bench so BENCH_r05 reflects the final tree.
cd "$(dirname "$0")/.."

while ! grep -q "R5 TAIL QUEUE DONE" /tmp/tailq5.log 2>/dev/null; do
    sleep 60
done
echo "=== bench queue starting $(date -u) ==="

echo "=== beam K=5 decode: f32 vs bf16 cross-KV $(date -u) ==="
timeout 2400 python scripts/bench_decode.py --batch 256 --image 50 400 \
    --max-len 150 --beam 5 --rounds 5 \
    --variants transformer,transformer_ckv16 \
    || echo "ckv bench FAILED"

echo "=== beam K=2 decode (default beam) $(date -u) ==="
timeout 1200 python scripts/bench_decode.py --batch 256 --image 50 400 \
    --max-len 150 --beam 2 --rounds 5 \
    --variants transformer,transformer_ckv16 \
    || echo "ckv K2 bench FAILED"

echo "=== bf16 cross-KV quality check (greedy + beam5, 2-D test) $(date -u) ==="
timeout 3600 python scripts/sweep_beam_alpha.py \
    --results results/im2latex2dLong --data data/im2latex2dLong --max-len 150 \
    --beams 1,5 --alphas 0 \
    --extra-config '{"decode_cross_kv_dtype": "bfloat16"}' \
    || echo "ckv quality FAILED"

echo "=== headline bench $(date -u) ==="
timeout 1200 python bench.py || echo "headline FAILED"
echo "R5 BENCH QUEUE DONE $(date -u)"
