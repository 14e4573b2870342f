#!/bin/bash
# Round-5 drill re-measure (r4 VERDICT #2 "done" criterion): the `make full`
# train leg now runs the cached product pipeline (configs/training_drill.json
# pipeline: cached) — measure its epoch throughput next to the 126 img/s the
# r4 drill recorded on the host BatchPipeline at the same batch size.
# Waits for the follow-up queue, and for the CPU-side dataset build.
cd "$(dirname "$0")/.."

if [ -f /tmp/followup5.pid ]; then
    while kill -0 "$(cat /tmp/followup5.pid)" 2>/dev/null; do sleep 30; done
fi
while [ -f /tmp/drillbuild5.pid ] && kill -0 "$(cat /tmp/drillbuild5.pid)" 2>/dev/null; do
    sleep 30
done
grep -q BUILD_DONE /tmp/drillbuild5.log || { echo "drill build failed"; exit 1; }

echo "=== drill train leg (cached pipeline, make full path) $(date -u) ==="
timeout 3600 python train.py --data=configs/data.json --vocab=configs/vocab.json \
    --training=configs/training_drill.json --model=configs/model.json \
    --output=results/full/
echo "=== drill eval leg $(date -u) ==="
timeout 1800 python evaluate_txt.py --results=results/full/ --batch_size 64
echo "R5 DRILL QUEUE DONE $(date -u)"
