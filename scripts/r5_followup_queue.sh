#!/bin/bash
# Round-5 follow-up chip queue: waits for r5_master_queue.sh, then runs the
# short benches that need the chip for minutes, not hours.
#   1. real-socket HTTP QPS benchmark on the 2-D flagship (VERDICT r4 #6:
#      "the QPS benchmark runs over real HTTP with a latency table")
#   2. in-process QPS benchmark at the same offered rate (the socket tax)
cd "$(dirname "$0")/.."

if [ -f /tmp/master5.pid ]; then
    while kill -0 "$(cat /tmp/master5.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== followup queue starting $(date -u) ==="

echo "=== HTTP QPS bench (2-D flagship, real sockets) $(date -u) ==="
timeout 900 python serve.py --results results/im2latex2dLong \
    --images data/im2latex2dSyn/images_test --qps 30 --duration 10 \
    --http-bench

echo "=== in-process QPS bench (same rate, socket tax reference) $(date -u) ==="
timeout 900 python serve.py --results results/im2latex2dLong \
    --images data/im2latex2dSyn/images_test --qps 30 --duration 10

echo "R5 FOLLOWUP QUEUE DONE $(date -u)"
