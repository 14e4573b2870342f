#!/bin/bash
# Round-5 chip queue, leg 3: waits for the calibration queue
# (/tmp/calibq5.pid), then runs the MFU roofline decomposition + the bf16-
# decoder probe (r4 VERDICT #8) and the headline bench for comparison.
set -e
cd "$(dirname "$0")/.."

if [ -f /tmp/calibq5.pid ]; then
    while kill -0 "$(cat /tmp/calibq5.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== roofline queue starting $(date -u) ==="
timeout 2400 python scripts/roofline_flagship.py --steps 20 --rounds 6
echo "=== headline bench (same session, for cross-reference) $(date -u) ==="
timeout 1200 python bench.py
echo "R5 ROOFLINE QUEUE DONE $(date -u)"
