#!/bin/bash
# Round-4 post-chain chip queue: waits for the tuned transformer chain
# (/tmp/tfx.pid) to finish, then runs the remaining chip-bound work
# while the chip is otherwise idle.
cd "$(dirname "$0")/.."
if [ -f /tmp/tfx.pid ]; then
    while kill -0 "$(cat /tmp/tfx.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== tfx chain finished; starting postchain $(date -u) ==="
bash scripts/gru_clip_ab.sh
echo "=== encoder probe $(date -u) ==="
timeout 1800 python scripts/probe_encoder.py --rounds 3 --steps 30
echo "POSTCHAIN DONE $(date -u)"
