#!/bin/bash
# Compressed LSTM 2-D family chain (re-provisioning recovery): same
# phases/hyperparameters as scripts/r5_catchup_queue.sh lstm2d_leg but
# compressed epoch budgets so the chain fits the round tail.
cd /root/repo
while [ ! -f /tmp/r5c_lstm2dgo ]; do sleep 20; done
run_phase() {
    local out="$1"; shift
    [ -f "$out/.chain_done" ] && { echo "skip $out (done)"; return; }
    python scripts/train_im2latex_syn.py --out "$out/" "$@" || return 1
    touch "$out/.chain_done"
}
run_phase results/im2latex2dEZ_lstm --data-dir data/im2latex2dEZ \
    --dropout 1.0 --n-epochs 14 --batch-size 64 --max-length 11 \
    --lr-init 1e-3 --lr-min 1e-4 --lr-mode noam --warmup 800 &&
run_phase results/im2latex2dUni_lstm --data-dir data/im2latex2dUni \
    --dropout 1.0 --n-epochs 10 --max-length 110 \
    --warm-start results/im2latex2dEZ_lstm &&
run_phase results/im2latex2dSyn_lstm --data-dir data/im2latex2dSyn \
    --dropout 1.0 --n-epochs 16 --warm-start results/im2latex2dUni_lstm \
    --lr-init 5e-4 --lr-min 5e-5 --start-decay 2030 --end-decay 8120
echo "LSTM2D CHAIN DONE $(date -u)"
