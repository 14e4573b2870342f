#!/bin/bash
# Post-mech-AB chip queue (r4): serialize chip work behind the GRU
# mechanism A/B (the tunneled chip is shared; concurrent runs contend).
#
# 1. Transformer beam decode K=5 re-measure: the chunked KV-cache reorder
#    (ops/transformer_kernel.py) removed the register-spill failure that
#    forced bb=8 at K>=4, and the beam budget rose to 88 MB — K=5 should
#    now compile at bb=16 and cut latency. K=2 re-run guards against a
#    chunk-loop regression on the eval-default path.
# 2. Token parity vs the XLA loop at the real checkpoint (the r4 sweep's
#    64-image oracle), now exercising the bb=16 wide-beam code path.
# 3. bench.py batch probe: 512 vs the headline 256.
set -e
cd "$(dirname "$0")/.."

while ! grep -q "GRU MECH AB DONE" /tmp/r4_mechab.log 2>/dev/null; do
    sleep 60
done

echo "=== beam decode bench K=5 (chunked reorder, 88 MB beam budget)"
python scripts/bench_decode.py --batch 256 --image 50 400 --max-len 150 \
    --beam 5 --variants transformer,transformer_xla
echo "=== beam decode bench K=2 (no-regression check)"
python scripts/bench_decode.py --batch 256 --image 50 400 --max-len 150 \
    --beam 2 --variants transformer,transformer_xla
echo "=== beam kernel vs XLA parity at real checkpoint, K=5 bb=16"
python scripts/check_beam_kernel_vs_xla.py --beam 5 --alpha 0 --n-images 64
echo "=== bench batch probe (512 vs headline 256)"
python bench.py --batch 512
python bench.py --batch 256
echo "POSTMECH QUEUE DONE"
