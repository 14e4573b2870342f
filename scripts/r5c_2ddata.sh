#!/bin/bash
# Rebuild the gitignored 2-D layout datasets (lost to re-provisioning).
cd /root/repo
while [ ! -f /tmp/r5c_2dgo ]; do sleep 30; done
set -e
[ -f data/im2latex2dSyn/vocab.txt ] || python scripts/build_im2latex_syn.py \
    --out data/im2latex2dSyn --style layout \
    --augment-ngram 24000 --augment-mode shuffle
[ -f data/im2latex2dEZ/vocab.txt ] || python - <<'PYEOF'
import json
import shutil

from latex_ocr_tpu.data.synthetic import make_synthetic_dataset

vocab = [l.strip() for l in open("data/im2latex2dSyn/vocab.txt") if l.strip()
         and not l.startswith("_RSV")]
buckets = json.load(open("data/im2latex2dSyn/buckets.json"))
ez = [[120, 60], [160, 70], [220, 80]]
make_synthetic_dataset("data/im2latex2dEZ", n_train=20000, n_val=500,
                       n_test=500, vocab_tokens=vocab, min_len=3, max_len=11,
                       seed=11, buckets=ez, n_threads=8,
                       handwritten="layout", structured=True)
json.dump(ez, open("data/im2latex2dEZ/buckets.json", "w"))
make_synthetic_dataset("data/im2latex2dUni", n_train=30000, n_val=500,
                       n_test=500, vocab_tokens=vocab, min_len=3, max_len=110,
                       seed=7, buckets=buckets, n_threads=8,
                       handwritten="layout", structured=True)
json.dump(buckets, open("data/im2latex2dUni/buckets.json", "w"))
for d in ("data/im2latex2dEZ", "data/im2latex2dUni"):
    shutil.copy("data/im2latex2dSyn/vocab.txt", d + "/vocab.txt")
PYEOF
touch /tmp/r5c_2ddata.done
echo "2D DATA DONE $(date -u)"
