import sys, os
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
from collections import Counter
from latex_ocr_tpu.data.vocab import pad_vocab, write_vocab

for ds in ("im2latexEZ", "im2latexUni", "im2latexSynShuf"):
    out = f"data/{ds}"
    vp = os.path.join(out, "vocab.txt")
    if os.path.exists(vp):
        print(ds, "already has vocab.txt"); continue
    counter = Counter()
    with open(os.path.join(out, "train.formulas.norm.txt")) as f:
        for line in f:
            counter.update(line.split())
    vocab = sorted(tok for tok, c in counter.items() if c >= 10)
    vocab = pad_vocab(vocab, 128)
    write_vocab(vocab, vp)
    print(ds, "vocab:", len(vocab))
