#!/usr/bin/env python
"""Write the `make full` formula files at im2latex-100k scale.

The real im2latex-100k train split cannot be fetched (no egress), so the
full-pipeline drill uses what IS real — the upstream checkout's val/test
formula token sequences (reference data/val.formulas.norm.txt 8,475 lines,
test.formulas.norm.txt 9,444 lines, read at runtime, nothing copied into
this repo) — and scales the train split to the reference's ~70k entries
with shuffle augmentation (random permutations of real lines: real token
distribution, no new n-gram structure). Eval splits stay 100% real and
disjoint from train sources.

Writes data/{train,val,test}.formulas.norm.txt for configs/data.json.
"""
import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--source", default="/root/reference/data")
ap.add_argument("--n-train", type=int, default=70000)
ap.add_argument("--n-val", type=int, default=1000)
ap.add_argument("--n-test", type=int, default=2000)
ap.add_argument("--max-len", type=int, default=150)
ap.add_argument("--seed", type=int, default=0)
args = ap.parse_args()


def load(path):
    with open(path, newline="") as f:
        return [
            " ".join(l.strip().split())
            for l in f
            if l.strip() and len(l.split()) <= args.max_len
        ]


train_src = load(os.path.join(args.source, "val.formulas.norm.txt"))
eval_src = load(os.path.join(args.source, "test.formulas.norm.txt"))

rng = random.Random(args.seed)
val = eval_src[: args.n_val]
test = eval_src[args.n_val : args.n_val + args.n_test]

train = list(train_src)
while len(train) < args.n_train:
    toks = rng.choice(train_src).split()
    rng.shuffle(toks)
    train.append(" ".join(toks))
train = train[: args.n_train]
rng.shuffle(train)

os.makedirs("data", exist_ok=True)
for name, lines in (("train", train), ("val", val), ("test", test)):
    path = f"data/{name}.formulas.norm.txt"
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{path}: {len(lines)} formulas")
