#!/usr/bin/env python
"""Reference-architecture train-step throughput in a torch stand-in.

The reference publishes no throughput numbers (SURVEY.md §6) and its
TF 1.12 + consumer-GPU setup cannot be reproduced here, so `bench.py`'s
``vs_baseline`` divides by a documented 50 img/s ESTIMATE. This script
grounds that estimate's order of magnitude: the same ~10M-param
architecture (reference encoder.py conv stack + Bahdanau attention LSTM,
attention_cell.py:58-89), teacher-forced fwd+bwd+adam, implemented in
torch (the modern stand-in available in this image) on the HOST CPU.

This is a hardware-mismatched anchor by construction — the reference ran
on a GPU we don't have — so the output reports img/s on this host's CPU
plus the bench-shape workload definition, and leaves the comparison to
the reader. Run: python scripts/bench_torch_reference.py [--steps 3]
"""
import argparse
import json
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class RefEncoder(nn.Module):
    """Reference encoder.py:32-60 'vanilla' conv/pool stack."""

    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(1, 64, 3, padding=1)
        self.c2 = nn.Conv2d(64, 128, 3, padding=1)
        self.c3 = nn.Conv2d(128, 256, 3, padding=1)
        self.c4 = nn.Conv2d(256, 256, 3, padding=1)
        self.c5 = nn.Conv2d(256, 512, 3, padding=1)
        self.c6 = nn.Conv2d(512, 512, 3, padding=0)  # VALID

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.c1(x)), 2, 2)
        x = F.max_pool2d(F.relu(self.c2(x)), 2, 2)
        x = F.relu(self.c3(x))
        x = F.max_pool2d(F.relu(self.c4(x)), (2, 1), (2, 1))
        x = F.max_pool2d(F.relu(self.c5(x)), (1, 2), (1, 2))
        return F.relu(self.c6(x))


class RefAttnDecoder(nn.Module):
    """Bahdanau attention LSTM (reference attention_cell.py:58-89)."""

    def __init__(self, n_tok=503, emb=80, units=512, dim_e=256, dim_o=512, ch=512):
        super().__init__()
        self.embed = nn.Embedding(n_tok, emb)
        self.cell = nn.LSTMCell(emb + dim_o, units)
        self.att_img = nn.Linear(ch, dim_e, bias=False)
        self.att_h = nn.Linear(units, dim_e, bias=False)
        self.beta = nn.Linear(dim_e, 1, bias=False)
        self.o_h = nn.Linear(units, dim_o, bias=False)
        self.o_c = nn.Linear(ch, dim_o, bias=False)
        self.logits = nn.Linear(dim_o, n_tok, bias=False)
        self.init_c = nn.Linear(ch, units)
        self.init_h = nn.Linear(ch, units)
        self.init_o = nn.Linear(ch, dim_o)

    def forward(self, feat, formula):
        B, C, Hf, Wf = feat.shape
        regions = feat.flatten(2).transpose(1, 2)  # (B, R, C)
        att_img = self.att_img(regions)  # hoisted once, reference :43
        mean = regions.mean(1)
        c = torch.tanh(self.init_c(mean))
        h = torch.tanh(self.init_h(mean))
        o = torch.tanh(self.init_o(mean))
        embs = self.embed(formula[:, :-1])
        start = torch.zeros_like(embs[:, 0])
        outs = []
        for t in range(formula.shape[1]):
            e_t = start if t == 0 else embs[:, t - 1]
            h, c = self.cell(torch.cat([e_t, o], -1), (h, c))
            scores = self.beta(torch.tanh(att_img + self.att_h(h)[:, None]))
            a = torch.softmax(scores.squeeze(-1), -1)
            ctx = torch.einsum("br,brc->bc", a, regions)
            o = torch.tanh(self.o_h(h) + self.o_c(ctx))
            outs.append(self.logits(o))
        return torch.stack(outs, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch CPU threads (0 = library default)")
    args = ap.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)

    B, H, W, T, V = args.batch, 50, 200, 64, 503
    enc, dec = RefEncoder(), RefAttnDecoder(n_tok=V)
    opt = torch.optim.Adam(list(enc.parameters()) + list(dec.parameters()), lr=1e-3)
    img = torch.randint(0, 256, (B, 1, H, W), dtype=torch.uint8)
    formula = torch.randint(0, V, (B, T))

    def step():
        opt.zero_grad()
        x = (img.float() - 128.0) / 128.0
        logits = dec(enc(x), formula)
        loss = F.cross_entropy(logits.reshape(-1, V), formula.reshape(-1))
        loss.backward()
        opt.step()

    step()  # warm-up
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"torch stand-in of reference arch, train img/s "
                  f"(CPU {torch.get_num_threads()} threads, bucket 400x100, "
                  f"T={T}, B={B}, fp32)",
        "value": round(B * args.steps / dt, 2),
        "unit": "images/sec",
    }))


if __name__ == "__main__":
    main()
