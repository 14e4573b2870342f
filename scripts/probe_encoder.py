#!/usr/bin/env python
"""Encoder headroom probe (r3 VERDICT next-round #8).

design.md §11 established the encoder's convs run at ~84% MFU and the
SelectAndScatter pooling formulation beats the alternatives. This probe
measures the three levers §11 did NOT test, §11-style (accept or refute
with numbers):

  1. conv fusion  — the "cnn" encoder variant replaces the two asymmetric
     max-pools with one strided linear conv (reference encoder.py:54-56):
     fewer layout changes, more MXU work. Does it beat "vanilla"?
  2. pooling dtype — pools run in the bf16 compute dtype; an fp32-pool
     A/B isolates whether the reduce-window is dtype-bound.
  3. input-pipeline overlap — the bench feeds device-resident batches; a
     fresh host->device uint8 transfer per step measures how much the
     2.5 MB/step host path would cost if it were NOT overlapped/resident.

Run on an otherwise-idle chip (tunneled-chip wobble ~10%; rounds keep the
fastest). Prints one JSON line per variant plus a markdown table.

    python scripts/probe_encoder.py --rounds 3 --steps 30
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latex_ocr_tpu.utils.jax_setup import setup_jax

setup_jax()

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from latex_ocr_tpu.models import encoder as enc_mod
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.utils import Config

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=256)
ap.add_argument("--image", type=int, nargs=2, default=(50, 200))
ap.add_argument("--seq", type=int, default=64)
ap.add_argument("--steps", type=int, default=30)
ap.add_argument("--rounds", type=int, default=3)
args = ap.parse_args()

B, (H, W), T = args.batch, args.image, args.seq
rng = np.random.default_rng(0)
images_host = rng.integers(0, 256, size=(B, H, W, 1)).astype(np.uint8)
images = jnp.asarray(images_host)

rows = []


def timeit(fn, *fargs):
    """best-of-rounds mean ms/step; axon needs a value sync, not block_until_ready."""
    out = fn(*fargs)  # compile
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = float("inf")
    for _r in range(args.rounds):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(*fargs)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / args.steps * 1e3)
    return best


def encoder_fwd_bwd_ms(variant: str, pool_dtype=None) -> float:
    """Isolated encoder fwd+bwd (grad wrt params of a scalar readout)."""
    cfg = Config(dict(ge.FLAGSHIP_MODEL, encoder_cnn=variant))
    params = enc_mod.init_encoder_params(jax.random.PRNGKey(0), cfg)

    orig_pool = enc_mod._max_pool
    if pool_dtype is not None:
        def pool32(x, window, stride):
            return orig_pool(x.astype(pool_dtype), window, stride).astype(x.dtype)

        enc_mod._max_pool = pool32
    try:
        def loss(p, img):
            feat = enc_mod.encode(p, img, cfg, jnp.bfloat16)
            return jnp.sum(feat.astype(jnp.float32))

        step = jax.jit(jax.grad(loss))
        ms = timeit(step, params, images)
    finally:
        enc_mod._max_pool = orig_pool
    return ms


def train_step_ms(variant: str, host_transfer: bool) -> float:
    """Full train step; optionally paying a fresh host->device transfer per step."""
    cfg = dict(ge.FLAGSHIP_MODEL, encoder_cnn=variant, max_length_formula=T)
    vocab = ge._make_vocab(500)
    model = Img2SeqModel(Config(cfg), vocab, compute_dtype=jnp.bfloat16,
                         decoder_dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    opt = model.init_optimizer(params, "adam", clip=5.0)
    batch = ge._make_batch(B, H, W, T, vocab.n_tok, vocab.id_end)
    batch_dev = {k: jnp.asarray(v) for k, v in batch.items()}
    lr = jnp.float32(1e-4)
    key = jax.random.PRNGKey(1)

    # donation invalidates params/opt buffers each call; rebind from outputs
    def run_steps(n):
        nonlocal params, opt
        for _ in range(n):
            if host_transfer:
                feed = {"image": jnp.asarray(batch["image"]),
                        "formula": batch_dev["formula"],
                        "length": batch_dev["length"]}
            else:
                feed = batch_dev
            params, opt, metrics = model.train_step(params, opt, feed, lr, key, 1.0)
        return metrics

    m = run_steps(1)  # compile
    _ = float(m["loss"])
    best = float("inf")
    for _r in range(args.rounds):
        t0 = time.perf_counter()
        m = run_steps(args.steps)
        _ = float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / args.steps * 1e3)
    return best


def emit(name, ms, baseline_ms=None):
    row = {"variant": name, "ms": round(ms, 2)}
    if baseline_ms:
        row["vs_baseline"] = round(baseline_ms / ms, 3)
        row["img_per_s"] = round(B / ms * 1e3, 1)
    print(json.dumps(row), flush=True)
    rows.append(row)
    return ms


# --- 1+2: isolated encoder fwd+bwd -----------------------------------------
base = emit("encoder vanilla bf16 (baseline)", encoder_fwd_bwd_ms("vanilla"))
emit("encoder cnn variant (strided conv replaces asym pools)",
     encoder_fwd_bwd_ms("cnn"), base)
emit("encoder vanilla, fp32 pools", encoder_fwd_bwd_ms("vanilla", jnp.float32), base)

# --- full step: variant + input-path A/B ------------------------------------
step_base = emit("train_step vanilla, device-resident batch",
                 train_step_ms("vanilla", host_transfer=False))
emit("train_step vanilla, fresh host->device transfer each step",
     train_step_ms("vanilla", host_transfer=True), step_base)
emit("train_step cnn variant, device-resident batch",
     train_step_ms("cnn", host_transfer=False), step_base)

print("\n| variant | ms/step | vs baseline |")
print("|---|---|---|")
for r in rows:
    print(f"| {r['variant']} | {r['ms']} | {r.get('vs_baseline', '—')} |")
