#!/usr/bin/env python
"""Decode-latency bench: every decoder family x kernel path at one shape.

Reproduces the RESULTS.md decode numbers (previously measured ad hoc) as a
one-command sweep, and adds the transformer family's incremental KV-cache
decode — the number that decides whether the transformer needs its own
megakernel if it becomes the serving flagship.

Variants (greedy and beam-K for each):
  lstm/megakernel  — ops/decoder_kernel.py Pallas whole-loop kernel (TPU)
  lstm/xla         — models/decoding.py lax.while_loop
  transformer      — ops/transformer_kernel.py Pallas whole-loop kernels
                     (greedy + beam, TPU defaults)
  transformer_xla  — models/transformer.py incremental while_loop + KV cache

Prints one JSON line per variant: ms per batch, images/sec.

    python scripts/bench_decode.py --batch 256 --image 50 400 --max-len 150
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from latex_ocr_tpu.utils.jax_setup import setup_jax
setup_jax()
import argparse, json, time

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.utils import Config

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=256)
ap.add_argument("--image", type=int, nargs=2, default=(50, 400),
                help="input H W (stored-bucket shape after the LANCZOS /2)")
ap.add_argument("--max-len", type=int, default=150)
ap.add_argument("--beam", type=int, default=2)
ap.add_argument("--vocab", type=int, default=500)
ap.add_argument("--rounds", type=int, default=5,
                help="timed rounds; fastest kept (tunneled-chip contention)")
ap.add_argument("--variants",
                default="lstm_mega,lstm_xla,transformer,transformer_xla",
                help="comma list; transformer4 adds the 4L default config")
args = ap.parse_args()

H, W = args.image
vocab = ge._make_vocab(args.vocab)
rng = np.random.default_rng(0)
images = jnp.asarray(
    rng.integers(0, 256, size=(args.batch, H, W, 1)).astype(np.uint8))


def make_model(decoding: str, **over):
    cfg = dict(ge.FLAGSHIP_MODEL, decoding=decoding,
               beam_size=args.beam, max_length_formula=args.max_len, **over)
    model = Img2SeqModel(Config(cfg), vocab, compute_dtype=jnp.bfloat16,
                         decoder_dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def _gru(**kw):
    cell = dict(ge.REFERENCE_MODEL["attn_cell_config"], cell_type="gru")
    return dict(decoder_arch="attn_lstm", attn_cell_config=cell, **kw)


# FLAGSHIP_MODEL is the transformer 2L (r4 declaration): the attn-RNN
# variants pin decoder_arch back to the reference family explicitly
VARIANTS = {
    "lstm_mega": dict(decoder_arch="attn_lstm"),
    "lstm_xla": dict(decoder_arch="attn_lstm", use_decoder_megakernel=False),
    "gru_mega": _gru(),
    "gru_xla": _gru(use_decoder_megakernel=False),
    "transformer": dict(),  # the flagship config itself
    "transformer_xla": dict(use_decoder_megakernel=False),
    # bf16 cross-KV storage: halves the per-row cross-block VMEM, lifting
    # the beam megakernel's batch block at wide beams (K=5/R=300: 8 -> 16)
    "transformer_ckv16": dict(decode_cross_kv_dtype="bfloat16"),
    "transformer4": dict(
        transformer_config={"num_layers": 4, "num_heads": 8,
                            "dim_model": 256, "dim_ff": 1024}),
}


def bench(name: str, decoding: str) -> None:
    model, params = make_model(decoding, **VARIANTS[name])
    ids = model.decode_step(params, images)        # compile + settle
    np.asarray(ids)
    best = None
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        np.asarray(model.decode_step(params, images))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({
        "variant": name, "decoding": decoding,
        "beam": args.beam if decoding == "beam_search" else 1,
        "batch": args.batch, "image": [H, W], "max_len": args.max_len,
        "ms": round(best * 1e3, 1),
        "images_per_sec": round(args.batch / best, 1),
    }), flush=True)


for v in args.variants.split(","):
    bench(v, "greedy")
    bench(v, "beam_search")
