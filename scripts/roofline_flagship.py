#!/usr/bin/env python
"""Flagship MFU roofline decomposition (r4 VERDICT #8).

Times and cost-analyzes the flagship train step's components at the bench
shape (B=256, stored bucket (50,200), T=64) to pin where the 45% MFU
ceiling comes from, then probes the named candidate push: bf16 decoder
compute (the transformer already runs LayerNorm/softmax in fp32
internally — models/transformer.py:22 — so bf16 matmuls are the
standard mixed-precision policy, not a numerics gamble).

Programs measured (each its own jit, identical shapes):
  fwd           full forward loss
  fwd+bwd       value_and_grad, no optimizer
  train         full fwd+bwd+adam (the bench program)
  encoder fwd   conv stack alone
  enc fwd+bwd   conv stack alone with grads
Per program: best-of-N wall time, XLA cost-analysis FLOPs, implied MFU.
Decoder cost = train - encoder share; adam cost = train - (fwd+bwd).

Usage: python scripts/roofline_flagship.py [--steps 30] [--rounds 6]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latex_ocr_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import __graft_entry__ as ge  # noqa: E402
from latex_ocr_tpu.models.encoder import encode  # noqa: E402
from latex_ocr_tpu.models.img2seq import Img2SeqModel  # noqa: E402
from latex_ocr_tpu.utils import Config  # noqa: E402

V5E_PEAK = 197e12


def timed(fn, args, steps, rounds, sync):
    out = fn(*args)  # compile
    _ = sync(out)
    best = None
    for _r in range(rounds):
        t0 = time.perf_counter()
        o = out
        for _ in range(steps):
            o = fn(*args)
        _ = sync(o)
        dt = (time.perf_counter() - t0) / steps
        best = dt if best is None else min(best, dt)
    return best


def _flops_from_lowered(lowered):
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def flops_of(fn, *args):
    try:
        return _flops_from_lowered(jax.jit(fn).lower(*args))
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    B, H, W, T = args.batch, 50, 200, 64
    vocab = ge._make_vocab(500)
    host = ge._make_batch(B, H, W, T, vocab.n_tok, vocab.id_end)
    rng = jax.random.PRNGKey(0)

    def build(decoder_dtype):
        cfg = Config(dict(ge.FLAGSHIP_MODEL))
        m = Img2SeqModel(cfg, vocab, compute_dtype=jnp.bfloat16,
                         decoder_dtype=decoder_dtype)
        p = m.init_params(rng)
        o = m.init_optimizer(p, "adam", clip=-1)
        return m, p, o

    model, params, opt0 = build(jnp.float32)
    batch = {k: jax.device_put(v) for k, v in host.items()}
    lr = jnp.float32(1e-3)

    results = {}

    # --- full train step (the bench program)
    # keep params/opt alive across donations by rebinding
    state = [params, opt0]

    def train_fn():
        p, o, m = model.train_step(state[0], state[1], batch, lr, rng, 1.0)
        state[0], state[1] = p, o
        return m

    t_train = timed(lambda: train_fn(), (), args.steps, args.rounds,
                    lambda m: float(m["loss"]))
    f_train = None
    try:
        f_train = _flops_from_lowered(type(model).train_step.lower(
            model, state[0], state[1], batch, lr, rng, 1.0))
    except Exception:
        pass
    results["train"] = (t_train, f_train)

    # --- forward-only loss
    params_f = state[0]

    def fwd(p):
        loss, _ = model._loss_fn(p, batch, rng, 1.0)
        return loss

    t_fwd = timed(jax.jit(fwd), (params_f,), args.steps, args.rounds, float)
    results["fwd"] = (t_fwd, flops_of(fwd, params_f))

    # --- fwd + bwd (no optimizer)
    def fwdbwd(p):
        (loss, _), g = jax.value_and_grad(model._loss_fn, has_aux=True)(
            p, batch, rng, 1.0)
        return loss, g

    jb = jax.jit(fwdbwd)
    t_fb = timed(jb, (params_f,), args.steps, args.rounds,
                 lambda o: float(o[0]))
    results["fwd+bwd"] = (t_fb, flops_of(fwdbwd, params_f))

    # --- encoder alone (fwd and fwd+bwd)
    cfg = model.config

    def enc_fwd(p):
        return jnp.sum(
            encode(p["encoder"], batch["image"], cfg, jnp.bfloat16)
            .astype(jnp.float32))

    t_ef = timed(jax.jit(enc_fwd), (params_f,), args.steps, args.rounds, float)
    results["encoder_fwd"] = (t_ef, flops_of(enc_fwd, params_f))

    def enc_fb(p):
        return jax.value_and_grad(enc_fwd)(p)

    jef = jax.jit(enc_fb)
    t_efb = timed(jef, (params_f,), args.steps, args.rounds,
                  lambda o: float(o[0]))
    results["encoder_fwd+bwd"] = (t_efb, flops_of(enc_fb, params_f))

    # --- candidate push: bf16 decoder compute
    model_b, params_b, opt_b = build(jnp.bfloat16)
    state_b = [params_b, opt_b]

    def train_b():
        p, o, m = model_b.train_step(state_b[0], state_b[1], batch, lr, rng, 1.0)
        state_b[0], state_b[1] = p, o
        return m

    t_tb = timed(lambda: train_b(), (), args.steps, args.rounds,
                 lambda m: float(m["loss"]))
    f_tb = None
    try:
        f_tb = _flops_from_lowered(type(model_b).train_step.lower(
            model_b, state_b[0], state_b[1], batch, lr, rng, 1.0))
    except Exception:
        pass
    results["train_bf16_decoder"] = (t_tb, f_tb)

    # --- report
    rows = {}
    for name, (t, f) in results.items():
        rows[name] = {
            "ms_per_step": round(1e3 * t, 3),
            "img_per_s": round(B / t, 1),
            "gflops_per_step": round(f / 1e9, 2) if f else None,
            "mfu_pct": round(100 * f / t / V5E_PEAK, 1) if f else None,
        }
    # derived shares of the f32-decoder train step
    t_train = results["train"][0]
    rows["derived"] = {
        "encoder_share_pct": round(100 * results["encoder_fwd+bwd"][0] / t_train, 1),
        "decoder_share_pct": round(
            100 * (results["fwd+bwd"][0] - results["encoder_fwd+bwd"][0]) / t_train, 1),
        "optimizer_share_pct": round(
            100 * (t_train - results["fwd+bwd"][0]) / t_train, 1),
        "bwd_over_fwd": round(
            (results["fwd+bwd"][0] - results["fwd"][0]) / results["fwd"][0], 2),
        "bf16_decoder_speedup": round(t_train / results["train_bf16_decoder"][0], 3),
    }
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
