#!/usr/bin/env python
"""Serving latency benchmark with warm-up precompile (BASELINE config #5).

Round-1 measurements carried first-compile pollution in the tail (p95
~750 ms at 25-30 QPS); `LatexOCRServer.warmup()` precompiles every
(bucket, max_batch) decode program before the first request. This script
re-runs the two round-1 benches against a trained run:

    python scripts/bench_serving.py --results results/synth50k --data data/synth50k

Bench 1: single-style mix at 30 QPS (printed test images).
Bench 2: mixed printed + handwritten-style request mix at 25 QPS.
Prints one JSON line per bench.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click


def _load_images(img_dir, limit=48):
    import numpy as np

    from latex_ocr_tpu.data.images import read_img

    files = sorted(f for f in os.listdir(img_dir) if f.endswith(".png"))[:limit]
    return [read_img(os.path.join(img_dir, f)) for f in files]


@click.command()
@click.option("--results", default="results/synth50k/")
@click.option("--data", "data_dir", default="data/synth50k/")
@click.option("--hw-data", default="data/hw400/")
@click.option("--max-len", default=51)
@click.option("--duration", default=8.0)
@click.option("--max-batch", default=16)
def main(results, data_dir, hw_data, max_len, duration, max_batch):
    from latex_ocr_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import time

    import jax
    import jax.numpy as jnp

    from latex_ocr_tpu.data.vocab import Vocab
    from latex_ocr_tpu.models.img2seq import Img2SeqModel
    from latex_ocr_tpu.serving import LatexOCRServer, run_qps_benchmark
    from latex_ocr_tpu.training.checkpoint import CheckpointManager
    from latex_ocr_tpu.utils import Config

    results = results.rstrip("/") + "/"
    data_dir = data_dir.rstrip("/") + "/"
    # restore the run's snapshotted config (model dims, encoder variant,
    # bucket table) so a non-flagship run serves with the shape it trained
    # on; snapshot-less legacy runs fall back to the flagship defaults below
    try:
        base = Config.from_run_dir(results).to_dict()
    except FileNotFoundError:
        base = {}
    buckets = base.get("buckets") or [
        [240, 100], [320, 80], [400, 100], [480, 100], [560, 100],
        [720, 120], [800, 100], [1000, 200]]
    cfg = Config({
        "encoder_cnn": "vanilla", "positional_embeddings": True,
        "attn_cell_config": {"cell_type": "lstm", "num_units": 512,
                             "dim_e": 256, "dim_o": 512, "dim_embeddings": 80},
        "unk": "_UNK", "pad": "_PAD", "end": "_END",
        "div_gamma": 1, "div_prob": 0,
        **base,
        "decoding": "greedy", "beam_size": 2,
        "max_length_formula": max_len,
        "path_vocab": data_dir + "vocab.txt",
        "batch_size": max_batch, "buckets": buckets,
    })
    vocab = Vocab(cfg)
    model = Img2SeqModel(cfg, vocab, compute_dtype=jnp.bfloat16,
                         decoder_dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    params = CheckpointManager(results + "model_weights").restore_params(
        params, required=True
    )

    # multi-model fleet: handwritten requests route to the hw fine-tune
    # (results/hw400, trained by eval_beam_and_handwritten.py) when present
    models = {"printed": (model, params)}
    hw_results = "results/hw400/model_weights"
    if os.path.isdir(hw_results):
        cfg_hw = Config(dict(cfg.to_dict(), path_vocab=hw_data.rstrip("/") + "/vocab.txt",
                             max_length_formula=21))
        vocab_hw = Vocab(cfg_hw)
        model_hw = Img2SeqModel(cfg_hw, vocab_hw, compute_dtype=jnp.bfloat16,
                                decoder_dtype=jnp.float32)
        params_hw = model_hw.init_params(jax.random.PRNGKey(0))
        try:
            params_hw = CheckpointManager(hw_results).restore_params(
                params_hw, required=True
            )
        except FileNotFoundError:
            # dir exists but holds no save (crashed fine-tune) — skip routing
            params_hw = None
        if params_hw is not None:
            models["handwritten"] = (model_hw, params_hw)

    printed = [(im, "printed") for im in _load_images(data_dir + "images_test/")]
    mixes = {"printed_30qps": (printed, 30.0)}
    hw_dir = hw_data.rstrip("/") + "/images_test/"
    if os.path.isdir(hw_dir):
        hw_name = "handwritten" if "handwritten" in models else "printed"
        hw = [(im, hw_name) for im in _load_images(hw_dir, 24)]
        mixes["mixed_printed_hw_25qps"] = (printed[:24] + hw, 25.0)

    for name, (imgs, qps) in mixes.items():
        server = LatexOCRServer(
            models=models, buckets=buckets, max_batch=max_batch,
            max_wait_ms=10.0, warmup=False,
        )
        t0 = time.perf_counter()
        n_prog = server.warmup()
        warm_s = time.perf_counter() - t0
        try:
            stats = run_qps_benchmark(server, imgs, qps=qps, duration_s=duration)
        finally:
            server.close()
        stats.update({"bench": name, "warmup_programs": n_prog,
                      "warmup_s": round(warm_s, 1)})
        print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                          for k, v in stats.items()}), flush=True)


if __name__ == "__main__":
    main()
