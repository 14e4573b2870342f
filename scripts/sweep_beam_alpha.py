#!/usr/bin/env python
"""Beam-width x length-norm quality sweep (BASELINE config #3).

Runs the decode-quality grid beam {1, 2, 5} x GNMT length-norm alpha
{0, 0.6, 1.0} over a trained run's test split in ONE invocation, so the
real-im2latex rerun is a one-liner later:

    python scripts/sweep_beam_alpha.py --results results/synth50k \
        --data data/synth50k --max-len 51

Prints one JSON line per cell plus a final markdown table. Beam 1 with
alpha 0 is decoded greedily (identical output by construction,
models/decoding.py invariants) so the grid has 7 distinct decode runs.
"""
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click


@click.command()
@click.option("--results", default="results/synth50k/")
@click.option("--data", "data_dir", default="data/synth50k/")
@click.option("--max-len", default=51)
@click.option("--batch-size", default=64)
@click.option("--beams", default="1,2,5")
@click.option("--alphas", default="0,0.6,1.0")
@click.option("--coverage-betas", default="0",
              help="GNMT coverage-penalty betas to add to the grid "
                   "(models/decoding.py coverage_log_penalty); beam>1 "
                   "cells only — coverage re-ranks among beams")
@click.option("--extra-config", default="",
              help="JSON object merged into every cell's model config "
                   "(e.g. '{\"decode_cross_kv_dtype\": \"bfloat16\"}')")
def main(results, data_dir, max_len, batch_size, beams, alphas,
         coverage_betas, extra_config):
    from latex_ocr_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from latex_ocr_tpu.data.generator import DataGenerator, default_img_prepro
    from latex_ocr_tpu.data.vocab import Vocab
    from latex_ocr_tpu.models.img2seq import Img2SeqModel
    from latex_ocr_tpu.training.checkpoint import CheckpointManager
    from latex_ocr_tpu.training.trainer import Trainer
    from latex_ocr_tpu.utils import Config

    results = results.rstrip("/") + "/"
    data_dir = data_dir.rstrip("/") + "/"
    # restore the run's snapshotted config (model dims, encoder variant,
    # bucket table) instead of assuming the flagship shape — a run trained
    # with different dims or the wide 12-bucket table must sweep as trained.
    # Runs from before snapshots were universal may have none: fall back to
    # the flagship defaults below rather than crashing the chain.
    try:
        base = Config.from_run_dir(results).to_dict()
    except FileNotFoundError:
        base = {}
    buckets = base.get("buckets") or [
        [240, 100], [320, 80], [400, 100], [480, 100], [560, 100],
        [720, 120], [800, 100], [1000, 200]]
    if os.path.exists(data_dir + "buckets.json"):
        with open(data_dir + "buckets.json") as f:
            buckets = json.load(f)

    rows = []
    params = None
    for beam, alpha, beta in itertools.product(
        [int(b) for b in beams.split(",")],
        [float(a) for a in alphas.split(",")],
        [float(b) for b in coverage_betas.split(",")],
    ):
        if beam == 1 and (alpha != 0.0 or beta != 0.0):
            continue  # re-ranking is a no-op on a single hypothesis
        cfg = Config({
            "encoder_cnn": "vanilla", "positional_embeddings": True,
            "attn_cell_config": {"cell_type": "lstm", "num_units": 512,
                                 "dim_e": 256, "dim_o": 512,
                                 "dim_embeddings": 80},
            "unk": "_UNK", "pad": "_PAD", "end": "_END",
            "div_gamma": 1, "div_prob": 0,
            **base,
            "decoding": "greedy" if beam == 1 else "beam_search",
            "beam_size": beam,
            "length_norm_alpha": alpha,
            "coverage_beta": beta,
            "max_length_formula": max_len,
            "path_vocab": data_dir + "vocab.txt",
            "batch_size": batch_size, "buckets": buckets,
            **(json.loads(extra_config) if extra_config else {}),
        })
        vocab = Vocab(cfg)
        model = Img2SeqModel(cfg, vocab, compute_dtype=jnp.bfloat16,
                             decoder_dtype=jnp.float32)
        if params is None:
            params = model.init_params(jax.random.PRNGKey(0))
            params = CheckpointManager(results + "model_weights").restore_params(
                params, required=True
            )
        test_set = DataGenerator(
            data_dir + "test.formulas.norm.txt", data_dir + "images_test/",
            data_dir + "test.matching.txt", img_prepro=default_img_prepro,
            form_prepro=vocab.form_prepro, bucket=True,
            bucket_size=batch_size, max_len=max_len,
        )
        trainer = Trainer(model, cfg, results)
        tag = f"beam{beam}_alpha{alpha:g}" + (f"_cov{beta:g}" if beta else "")
        scores = trainer.evaluate(params, test_set, results + f"sweep_{tag}/")
        row = {"beam": beam, "alpha": alpha, "cov_beta": beta,
               **{k: round(v, 3) for k, v in scores.items()}}
        print(json.dumps(row), flush=True)
        rows.append(row)

    print("\n| beam | alpha | cov_beta | BLEU-4 | EM | EditDist | perplexity |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['beam']} | {r['alpha']:g} | {r['cov_beta']:g} | {r.get('BLEU-4', 0):.2f} "
            f"| {r.get('ExactMatchScore', 0):.2f} | {r.get('EditDistance', 0):.2f} "
            f"| {r.get('perplexity', 0):.4f} |"
        )


if __name__ == "__main__":
    main()
