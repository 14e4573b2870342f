#!/usr/bin/env python
"""Full-model decode parity on a REAL trained checkpoint (north star).

Loads a trained run, decodes real test images through BOTH the JAX model
(models/{encoder,decoder,decoding}.py) and the independent torch oracle
(evaluation/oracle.py) at equal fp32 weights, and asserts token-identical
greedy AND beam output — the BASELINE.json north star ("decoded sequences
bit-identical ... at equal checkpoints") made checkable without the
unavailable TF1 reference. CI pins the machinery with random weights
(tests/test_full_model_parity.py); this script is the real-checkpoint leg:

    python scripts/parity_oracle.py --results results/hw5kStroke_v2_s0 \
        --data data/hw5kStroke --n-images 64

Runs on CPU (fp32 both sides; the production bf16 encoder is a declared
numerics change, and the chip may be busy training).
"""
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("LATEX_OCR_NO_TB", "1")

import click
import numpy as np


@click.command()
@click.option("--results", default="results/hw5kStroke_v2_s0/")
@click.option("--data", "data_dir", default="data/hw5kStroke/")
@click.option("--n-images", default=64, help="total images across shape groups")
@click.option("--batch-size", default=16)
@click.option("--beam", default=2)
@click.option("--alpha", default=0.0, help="GNMT length-norm re-rank alpha")
def main(results, data_dir, n_images, batch_size, beam, alpha):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from latex_ocr_tpu.data.generator import DataGenerator, default_img_prepro
    from latex_ocr_tpu.data.vocab import Vocab
    from latex_ocr_tpu.evaluation.oracle import make_oracle
    from latex_ocr_tpu.models.decoding import decode_beam, decode_greedy
    from latex_ocr_tpu.models.encoder import encode
    from latex_ocr_tpu.models.img2seq import Img2SeqModel
    from latex_ocr_tpu.models.transformer import (
        transformer_cfg,
        transformer_decode_beam,
        transformer_decode_greedy,
    )
    from latex_ocr_tpu.training.checkpoint import CheckpointManager
    from latex_ocr_tpu.utils import Config

    results = results.rstrip("/") + "/"
    data_dir = data_dir.rstrip("/") + "/"
    config = Config.from_run_dir(results)
    arch = getattr(config, "decoder_arch", "attn_lstm")
    if getattr(config, "encoder_cnn", "vanilla") != "vanilla" or arch not in (
        "attn_lstm", "transformer",
    ):
        raise click.ClickException(
            "oracle covers the vanilla-encoder attn-RNN and transformer families"
        )
    num_heads = transformer_cfg(config)["num_heads"] if arch == "transformer" else 8

    vocab = Vocab(config)
    model = Img2SeqModel(
        config, vocab, compute_dtype=jnp.float32, decoder_dtype=jnp.float32
    )
    params = model.init_params(jax.random.PRNGKey(0))
    params = CheckpointManager(results + "model_weights").restore_params(
        params, required=True
    )
    max_len = model.max_length
    id_end = model.id_end

    # group real test images by shape into fixed batches
    test_set = DataGenerator(
        data_dir + "test.formulas.norm.txt",
        data_dir + "images_test/",
        data_dir + "test.matching.txt",
        img_prepro=default_img_prepro,
        form_prepro=vocab.form_prepro,
        bucket=True,
        bucket_size=batch_size,
        max_len=max_len,
    )
    groups = defaultdict(list)
    taken = 0
    for img, _formula in test_set:
        groups[img.shape].append(img)
        taken += 1
        if taken >= n_images:
            break

    total = greedy_ok = beam_ok = 0
    max_lp_diff = 0.0
    for shape, imgs in groups.items():
        batch = np.stack(imgs).astype(np.uint8)
        if batch.ndim == 3:
            batch = batch[..., None]
        feat_jax = encode(params["encoder"], jnp.asarray(batch), config, jnp.float32)
        if arch == "transformer":
            ids_g = np.asarray(
                transformer_decode_greedy(
                    params["decoder"], feat_jax, max_len, id_end, num_heads=num_heads
                )
            )
            out_b = transformer_decode_beam(
                params["decoder"], feat_jax, max_len, id_end, beam,
                length_norm_alpha=alpha, num_heads=num_heads,
            )
        else:
            ids_g = np.asarray(
                decode_greedy(params["decoder"], feat_jax, max_len, id_end)
            )
            out_b = decode_beam(
                params["decoder"], feat_jax, max_len, id_end, beam,
                length_norm_alpha=alpha,
            )

        oracle = make_oracle(params, id_end, num_heads=num_heads)
        feat_t = oracle.encode(batch)
        ids_g_t = oracle.decode_greedy(feat_t, max_len)
        ids_b_t, lp_t = oracle.decode_beam(feat_t, max_len, beam, length_norm_alpha=alpha)

        g_match = (ids_g == ids_g_t).all(axis=1)
        b_match = (np.asarray(out_b.ids) == ids_b_t).all(axis=(1, 2))
        greedy_ok += int(g_match.sum())
        beam_ok += int(b_match.sum())
        total += len(imgs)
        max_lp_diff = max(
            max_lp_diff,
            float(np.abs(np.asarray(out_b.log_probs) - lp_t).max()),
        )
        print(
            f"shape {shape}: {len(imgs)} imgs, greedy {int(g_match.sum())}/{len(imgs)},"
            f" beam-{beam} {int(b_match.sum())}/{len(imgs)}",
            flush=True,
        )

    summary = {
        "results": results,
        "images": total,
        "greedy_token_identical": greedy_ok,
        "beam_token_identical": beam_ok,
        "beam": beam,
        "alpha": alpha,
        "max_log_prob_abs_diff": max_lp_diff,
        "pass": bool(greedy_ok == total and beam_ok == total),
    }
    print(json.dumps(summary))
    if not summary["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
