#!/usr/bin/env python
"""Beam megakernel vs XLA-loop beam at REAL checkpoint scale (r4).

The r4 flagship beam-5 alpha=0 sweep cell scored EM 98.73 where greedy and
beam-2 score 99.67 — either the textbook no-length-norm beam curse or a
wide-beam megakernel defect the toy-dim interpret tests cannot see. This
decides it: decode the same test images through BOTH the Pallas beam
megakernel and the XLA while_loop beam at equal weights on the chip and
compare token output. Disagreement localizes a kernel bug; agreement makes
the sweep row a genuine decoding-behavior result.

    python scripts/check_beam_kernel_vs_xla.py \
        --results results/im2latexSynLongBoost_tfx --data data/im2latexSynLong \
        --beam 5 --alpha 0 --n-images 64
"""
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np


@click.command()
@click.option("--results", default="results/im2latexSynLongBoost_tfx/")
@click.option("--data", "data_dir", default="data/im2latexSynLong/")
@click.option("--n-images", default=64)
@click.option("--batch-size", default=16)
@click.option("--beam", default=5)
@click.option("--alpha", default=0.0)
def main(results, data_dir, n_images, batch_size, beam, alpha):
    from latex_ocr_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from latex_ocr_tpu.data.generator import DataGenerator, default_img_prepro
    from latex_ocr_tpu.data.vocab import Vocab
    from latex_ocr_tpu.models.img2seq import Img2SeqModel
    from latex_ocr_tpu.training.checkpoint import CheckpointManager
    from latex_ocr_tpu.utils import Config

    results = results.rstrip("/") + "/"
    data_dir = data_dir.rstrip("/") + "/"
    base = Config.from_run_dir(results).to_dict()

    def build(mega: bool):
        cfg = Config({**base, "decoding": "beam_search", "beam_size": beam,
                      "length_norm_alpha": alpha, "coverage_beta": 0.0,
                      "use_decoder_megakernel": mega,
                      "path_vocab": data_dir + "vocab.txt"})
        vocab = Vocab(cfg)
        return Img2SeqModel(cfg, vocab, compute_dtype=jnp.bfloat16,
                            decoder_dtype=jnp.float32)

    m_mega, m_xla = build(True), build(False)
    params = m_mega.init_params(jax.random.PRNGKey(0))
    params = CheckpointManager(results + "model_weights").restore_params(
        params, required=True
    )

    test_set = DataGenerator(
        data_dir + "test.formulas.norm.txt", data_dir + "images_test/",
        data_dir + "test.matching.txt", img_prepro=default_img_prepro,
        form_prepro=m_mega.vocab.form_prepro, bucket=True,
        bucket_size=batch_size, max_len=m_mega.max_length - 1,
    )
    groups = defaultdict(list)
    taken = 0
    for img, _f in test_set:
        groups[img.shape].append(img)
        taken += 1
        if taken >= n_images:
            break

    total = match = best_match = 0
    for shape, imgs in groups.items():
        batch = np.stack(imgs).astype(np.uint8)
        if batch.ndim == 3:
            batch = batch[..., None]
        ids_m = np.asarray(m_mega.decode_step(params, jnp.asarray(batch)))
        ids_x = np.asarray(m_xla.decode_step(params, jnp.asarray(batch)))
        same_all = (ids_m == ids_x).all(axis=(1, 2))
        same_best = (ids_m[:, 0] == ids_x[:, 0]).all(axis=1)
        total += len(imgs)
        match += int(same_all.sum())
        best_match += int(same_best.sum())
        print(f"shape {shape}: {len(imgs)} imgs, all-beams identical "
              f"{int(same_all.sum())}/{len(imgs)}, best-hyp identical "
              f"{int(same_best.sum())}/{len(imgs)}", flush=True)
        for b in np.nonzero(~same_best)[0][:2]:
            print("  mega best:", ids_m[b, 0, :40].tolist())
            print("  xla  best:", ids_x[b, 0, :40].tolist())

    summary = {"beam": beam, "alpha": alpha, "images": total,
               "all_beams_identical": match, "best_hyp_identical": best_match,
               "pass": bool(best_match == total)}
    print(json.dumps(summary))
    if not summary["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
