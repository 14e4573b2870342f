#!/usr/bin/env python
"""Confidence calibration report (r4 VERDICT #7).

Fits a temperature on the VAL split's sequence log-probs (Guo et al.
2017, sequence-level), then reports on TEST: ECE raw vs calibrated, the
reliability table, and the selective-prediction coverage curve. With
--transfer RUN_DIR it additionally checks threshold TRANSFER: the
confidence threshold picked at 90% coverage on this run's val is applied
to the transfer run's test scores (e.g. printed -> handwritten), reporting
the coverage and EM it actually achieves there — the question a
deployment reusing one threshold across domains needs answered.

Usage:
    python scripts/calibration_report.py --results results/im2latex2dLong \
        [--transfer results/hw5kStroke_s0]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latex_ocr_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import click  # noqa: E402
import jax  # noqa: E402
import numpy as np  # noqa: E402


def collect(results: str, split: str, batch_size: int = 64):
    """Decode a split with scores; returns (refs, hyps, scores)."""
    from latex_ocr_tpu.cli.common import build_split_pipeline, make_vocab
    from latex_ocr_tpu.models.img2seq import Img2SeqModel
    from latex_ocr_tpu.training.checkpoint import CheckpointManager
    from latex_ocr_tpu.training.trainer import Trainer
    from latex_ocr_tpu.utils import Config

    config = Config.from_run_dir(results)
    config.batch_size = batch_size
    config.pipeline = "cached"
    vocab = make_vocab(config)
    import jax.numpy as jnp

    model = Img2SeqModel(config, vocab, compute_dtype=jnp.bfloat16,
                         decoder_dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    params = CheckpointManager(
        os.path.join(results, "model_weights")).restore_params(
        params, required=True)
    trainer = Trainer(model, config, results)
    out_dir = os.path.join(results, f"calib_{split}/")
    trainer.evaluate(params, build_split_pipeline(config, vocab, split),
                     out_dir, with_scores=True)
    with open(os.path.join(out_dir, "ref.txt")) as f:
        refs = [ln.strip() for ln in f]
    with open(os.path.join(out_dir, "hyp_0.txt")) as f:
        hyps = [ln.strip() for ln in f]
    with open(os.path.join(out_dir, "hyp_0.scores.txt")) as f:
        scores = [float(ln) for ln in f]
    return refs, hyps, np.asarray(scores)


@click.command()
@click.option("--results", required=True)
@click.option("--transfer", default=None,
              help="Second run dir (e.g. the handwritten fine-tune): check "
                   "whether this run's val-picked threshold transfers")
@click.option("--batch-size", default=64)
def main(results, transfer, batch_size):
    from latex_ocr_tpu.evaluation.text import (calibration_report,
                                               fit_temperature)

    refs_v, hyps_v, s_val = collect(results, "val", batch_size)
    correct_v = np.array([r == h for r, h in zip(refs_v, hyps_v)])
    T = fit_temperature(s_val, correct_v)

    refs_t, hyps_t, s_test = collect(results, "test", batch_size)
    correct_t = np.array([r == h for r, h in zip(refs_t, hyps_t)])
    rep = calibration_report(s_test, correct_t, temperature=T)

    out = {
        "results": results,
        "val_n": len(s_val), "test_n": len(s_test),
        "val_em": round(100 * float(correct_v.mean()), 2),
        "test_em": round(100 * float(correct_t.mean()), 2),
        "temperature_fit_on_val": round(T, 4),
        "test_ece_raw": round(rep["ece_raw"], 4),
        "test_ece_calibrated": round(rep["ece_calibrated"], 4),
    }
    print(json.dumps(out))
    print("reliability (calibrated): bin_lo bin_hi mean_conf acc n")
    for lo, hi, conf, acc, n in rep["reliability"]:
        if n:
            print(f"  [{lo:.1f},{hi:.1f})  {conf:.3f}  {acc:.3f}  {n}")

    # threshold transfer: the val-picked 90%-coverage threshold applied
    # verbatim to another domain's test scores
    thr = float(np.sort(s_val)[::-1][max(0, int(round(0.9 * len(s_val))) - 1)])
    accept = s_test >= thr
    print(json.dumps({
        "same_domain_thr_cov90": round(thr, 6),
        "same_domain_test_coverage_pct": round(100 * float(accept.mean()), 1),
        "same_domain_test_em_at_thr": round(
            100 * float(correct_t[accept].mean()) if accept.any() else 0.0, 2),
    }))
    if transfer:
        refs_x, hyps_x, s_x = collect(transfer, "test", batch_size)
        correct_x = np.array([r == h for r, h in zip(refs_x, hyps_x)])
        acc_x = s_x >= thr
        rep_x = calibration_report(s_x, correct_x, temperature=T)
        print(json.dumps({
            "transfer_results": transfer,
            "transfer_test_em": round(100 * float(correct_x.mean()), 2),
            "transfer_coverage_at_printed_thr_pct": round(
                100 * float(acc_x.mean()), 1),
            "transfer_em_at_printed_thr": round(
                100 * float(correct_x[acc_x].mean()) if acc_x.any() else 0.0,
                2),
            "transfer_ece_with_printed_T": round(rep_x["ece_calibrated"], 4),
            "transfer_ece_raw": round(rep_x["ece_raw"], 4),
            "transfer_own_T": round(fit_temperature(
                s_x[: len(s_x) // 2], correct_x[: len(s_x) // 2]), 4),
        }))


if __name__ == "__main__":
    main()
