"""`evaluate_txt` CLI: restore a run, decode the test set, score text metrics.

Mirrors reference evaluate_txt.py:16-49: reloads the config snapshot from
the run dir, restores the best checkpoint, writes ref/hyp files and prints
BLEU-4 / exact match / edit distance / perplexity.
"""

from __future__ import annotations

import os

import click
import jax

from ..utils import Config
from .common import build_split_pipeline, compute_dtype_from, make_vocab


@click.command()
@click.option("--results", default="results/small/", help="Run dir with config snapshot + weights")
@click.option("--batch_size", default=20)
@click.option("--decoding", default=None, type=click.Choice(["greedy", "beam_search"]),
              help="override the snapshot's decoding mode")
@click.option("--beam-size", default=None, type=int, help="override beam width")
@click.option("--length-norm-alpha", default=None, type=float,
              help="override GNMT length-norm alpha")
@click.option("--coverage-beta", default=None, type=float,
              help="override GNMT coverage-penalty beta (attn_lstm beams)")
@click.option("--scores", is_flag=True,
              help="collect per-hypothesis confidences: writes "
                   "hyp_0.scores.txt next to the answers and reports the "
                   "selective-prediction table (EM at confidence coverage "
                   "100/90/75/50% — the rejection-threshold operating curve)")
def main(results: str, batch_size: int, decoding, beam_size,
         length_norm_alpha, coverage_beta, scores: bool) -> None:
    from ..utils.jax_setup import setup_jax

    setup_jax()
    config = Config.from_run_dir(results)
    config.batch_size = batch_size
    # decode-quality overrides: sweep a trained run without editing its
    # snapshot (scripts/sweep_beam_alpha.py drives the full grid)
    for key, val in (("decoding", decoding), ("beam_size", beam_size),
                     ("length_norm_alpha", length_norm_alpha),
                     ("coverage_beta", coverage_beta)):
        if val is not None:
            setattr(config, key, val)
    vocab = make_vocab(config)

    from ..models.img2seq import Img2SeqModel
    from ..training.checkpoint import CheckpointManager
    from ..training.trainer import Trainer

    model = Img2SeqModel(config, vocab, compute_dtype=compute_dtype_from(config))
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(os.path.join(results, "model_weights"))
    restored = ckpt.restore_params(params)
    if restored is None:
        raise click.ClickException(f"No checkpoint found under {results}model_weights")
    params = restored

    test_set = build_split_pipeline(config, vocab, "test",
                                    batch_size=batch_size)
    trainer = Trainer(model, config, results)
    report = trainer.evaluate(params, test_set,
                              os.path.join(results, "formulas_test/"),
                              with_scores=scores)
    for k, v in report.items():
        # confidence thresholds are log-probs often in (-0.01, 0); two
        # decimals would render every one as "-0.00"
        click.echo(f"{k} = {v:.6f}" if k.startswith("conf") else f"{k} = {v:.2f}")


if __name__ == "__main__":
    main()
