"""End-to-end training smoke test on the synthetic dataset (SURVEY.md §4:
the reference's "make small" pipeline is the de-facto integration test).

A tiny model must train for one epoch without error, the loss must drop,
and evaluate() must produce ref/hyp files and finite metrics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from latex_ocr_tpu.data.generator import DataGenerator, default_img_prepro
from latex_ocr_tpu.data.pipeline import BatchPipeline, make_batch, snap_image_shape, snap_length
from latex_ocr_tpu.data.vocab import Vocab
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.training.trainer import Trainer
from latex_ocr_tpu.utils import Config, LRSchedule

TINY_MODEL = {
    "encoder_cnn": "vanilla",
    "positional_embeddings": True,
    "attn_cell_config": {
        "cell_type": "lstm",
        "num_units": 32,
        "dim_e": 16,
        "dim_o": 32,
        "dim_embeddings": 16,
    },
    "decoding": "greedy",
    "beam_size": 2,
    "div_gamma": 1,
    "div_prob": 0,
    "max_length_formula": 20,
}


def _vocab(small_dataset):
    return Vocab(
        Config(
            {
                "unk": "_UNK",
                "pad": "_PAD",
                "end": "_END",
                "path_vocab": small_dataset["path_vocab"],
            }
        )
    )


def _dataset(small_dataset, split, vocab, max_len=20):
    return DataGenerator(
        path_formulas=small_dataset[f"path_formulas_{split}"],
        dir_images=small_dataset[f"dir_images_{split}"],
        path_matching=small_dataset[f"path_matching_{split}"],
        img_prepro=default_img_prepro,
        form_prepro=vocab.form_prepro,
        bucket=True,
        bucket_size=8,
        max_len=max_len,
    )


# -------------------------------------------------------------- pipeline unit
def test_snap_length():
    assert snap_length(1, 32, 151) == 32
    assert snap_length(33, 32, 151) == 64
    assert snap_length(150, 32, 151) == 151
    assert snap_length(64, 32, 151) == 64


def test_snap_image_shape():
    buckets = [(50, 120), (40, 160)]
    assert snap_image_shape((48, 100), buckets) == (50, 120)
    assert snap_image_shape((30, 150), buckets) == (40, 160)
    # no bucket fits: round up to /8 multiples
    assert snap_image_shape((101, 333), buckets) == (104, 336)


def test_make_batch_static_shape_and_tail_padding():
    imgs = [np.zeros((20, 30, 1), np.uint8), np.zeros((18, 28, 1), np.uint8)]
    forms = [[1, 2, 3], [4]]
    batch = make_batch(imgs, forms, id_pad=0, id_end=9, batch_size=4,
                       stored_buckets=[(24, 32)], length_bucket=8, max_formula_len=21)
    assert batch["image"].shape == (4, 24, 32, 1)
    assert batch["formula"].shape == (4, 8)
    assert batch["image"][2].min() == 255  # padding rows are white
    np.testing.assert_array_equal(batch["length"], [4, 2, 0, 0])
    assert int(batch["n_real"]) == 2


def test_pipeline_single_shape_batches(small_dataset):
    vocab = _vocab(small_dataset)
    train = _dataset(small_dataset, "train", vocab)
    pipe = BatchPipeline(train, 8, vocab.id_pad, vocab.id_end,
                         buckets=small_dataset["buckets"], max_formula_len=21)
    batches = list(pipe)
    assert len(batches) >= 5
    for b in batches:
        assert b["image"].dtype == np.uint8
        assert b["image"].shape[0] == 8
        assert b["formula"].shape[0] == 8


# ------------------------------------------------------------------ training
@pytest.mark.slow
def test_train_one_epoch_loss_drops(small_dataset, tmp_path):
    vocab = _vocab(small_dataset)
    config = Config(
        dict(
            TINY_MODEL,
            batch_size=8,
            n_epochs=1,
            dropout=1.0,
            clip=-1,
            lr_method="adam",
            buckets=small_dataset["buckets"],
            seed=0,
        )
    )
    model = Img2SeqModel(config, vocab)
    trainer = Trainer(model, config, str(tmp_path) + "/run/")
    train = _dataset(small_dataset, "train", vocab)
    val = _dataset(small_dataset, "val", vocab)

    import jax

    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    opt_state = model.init_optimizer(params)

    losses = []
    pipe = BatchPipeline(train, 8, vocab.id_pad, vocab.id_end,
                         buckets=small_dataset["buckets"], max_formula_len=21)
    for epoch in range(3):
        for batch in pipe:
            batch = dict(batch)
            batch.pop("n_real")
            params, opt_state, metrics = model.train_step(
                params, opt_state, batch, jnp.float32(1e-3), rng, 1.0
            )
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, f"loss did not drop: {losses[0]} -> {losses[-1]}"

    # evaluate produces files + finite metrics
    scores = trainer.evaluate(params, val, str(tmp_path) + "/answers/")
    assert "BLEU-4" in scores and np.isfinite(scores["perplexity"])
    import os

    assert os.path.exists(str(tmp_path) + "/answers/ref.txt")
    assert os.path.exists(str(tmp_path) + "/answers/hyp_0.txt")


@pytest.mark.slow
def test_trainer_full_loop_and_checkpoint(small_dataset, tmp_path):
    vocab = _vocab(small_dataset)
    config = Config(
        dict(
            TINY_MODEL,
            batch_size=8,
            n_epochs=2,
            dropout=0.9,
            clip=5.0,
            lr_method="adam",
            buckets=small_dataset["buckets"],
            seed=0,
        )
    )
    model = Img2SeqModel(config, vocab)
    trainer = Trainer(model, config, str(tmp_path) + "/run/")
    train = _dataset(small_dataset, "train", vocab)
    val = _dataset(small_dataset, "val", vocab)
    lr = LRSchedule(lr_init=1e-3, lr_min=1e-4, start_decay=50, end_decay=100)
    best = trainer.train(train, val, lr)
    assert best is not None and np.isfinite(best)
    import os

    ckpt_dir = str(tmp_path) + "/run/model_weights"
    assert os.path.exists(ckpt_dir) and len(os.listdir(ckpt_dir)) > 0


# ------------------------------------------------- megakernel compile fallback
def test_eval_decode_megakernel_compile_fallback(small_dataset, tmp_path):
    """A decode-megakernel compile-resource failure during evaluation must
    degrade to the XLA loop, not kill the run (the r4 beam-5 sweep died on
    Mosaic register-spill VMEM overflow the budget model cannot predict).
    Unit-level: _decode_fallback_model swaps in an XLA-loop sibling on
    resource errors and re-raises everything else; integration-level: an
    evaluate() whose first decode raises finishes on the sibling."""
    import jax

    cfg = Config(
        {
            **TINY_MODEL,
            "use_decoder_megakernel": True,  # force ON (auto is off on CPU)
            "batch_size": 8,
            "dir_output": str(tmp_path) + "/",
        }
    )
    vocab = _vocab(small_dataset)
    model = Img2SeqModel(cfg, vocab, compute_dtype=jnp.float32)
    assert model.use_megakernel
    trainer = Trainer(model, cfg, str(tmp_path) + "/")

    # non-resource errors re-raise unchanged
    with pytest.raises(ValueError, match="unrelated"):
        trainer._decode_fallback_model(ValueError("unrelated"))

    sibling = trainer._decode_fallback_model(
        RuntimeError("Ran out of memory in memory space vmem. Used 147.24M")
    )
    assert not sibling.use_megakernel
    assert hash(sibling) != hash(model)  # fresh programs, not stale reuse
    assert trainer._decode_fallback_model(RuntimeError("vmem")) is sibling

    # with the fallback installed, evaluate() runs fully on the XLA loop
    params = model.init_params(jax.random.PRNGKey(0))
    val = _dataset(small_dataset, "val", vocab)
    scores = trainer.evaluate(params, val, str(tmp_path) + "/answers/")
    assert np.isfinite(scores["perplexity"])

    # a fallback whose megakernel is already off re-raises resource errors
    trainer2 = Trainer(sibling, cfg, str(tmp_path) + "/")
    with pytest.raises(RuntimeError, match="vmem"):
        trainer2._decode_fallback_model(RuntimeError("vmem"))


def test_train_with_spike_guard(small_dataset, tmp_path):
    """`spike_guard: true` wires SpikeGuard through the train loop: the lr
    column in metrics.jsonl is the effective (possibly cooled) lr and the
    trigger counter is recorded."""
    import json

    import jax

    vocab = _vocab(small_dataset)
    config = Config(
        dict(
            TINY_MODEL,
            batch_size=8,
            n_epochs=1,
            dropout=1.0,
            clip=-1,
            lr_method="adam",
            buckets=small_dataset["buckets"],
            seed=0,
            spike_guard=True,
            eval_every=1,
        )
    )
    model = Img2SeqModel(config, vocab)
    trainer = Trainer(model, config, str(tmp_path) + "/run/")
    train = _dataset(small_dataset, "train", vocab)
    val = _dataset(small_dataset, "val", vocab)
    from latex_ocr_tpu.utils import LRSchedule

    trainer.train(train, val, LRSchedule(lr_init=1e-3, lr_min=1e-4))
    rows = [json.loads(l) for l in open(str(tmp_path) + "/run/metrics.jsonl")]
    train_rows = [r for r in rows if "spike_guard_triggers" in r]
    assert train_rows, "guard counter missing from train metrics"
    assert all(r["spike_guard_triggers"] == 0 for r in train_rows)  # no spike here
