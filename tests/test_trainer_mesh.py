"""Trainer with a data-parallel mesh on the 8-device CPU platform."""

import jax
import numpy as np
import pytest

from latex_ocr_tpu.data.generator import DataGenerator, default_img_prepro
from latex_ocr_tpu.data.pipeline import BatchPipeline
from latex_ocr_tpu.data.vocab import Vocab
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.parallel.mesh import batch_sharding, make_mesh
from latex_ocr_tpu.training.trainer import Trainer
from latex_ocr_tpu.utils import Config, LRSchedule

TINY = {
    "encoder_cnn": "vanilla", "positional_embeddings": True,
    "attn_cell_config": {"cell_type": "lstm", "num_units": 16, "dim_e": 8,
                          "dim_o": 16, "dim_embeddings": 8},
    "decoding": "greedy", "beam_size": 2, "div_gamma": 1, "div_prob": 0,
    "max_length_formula": 20,
}


def test_pipeline_with_sharding(small_dataset):
    mesh = make_mesh(jax.devices()[:8])
    vocab = Vocab(Config({"unk": "_UNK", "pad": "_PAD", "end": "_END",
                          "path_vocab": small_dataset["path_vocab"]}))
    train = DataGenerator(
        small_dataset["path_formulas_train"], small_dataset["dir_images_train"],
        small_dataset["path_matching_train"], img_prepro=default_img_prepro,
        form_prepro=vocab.form_prepro, bucket=True, bucket_size=8,
    )
    pipe = BatchPipeline(train, 8, vocab.id_pad, vocab.id_end,
                         buckets=small_dataset["buckets"], max_formula_len=21,
                         sharding=batch_sharding(mesh))
    batch = next(iter(pipe))
    assert len(batch["image"].sharding.device_set) == 8
    # every device holds exactly 1 of the 8 rows
    assert batch["image"].addressable_shards[0].data.shape[0] == 1


@pytest.mark.slow
def test_trainer_dp_mesh_epoch(mini_dataset, tmp_path):
    mesh = make_mesh(jax.devices()[:8])
    vocab = Vocab(Config({"unk": "_UNK", "pad": "_PAD", "end": "_END",
                          "path_vocab": mini_dataset["path_vocab"]}))
    config = Config(dict(
        TINY, batch_size=8, n_epochs=1, dropout=1.0, clip=-1,
        lr_method="adam", buckets=mini_dataset["buckets"], seed=0,
    ))
    model = Img2SeqModel(config, vocab)
    trainer = Trainer(model, config, str(tmp_path) + "/run/", mesh=mesh)

    def ds(split):
        return DataGenerator(
            mini_dataset[f"path_formulas_{split}"],
            mini_dataset[f"dir_images_{split}"],
            mini_dataset[f"path_matching_{split}"],
            img_prepro=default_img_prepro, form_prepro=vocab.form_prepro,
            bucket=True, bucket_size=8, max_len=20,
        )

    best = trainer.train(ds("train"), ds("val"), LRSchedule(lr_init=1e-3))
    assert best is not None and np.isfinite(best)
    # params ended replicated across the mesh
    leaf = jax.tree_util.tree_leaves(trainer._final_params)[0]
    assert len(leaf.sharding.device_set) == 8


@pytest.mark.slow
def test_trainer_dp_mesh_with_ema(mini_dataset, tmp_path):
    """EMA under a DP mesh: the donated _ema_step buffers and the
    jnp.copy seed must preserve the replicated sharding, and the
    published (_final_params) weights are the EMA tree."""
    mesh = make_mesh(jax.devices()[:8])
    vocab = Vocab(Config({"unk": "_UNK", "pad": "_PAD", "end": "_END",
                          "path_vocab": mini_dataset["path_vocab"]}))
    config = Config(dict(
        TINY, batch_size=8, n_epochs=1, dropout=1.0, clip=-1,
        lr_method="adam", buckets=mini_dataset["buckets"], seed=0,
        ema_decay=0.9, update_clip=1.0,
    ))
    model = Img2SeqModel(config, vocab)
    trainer = Trainer(model, config, str(tmp_path) + "/run/", mesh=mesh)

    def ds(split):
        return DataGenerator(
            mini_dataset[f"path_formulas_{split}"],
            mini_dataset[f"dir_images_{split}"],
            mini_dataset[f"path_matching_{split}"],
            img_prepro=default_img_prepro, form_prepro=vocab.form_prepro,
            bucket=True, bucket_size=8, max_len=20,
        )

    best = trainer.train(ds("train"), ds("val"), LRSchedule(lr_init=1e-3))
    assert best is not None and np.isfinite(best)
    # the published weights stay replicated across the mesh
    leaf = jax.tree_util.tree_leaves(trainer._final_params)[0]
    assert len(leaf.sharding.device_set) == 8
