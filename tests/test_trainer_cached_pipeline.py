"""Trainer driven by the cached native pipeline end to end."""

import numpy as np
import pytest

from latex_ocr_tpu.data.fast_pipeline import build_cached_pipeline
from latex_ocr_tpu.data.vocab import Vocab
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.training.trainer import Trainer
from latex_ocr_tpu.utils import Config, LRSchedule

TINY = {
    "encoder_cnn": "vanilla", "positional_embeddings": True,
    "attn_cell_config": {"cell_type": "lstm", "num_units": 16, "dim_e": 8,
                          "dim_o": 16, "dim_embeddings": 8},
    "decoding": "greedy", "max_length_formula": 20,
}


@pytest.mark.slow
def test_trainer_with_cached_pipeline(mini_dataset, tmp_path):
    vocab = Vocab(Config({"unk": "_UNK", "pad": "_PAD", "end": "_END",
                          "path_vocab": mini_dataset["path_vocab"]}))
    config = Config(dict(TINY, batch_size=8, n_epochs=1, dropout=1.0, clip=-1,
                         lr_method="adam", buckets=mini_dataset["buckets"], seed=0))
    model = Img2SeqModel(config, vocab)

    def pipe(split, shuffle):
        return build_cached_pipeline(
            mini_dataset[f"path_formulas_{split}"],
            mini_dataset[f"dir_images_{split}"],
            mini_dataset[f"path_matching_{split}"],
            vocab.form_prepro,
            str(tmp_path / f"cache_{split}"),
            batch_size=8, id_pad=vocab.id_pad, id_end=vocab.id_end,
            max_len=20, buckets=mini_dataset["buckets"],
            max_formula_len=21, shuffle_seed=0 if shuffle else None,
        )

    trainer = Trainer(model, config, str(tmp_path) + "/run/")
    best = trainer.train(pipe("train", True), pipe("val", False), LRSchedule(lr_init=1e-3))
    assert best is not None and np.isfinite(best)
