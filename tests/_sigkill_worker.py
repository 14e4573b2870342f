"""Subprocess worker for the SIGKILL mid-epoch resume test.

Usage: python _sigkill_worker.py <spec.json>

spec: {dataset: {...make_synthetic_dataset paths + buckets},
       out: run dir, cache: cache dir tag, n_epochs, save_every,
       die_after_steps: 0 = run to completion, K = SIGKILL the process
       (no cleanup, no flush — real crash semantics) inside train step K}
"""

import json
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("LATEX_OCR_NO_TB", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from latex_ocr_tpu.data.fast_pipeline import build_cached_pipeline  # noqa: E402
from latex_ocr_tpu.data.vocab import Vocab  # noqa: E402
from latex_ocr_tpu.models.img2seq import Img2SeqModel  # noqa: E402
from latex_ocr_tpu.training.trainer import Trainer  # noqa: E402
from latex_ocr_tpu.utils import Config, LRSchedule  # noqa: E402

TINY = {
    "encoder_cnn": "vanilla", "positional_embeddings": True,
    "attn_cell_config": {"cell_type": "lstm", "num_units": 16, "dim_e": 8,
                         "dim_o": 16, "dim_embeddings": 8},
    "decoding": "greedy", "max_length_formula": 20,
}


def main() -> None:
    spec = json.load(open(sys.argv[1]))
    ds = spec["dataset"]
    vocab = Vocab(Config({"unk": "_UNK", "pad": "_PAD", "end": "_END",
                          "path_vocab": ds["path_vocab"]}))

    def pipe(split):
        return build_cached_pipeline(
            ds[f"path_formulas_{split}"], ds[f"dir_images_{split}"],
            ds[f"path_matching_{split}"], vocab.form_prepro,
            os.path.join(spec["cache"], f"cache_{split}"),
            batch_size=8, id_pad=vocab.id_pad, id_end=vocab.id_end,
            max_len=20, buckets=ds["buckets"], max_formula_len=21,
            shuffle_seed=7,
        )

    config = Config(dict(
        TINY, batch_size=8, n_epochs=spec["n_epochs"], dropout=1.0,
        clip=-1, lr_method="adam", buckets=ds["buckets"], seed=3,
        save_every_steps=spec["save_every"],
    ))
    model = Img2SeqModel(config, vocab)

    die_after = int(spec.get("die_after_steps", 0))
    if die_after:
        orig = model.train_step
        state = {"n": 0}

        def wrapped(*args, **kwargs):
            out = orig(*args, **kwargs)
            state["n"] += 1
            if state["n"] >= die_after:
                # the real thing: no atexit, no flush, no orbax close
                os.kill(os.getpid(), signal.SIGKILL)
            return out

        model.train_step = wrapped

    trainer = Trainer(model, config, spec["out"])
    trainer.train(pipe("train"), pipe("val"), LRSchedule(lr_init=1e-3))
    print("WORKER DONE")


if __name__ == "__main__":
    main()
