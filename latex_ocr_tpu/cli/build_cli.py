"""`build` CLI: render formulas to PNGs for all splits and build the vocab.

Same flags and flow as the reference build.py:15-40: one data config and
one vocab config; renders train/val/test image dirs + matching files, then
builds vocab.txt from the train split.
"""

from __future__ import annotations

import click

from ..data.generator import DataGenerator
from ..data.vocab import build_vocab, pad_vocab, write_vocab
from ..utils import Config


@click.command()
@click.option("--data", default="configs/data_small.json", help="Path to data json config")
@click.option("--vocab", default="configs/vocab_small.json", help="Path to vocab json config")
def main(data: str, vocab: str) -> None:
    data_config = Config(data)
    vocab_config = Config(vocab)

    splits = {}
    for split in ("train", "test", "val"):
        splits[split] = DataGenerator(
            path_formulas=getattr(data_config, f"path_formulas_{split}"),
            dir_images=getattr(data_config, f"dir_images_{split}"),
            path_matching=getattr(data_config, f"path_matching_{split}"),
        )

    buckets = getattr(data_config, "buckets", None)
    for split, dataset in splits.items():
        click.echo(f"Building images for {split}...")
        dataset.build(buckets=buckets, n_threads=10)

    # rebuild generators so vocab counting sees the freshly written matching
    train = DataGenerator(
        path_formulas=data_config.path_formulas_train,
        dir_images=data_config.dir_images_train,
        path_matching=data_config.path_matching_train,
    )
    tokens = build_vocab([train], min_count=vocab_config.min_count_tok)
    # optional TPU-first alignment: pad with reserved tokens so the model
    # vocab (file + 3 specials) hits a lane-aligned size and compiled
    # program shapes survive dataset rebuilds (see data/vocab.py:pad_vocab)
    tokens = pad_vocab(tokens, getattr(vocab_config, "pad_multiple", 1))
    write_vocab(tokens, vocab_config.path_vocab)


if __name__ == "__main__":
    main()
