"""Shared CLI plumbing: dataset/vocab/model construction from configs."""

from __future__ import annotations

import os

from ..data.generator import DataGenerator, default_img_prepro
from ..data.vocab import Vocab
from ..utils import Config


def build_dataset(config: Config, vocab, split: str, bucket: bool = True) -> DataGenerator:
    """DataGenerator for a split using the reference's config keys."""
    return DataGenerator(
        path_formulas=getattr(config, f"path_formulas_{split}"),
        dir_images=getattr(config, f"dir_images_{split}"),
        path_matching=getattr(config, f"path_matching_{split}"),
        img_prepro=default_img_prepro,
        form_prepro=vocab.form_prepro,
        bucket=getattr(config, f"bucket_{split}", bucket),
        max_iter=getattr(config, "max_iter", None),
        max_len=getattr(config, "max_length_formula", None),
    )


def load_run_config(dir_output: str, *names: str) -> Config:
    """Reload the config snapshot written into a run directory."""
    return Config([os.path.join(dir_output, n) for n in names])


def make_vocab(config: Config) -> Vocab:
    return Vocab(config)


def compute_dtype_from(config: Config):
    import jax.numpy as jnp

    name = getattr(config, "compute_dtype", "bfloat16")
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]
