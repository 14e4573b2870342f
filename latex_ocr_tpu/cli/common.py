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


def build_split_pipeline(config: Config, vocab, split: str, sharding=None,
                         batch_size=None, shuffle: bool = False):
    """Split input for the Trainer: the fast cached pipeline when the
    config says `"pipeline": "cached"`, else the reference-semantics
    DataGenerator (Trainer wraps it in a BatchPipeline).

    The cached path is the product-speed pipeline (data/fast_pipeline.py:
    raw-pixel cache + native batch assembler + adaptive per-bucket batch +
    optional device-resident dataset) that the curriculum scripts train
    with; this helper puts it on the CLI chain too (r4 drill measured the
    host BatchPipeline at 126 img/s vs the cached path's thousands).
    Honored config keys: `length_bucket` (default 32),
    `target_batch_pixels` (default 64*100*500), `device_resident`
    (default "auto" on the train split when unsharded), `shuffle_data`
    (epoch-seeded reshuffle, train split only), `max_iter`.
    """
    if getattr(config, "pipeline", "reference") != "cached":
        return build_dataset(config, vocab, split)
    from ..data.fast_pipeline import build_cached_pipeline

    path_matching = getattr(config, f"path_matching_{split}")
    cache_dir = os.path.join(os.path.dirname(path_matching), f"cache_{split}")
    max_len = getattr(config, "max_length_formula", None)
    shuffle_seed = (
        int(getattr(config, "seed", 0))
        if (shuffle and getattr(config, "shuffle_data", False))
        else None
    )
    device_resident = getattr(config, "device_resident", "auto")
    if sharding is not None or split != "train":
        # device-resident HBM datasets and batch sharding are mutually
        # exclusive (fast_pipeline.py); eval splits iterate once per epoch
        device_resident = False
    return build_cached_pipeline(
        getattr(config, f"path_formulas_{split}"),
        getattr(config, f"dir_images_{split}"),
        path_matching,
        vocab.form_prepro,
        cache_dir,
        batch_size=batch_size or config.batch_size,
        id_pad=vocab.id_pad,
        id_end=vocab.id_end,
        max_len=max_len,
        buckets=getattr(config, "buckets", None),
        max_formula_len=(max_len + 1) if max_len else 151,
        length_bucket=int(getattr(config, "length_bucket", 32)),
        shuffle_seed=shuffle_seed,
        target_batch_pixels=int(
            getattr(config, "target_batch_pixels", 64 * 100 * 500)
        ),
        sharding=sharding,
        max_iter=getattr(config, "max_iter", None),
        device_resident=device_resident,
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
