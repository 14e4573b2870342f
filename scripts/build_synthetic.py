#!/usr/bin/env python
"""Generate a synthetic dataset (printed or handwritten-style) + configs.

Usage:
    python scripts/build_synthetic.py --out data/synth2k --n-train 2000
    python scripts/build_synthetic.py --out data/hw2k --n-train 2000 --handwritten

Writes formulas/images/matching/vocab under --out plus a ready-to-use
data config JSON (data_<name>.json) and vocab config (vocab_<name>.json)
in configs/ so `train.py --data configs/data_<name>.json ...` works as-is.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click

DEFAULT_BUCKETS = [
    [240, 100], [320, 80], [400, 100], [480, 100], [560, 100],
    [720, 120], [800, 100], [1000, 200],
]


@click.command()
@click.option("--out", default="data/synth2k")
@click.option("--n-train", default=2000)
@click.option("--n-val", default=200)
@click.option("--n-test", default=200)
@click.option("--min-len", default=3)
@click.option("--max-len", default=30)
@click.option("--seed", default=11)
@click.option("--handwritten", is_flag=True, default=False)
@click.option("--hw-style", default="jitter",
              type=click.Choice(["jitter", "stroke"]),
              help="handwritten distribution: 'jitter' deforms printed "
                   "glyphs; 'stroke' renders smooth pen trajectories "
                   "(synthetic.py render_stroke_formula_array)")
@click.option("--n-threads", default=8)
@click.option("--buckets", "buckets_json", default=None,
              help='JSON bucket table, e.g. "[[240,100],[1600,200]]" '
                   "(default: the standard 8-bucket table)")
def main(out, n_train, n_val, n_test, min_len, max_len, seed, handwritten,
         hw_style, n_threads, buckets_json):
    from latex_ocr_tpu.data.synthetic import make_synthetic_dataset

    buckets = json.loads(buckets_json) if buckets_json else DEFAULT_BUCKETS
    paths = make_synthetic_dataset(
        out, n_train=n_train, n_val=n_val, n_test=n_test,
        min_len=min_len, max_len=max_len, seed=seed,
        buckets=buckets, n_threads=n_threads,
        handwritten=(hw_style if handwritten and hw_style == "stroke" else handwritten),
    )
    name = os.path.basename(out.rstrip("/"))
    data_cfg = {
        "export_name": "data.json",
        "dir_images_train": paths["dir_images_train"],
        "dir_images_val": paths["dir_images_val"],
        "dir_images_test": paths["dir_images_test"],
        "path_matching_train": paths["path_matching_train"],
        "path_matching_val": paths["path_matching_val"],
        "path_matching_test": paths["path_matching_test"],
        "path_formulas_train": paths["path_formulas_train"],
        "path_formulas_val": paths["path_formulas_val"],
        "path_formulas_test": paths["path_formulas_test"],
        "max_iter": None,
        "max_length_formula": max_len + 1,
        "bucket_train": True, "bucket_val": True, "bucket_test": True,
        "buckets": buckets,
    }
    vocab_cfg = {
        "export_name": "vocab.json",
        "unk": "_UNK", "pad": "_PAD", "end": "_END",
        "path_vocab": paths["path_vocab"],
        "min_count_tok": 0,
    }
    os.makedirs("configs", exist_ok=True)
    with open(f"configs/data_{name}.json", "w") as f:
        json.dump(data_cfg, f, indent=4)
    with open(f"configs/vocab_{name}.json", "w") as f:
        json.dump(vocab_cfg, f, indent=4)
    click.echo(f"dataset under {out}; configs/data_{name}.json + vocab_{name}.json written")


if __name__ == "__main__":
    main()
