"""Train the flagship on im2latexSyn: REAL im2latex formulas (reference
data/val+test formula files read at runtime by build_im2latex_syn.py),
synthetic raster. Quality here measures learning the real LaTeX token
distribution (268-token vocab, lengths to 150) through the full pipeline.

Run scripts/build_im2latex_syn.py first.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from latex_ocr_tpu.utils.jax_setup import setup_jax
setup_jax()
import argparse, json, time
import jax, jax.numpy as jnp
from latex_ocr_tpu.data.vocab import Vocab
from latex_ocr_tpu.data.fast_pipeline import build_cached_pipeline
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.training.trainer import Trainer
from latex_ocr_tpu.utils import Config, LRSchedule

ap = argparse.ArgumentParser()
ap.add_argument("--data-dir", default="data/im2latexSyn")
ap.add_argument("--out", default="results/im2latexSyn/")
ap.add_argument("--dropout", type=float, default=0.65,
                help="keep probability (TF semantics, reference model.json)")
ap.add_argument("--n-epochs", type=int, default=60)
args = ap.parse_args()

base = args.data_dir.rstrip("/") + "/"
with open(base + "buckets.json") as f:
    buckets = json.load(f)
cfg = Config({
    "encoder_cnn": "vanilla", "positional_embeddings": True,
    "attn_cell_config": {"cell_type": "lstm", "num_units": 512, "dim_e": 256,
                          "dim_o": 512, "dim_embeddings": 80},
    "decoding": "greedy", "beam_size": 2, "div_gamma": 1, "div_prob": 0,
    "max_length_formula": 150,
    "unk": "_UNK", "pad": "_PAD", "end": "_END",
    "path_vocab": base + "vocab.txt",
    "batch_size": 256, "n_epochs": args.n_epochs, "dropout": args.dropout,
    "clip": 5.0,
    "lr_method": "adam", "buckets": buckets, "seed": 0, "eval_every": 3,
})
vocab = Vocab(cfg)
model = Img2SeqModel(cfg, vocab, compute_dtype=jnp.bfloat16, decoder_dtype=jnp.float32)

def pipe(split, shuffle):
    return build_cached_pipeline(
        base + f"{split}.formulas.norm.txt", base + f"images_{split}/",
        base + f"{split}.matching.txt", vocab.form_prepro,
        base + f"cache_{split}", batch_size=256,
        id_pad=vocab.id_pad, id_end=vocab.id_end, max_len=150,
        buckets=buckets, max_formula_len=151, length_bucket=32,
        shuffle_seed=0 if shuffle else None,
        target_batch_pixels=64 * 100 * 500,
        device_resident="auto" if split == "train" else False)

train_pipe = pipe("train", True)
val_pipe = pipe("val", False)
print(f"train batches/epoch: {len(train_pipe)}", flush=True)
trainer = Trainer(model, cfg, args.out)
lr = LRSchedule(lr_init=5e-4, lr_min=5e-5, start_decay=10**9, end_decay=2 * 10**9)
t0 = time.time()
best = trainer.train(train_pipe, val_pipe, lr)
print(f"DONE best={best} wall={time.time()-t0:.0f}s", flush=True)
test_pipe = build_cached_pipeline(
    base + "test.formulas.norm.txt", base + "images_test/", base + "test.matching.txt",
    vocab.form_prepro, base + "cache_test", batch_size=256,
    id_pad=vocab.id_pad, id_end=vocab.id_end, max_len=150,
    buckets=buckets, max_formula_len=151, length_bucket=32,
    target_batch_pixels=64 * 100 * 500)
scores = trainer.evaluate(trainer._final_params, test_pipe, args.out + "formulas_test/")
print("TEST:", json.dumps(scores), flush=True)
