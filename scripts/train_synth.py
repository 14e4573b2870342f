"""Parameterized synthetic-corpus trainer: one runner for every ad-hoc
experiment shape (replaces the former train_synth2k/10k/10k_b/10k_f32
clones — same recipes via flags, recorded below).

Historic recipes (RESULTS.md experiments):
    2k      --data-dir data/synth2k  --out results/synth2k  --n-epochs 200 \
            --dropout 1.0 --lr-min 1e-5 --start-decay 5000 --end-decay 6400
    10k     --data-dir data/synth10k --out results/synth10k --n-epochs 60 \
            --dropout 0.7 --lr-min 3e-5 --start-decay 6000 --end-decay 9000
    10k_b   ... --n-epochs 150 --dropout 1.0 --lr-min 1e-4 \
            --start-decay 20000 --end-decay 23000
    10k_f32 ... --n-epochs 80 --dropout 1.0 --compute-dtype float32 \
            --lr-min 1e-4 --start-decay 20000 --end-decay 23000
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from latex_ocr_tpu.utils.jax_setup import setup_jax
setup_jax()
import argparse, json, time
import jax.numpy as jnp
from latex_ocr_tpu.data.generator import DataGenerator, default_img_prepro
from latex_ocr_tpu.data.vocab import Vocab
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.parallel.mesh import auto_mesh, round_batch_to_mesh
from latex_ocr_tpu.training.trainer import Trainer
from latex_ocr_tpu.utils import Config, LRSchedule

ap = argparse.ArgumentParser()
ap.add_argument("--data-dir", default="data/synth10k")
ap.add_argument("--out", default="results/synth10k/")
ap.add_argument("--n-epochs", type=int, default=60)
ap.add_argument("--batch-size", type=int, default=64)
ap.add_argument("--max-length", type=int, default=31)
ap.add_argument("--dropout", type=float, default=0.7,
                help="keep probability (TF semantics)")
ap.add_argument("--compute-dtype", default="bfloat16",
                choices=("bfloat16", "float32"))
ap.add_argument("--lr-init", type=float, default=1e-3)
ap.add_argument("--lr-min", type=float, default=3e-5)
ap.add_argument("--start-decay", type=int, default=6000)
ap.add_argument("--end-decay", type=int, default=9000)
ap.add_argument("--seed", type=int, default=0)
ap.add_argument("--devices", default="auto",
                help="data-parallel mesh: 'auto' all chips, '1' opt out, 'N'")
args = ap.parse_args()

mesh = auto_mesh(args.devices)
if mesh is not None:
    args.batch_size = round_batch_to_mesh(args.batch_size, mesh)
    print(f"data-parallel mesh: {mesh.devices.size} devices, "
          f"global batch {args.batch_size}", flush=True)

buckets = [[240,100],[320,80],[400,100],[480,100],[560,100],[720,120],[800,100]]
base = args.data_dir.rstrip("/") + "/"
cfg = Config({
    "encoder_cnn": "vanilla", "positional_embeddings": True,
    "attn_cell_config": {"cell_type": "lstm", "num_units": 512, "dim_e": 256,
                          "dim_o": 512, "dim_embeddings": 80},
    "decoding": "greedy", "beam_size": 2, "div_gamma": 1, "div_prob": 0,
    "max_length_formula": args.max_length,
    "unk": "_UNK", "pad": "_PAD", "end": "_END",
    "path_vocab": base + "vocab.txt",
    "batch_size": args.batch_size, "n_epochs": args.n_epochs,
    "dropout": args.dropout, "clip": 5.0,
    "lr_method": "adam", "buckets": buckets, "seed": args.seed,
    **{f"path_formulas_{s}": base + f"{s}.formulas.norm.txt" for s in ("train", "val", "test")},
    **{f"dir_images_{s}": base + f"images_{s}/" for s in ("train", "val", "test")},
    **{f"path_matching_{s}": base + f"{s}.matching.txt" for s in ("train", "val", "test")},
})
vocab = Vocab(cfg)
cfg.save(args.out)
dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.compute_dtype]
model = Img2SeqModel(cfg, vocab, compute_dtype=dtype)

def ds(split):
    return DataGenerator(base + f"{split}.formulas.norm.txt", base + f"images_{split}/",
                         base + f"{split}.matching.txt", img_prepro=default_img_prepro,
                         form_prepro=vocab.form_prepro, bucket=True, bucket_size=64,
                         max_len=args.max_length)

trainer = Trainer(model, cfg, args.out, mesh=mesh)
lr = LRSchedule(lr_init=args.lr_init, lr_min=args.lr_min,
                start_decay=args.start_decay, end_decay=args.end_decay)
t0 = time.time()
best = trainer.train(ds("train"), ds("val"), lr)
print(f"DONE best={best} wall={time.time()-t0:.0f}s", flush=True)
scores = trainer.evaluate(trainer._final_params, ds("test"),
                          args.out.rstrip("/") + "/formulas_test/")
print("TEST:", json.dumps(scores), flush=True)
