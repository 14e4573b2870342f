"""Handwritten-style transfer at corpus scale (BASELINE config #4).

Round 2's hw400 fine-tune (400 train / 60 test) produced EM scatter of
30-57 across identical runs — the corpus was too small for a stable
number. This runner fine-tunes the printed donor on the 5k-train / 500-test
handwritten-style corpus (build_synthetic.py --handwritten: jitter,
stroke dropout, speckle) and reports per-seed test metrics; run it with
--seed 0/1/2 and report mean±spread.

    python scripts/build_synthetic.py --out data/hw5k --n-train 5000 \
        --n-val 500 --n-test 500 --min-len 3 --max-len 20 --handwritten
    python scripts/train_handwritten.py --seed 0   # then 1, 2
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from latex_ocr_tpu.utils.jax_setup import setup_jax
setup_jax()
import argparse, json, time
import jax, jax.numpy as jnp
from latex_ocr_tpu.data.generator import DataGenerator, default_img_prepro
from latex_ocr_tpu.data.vocab import Vocab
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.training.checkpoint import CheckpointManager
from latex_ocr_tpu.training.trainer import Trainer
from latex_ocr_tpu.utils import Config, LRSchedule

ap = argparse.ArgumentParser()
ap.add_argument("--data-dir", default="data/hw5k")
ap.add_argument("--out", default=None, help="default results/hw5k_s<seed>/")
ap.add_argument("--donor", default="results/synth50k",
                help="printed-model run dir for the params-only warm start "
                     "(empty string = train from scratch)")
ap.add_argument("--seed", type=int, default=0)
ap.add_argument("--n-epochs", type=int, default=60)
ap.add_argument("--batch-size", type=int, default=64)
ap.add_argument("--max-length", type=int, default=21)
ap.add_argument("--lr-init", type=float, default=3e-4)
ap.add_argument("--lr-min", type=float, default=3e-5)
ap.add_argument("--start-decay", type=int, default=3000)
ap.add_argument("--end-decay", type=int, default=4500)
args = ap.parse_args()
out = args.out or f"results/hw5k_s{args.seed}/"

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
    "batch_size": args.batch_size, "n_epochs": args.n_epochs, "dropout": 1.0,
    "clip": 5.0, "lr_method": "adam", "buckets": buckets, "seed": args.seed,
    # per-epoch data reshuffle seeded by --seed: without it (and with
    # dropout off) the fine-tune is fully deterministic and a "3-seed
    # spread" would be three identical runs
    "shuffle_data": True,
    "eval_every": 3,
    **{f"path_formulas_{s}": base + f"{s}.formulas.norm.txt" for s in ("train", "val", "test")},
    **{f"dir_images_{s}": base + f"images_{s}/" for s in ("train", "val", "test")},
    **{f"path_matching_{s}": base + f"{s}.matching.txt" for s in ("train", "val", "test")},
})
vocab = Vocab(cfg)
cfg.save(out)
model = Img2SeqModel(cfg, vocab, compute_dtype=jnp.bfloat16, decoder_dtype=jnp.float32)

def ds(split):
    return DataGenerator(base + f"{split}.formulas.norm.txt", base + f"images_{split}/",
                         base + f"{split}.matching.txt", img_prepro=default_img_prepro,
                         form_prepro=vocab.form_prepro, bucket=True, bucket_size=64,
                         max_len=args.max_length)

init_params = None
if args.donor and CheckpointManager(out + "model_weights").latest_epoch() is None:
    donor = model.init_params(jax.random.PRNGKey(0))
    init_params = CheckpointManager(
        args.donor.rstrip("/") + "/model_weights"
    ).restore_params(donor, required=True)
    print(f"warm start from {args.donor}", flush=True)

trainer = Trainer(model, cfg, out)
lr = LRSchedule(lr_init=args.lr_init, lr_min=args.lr_min,
                start_decay=args.start_decay, end_decay=args.end_decay)
t0 = time.time()
best = trainer.train(ds("train"), ds("val"), lr, init_params=init_params)
print(f"DONE seed={args.seed} best={best} wall={time.time()-t0:.0f}s", flush=True)
scores = trainer.evaluate(trainer._final_params, ds("test"), out + "formulas_test/")
print(f"HW5K TEST seed={args.seed}:", json.dumps(scores), flush=True)
