import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from latex_ocr_tpu.utils.jax_setup import setup_jax
setup_jax()
import time, json
import jax.numpy as jnp
from latex_ocr_tpu.data.generator import DataGenerator, default_img_prepro
from latex_ocr_tpu.data.vocab import Vocab
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.training.trainer import Trainer
from latex_ocr_tpu.utils import Config, LRSchedule

buckets = [[240,100],[320,80],[400,100]]
base = "data/synthEZ/"
cfg = Config({
    "encoder_cnn": "vanilla", "positional_embeddings": True,
    "attn_cell_config": {"cell_type": "lstm", "num_units": 512, "dim_e": 256,
                          "dim_o": 512, "dim_embeddings": 80},
    "decoding": "greedy", "beam_size": 2, "div_gamma": 1, "div_prob": 0,
    "max_length_formula": 11,
    "unk": "_UNK", "pad": "_PAD", "end": "_END",
    "path_vocab": base + "vocab.txt",
    "batch_size": 64, "n_epochs": 80, "dropout": 1.0, "clip": 5.0,
    "lr_method": "adam", "buckets": buckets, "seed": 0,
})
vocab = Vocab(cfg)
model = Img2SeqModel(cfg, vocab, compute_dtype=jnp.bfloat16, decoder_dtype=jnp.float32)
def ds(split):
    return DataGenerator(base + f"{split}.formulas.norm.txt", base + f"images_{split}/",
                         base + f"{split}.matching.txt", img_prepro=default_img_prepro,
                         form_prepro=vocab.form_prepro, bucket=True, bucket_size=64, max_len=11)
cfg.save("results/synthEZ/")  # snapshot so Config.from_run_dir restores this run
trainer = Trainer(model, cfg, "results/synthEZ/")
lr = LRSchedule(lr_init=1e-3, lr_min=1e-4, start_decay=10000, end_decay=12000)
t0 = time.time()
best = trainer.train(ds("train"), ds("val"), lr)
print(f"DONE best={best} wall={time.time()-t0:.0f}s", flush=True)
scores = trainer.evaluate(trainer._final_params, ds("test"), "results/synthEZ/formulas_test/")
print("TEST:", json.dumps(scores), flush=True)
