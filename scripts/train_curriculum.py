"""Curriculum: warm-start from the short-formula checkpoint, train on the
len-3-30 task that stalls from scratch (attention is already grounded)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from latex_ocr_tpu.utils.jax_setup import setup_jax
setup_jax()
import time, json
import jax, jax.numpy as jnp
from latex_ocr_tpu.data.generator import DataGenerator, default_img_prepro
from latex_ocr_tpu.data.vocab import Vocab
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.training.trainer import Trainer
from latex_ocr_tpu.training.checkpoint import CheckpointManager
from latex_ocr_tpu.utils import Config, LRSchedule

buckets = [[240,100],[320,80],[400,100],[480,100],[560,100],[720,120],[800,100]]
base = "data/synth10k/"
cfg = Config({
    "encoder_cnn": "vanilla", "positional_embeddings": True,
    "attn_cell_config": {"cell_type": "lstm", "num_units": 512, "dim_e": 256,
                          "dim_o": 512, "dim_embeddings": 80},
    "decoding": "greedy", "beam_size": 2, "div_gamma": 1, "div_prob": 0,
    "max_length_formula": 31,
    "unk": "_UNK", "pad": "_PAD", "end": "_END",
    "path_vocab": base + "vocab.txt",
    "batch_size": 64, "n_epochs": 160, "dropout": 1.0, "clip": 5.0,
    "lr_method": "adam", "buckets": buckets, "seed": 0,
})
vocab = Vocab(cfg)
model = Img2SeqModel(cfg, vocab, compute_dtype=jnp.bfloat16, decoder_dtype=jnp.float32)

# warm-start from the short-formula run's weights (params only: copying
# the ckpt dir would leak the donor's best_score/epoch and block keep-best)
out = "results/synth10k_cur/"
cfg.save(out)  # snapshot so Config.from_run_dir restores this run
init_params = None
# probe for a SAVED checkpoint (the dir alone proves nothing: the
# manager mkdirs eagerly, so a run that died pre-save leaves it)
if CheckpointManager(out + "model_weights").latest_epoch() is None:
    donor = model.init_params(jax.random.PRNGKey(0))
    init_params = CheckpointManager("results/synthEZ/model_weights").restore_params(donor, required=True)

def ds(split):
    return DataGenerator(base + f"{split}.formulas.norm.txt", base + f"images_{split}/",
                         base + f"{split}.matching.txt", img_prepro=default_img_prepro,
                         form_prepro=vocab.form_prepro, bucket=True, bucket_size=64, max_len=31)
trainer = Trainer(model, cfg, out)
lr = LRSchedule(lr_init=5e-4, lr_min=5e-5, start_decay=9000, end_decay=12000)
t0 = time.time()
best = trainer.train(ds("train"), ds("val"), lr, init_params=init_params)
print(f"DONE best={best} wall={time.time()-t0:.0f}s", flush=True)
scores = trainer.evaluate(trainer._final_params, ds("test"), out + "formulas_test/")
print("TEST:", json.dumps(scores), flush=True)
