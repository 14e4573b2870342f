"""(a) beam-2 vs greedy eval of the trained curriculum model;
(b) fine-tune on the handwritten-style dataset (BASELINE config #4)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from latex_ocr_tpu.utils.jax_setup import setup_jax
setup_jax()
import json
import jax, jax.numpy as jnp
from latex_ocr_tpu.data.generator import DataGenerator, default_img_prepro
from latex_ocr_tpu.data.vocab import Vocab
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.training.trainer import Trainer
from latex_ocr_tpu.training.checkpoint import CheckpointManager
from latex_ocr_tpu.utils import Config, LRSchedule

buckets = [[240,100],[320,80],[400,100],[480,100],[560,100],[720,120],[800,100],[1000,200]]
def make_cfg(base, decoding, max_len):
    return Config({
        "encoder_cnn": "vanilla", "positional_embeddings": True,
        "attn_cell_config": {"cell_type": "lstm", "num_units": 512, "dim_e": 256,
                              "dim_o": 512, "dim_embeddings": 80},
        "decoding": decoding, "beam_size": 2, "div_gamma": 1, "div_prob": 0,
        "max_length_formula": max_len,
        "unk": "_UNK", "pad": "_PAD", "end": "_END",
        "path_vocab": base + "vocab.txt",
        "batch_size": 64, "n_epochs": 40, "dropout": 1.0, "clip": 5.0,
        "lr_method": "adam", "buckets": buckets, "seed": 0,
    })

def ds(base, split, vocab, max_len):
    return DataGenerator(base + f"{split}.formulas.norm.txt", base + f"images_{split}/",
                         base + f"{split}.matching.txt", img_prepro=default_img_prepro,
                         form_prepro=vocab.form_prepro, bucket=True, bucket_size=64, max_len=max_len)

# (a) beam eval of curriculum model on synth10k test
base = "data/synth10k/"
cfg = make_cfg(base, "beam_search", 31)
vocab = Vocab(cfg)
model = Img2SeqModel(cfg, vocab, compute_dtype=jnp.bfloat16, decoder_dtype=jnp.float32)
params = model.init_params(jax.random.PRNGKey(0))
params = CheckpointManager("results/synth10k_cur/model_weights").restore_params(params)
trainer = Trainer(model, cfg, "results/beam_eval/")
scores = trainer.evaluate(params, ds(base, "test", vocab, 31), "results/beam_eval/formulas_test/")
print("BEAM2 TEST:", json.dumps(scores), flush=True)

# (b) handwritten transfer: fine-tune on hw400 (harder inputs)
hw = "data/hw400/"
cfg_hw = make_cfg(hw, "greedy", 21)
vocab_hw = Vocab(cfg_hw)
model_hw = Img2SeqModel(cfg_hw, vocab_hw, compute_dtype=jnp.bfloat16, decoder_dtype=jnp.float32)
out = "results/hw400/"
init_hw = None
# probe for a SAVED checkpoint, not the dir (manager mkdirs eagerly)
if CheckpointManager(out + "model_weights").latest_epoch() is None:
    # params-only warm start (copying the ckpt dir leaks donor host state)
    donor = model_hw.init_params(jax.random.PRNGKey(0))
    init_hw = CheckpointManager("results/synth10k_cur/model_weights").restore_params(donor, required=True)
trainer_hw = Trainer(model_hw, cfg_hw, out)
cfg_hw.n_epochs = 350  # ~2450 steps at 7 batches/epoch, matches the 1800-2400 decay window
lr = LRSchedule(lr_init=3e-4, lr_min=3e-5, start_decay=1800, end_decay=2400)
best = trainer_hw.train(ds(hw, "train", vocab_hw, 21), ds(hw, "val", vocab_hw, 21), lr, init_params=init_hw)
scores = trainer_hw.evaluate(trainer_hw._final_params, ds(hw, "test", vocab_hw, 21), out + "formulas_test/")
print("HW TEST:", json.dumps(scores), flush=True)
