"""Reference-shape-envelope run: formulas to 80 tokens, buckets to
(1600,200), warm-start from the 50k checkpoint, remat + adaptive batches."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from latex_ocr_tpu.utils.jax_setup import setup_jax
setup_jax()
import time, json
import jax, jax.numpy as jnp
from latex_ocr_tpu.data.vocab import Vocab
from latex_ocr_tpu.data.fast_pipeline import build_cached_pipeline
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.training.trainer import Trainer
from latex_ocr_tpu.training.checkpoint import CheckpointManager
from latex_ocr_tpu.utils import Config, LRSchedule

buckets = [[240,100],[320,80],[400,100],[480,100],[560,100],[720,120],[800,100],
           [1000,200],[1200,200],[1600,200]]
base = "data/synthLong/"
cfg = Config({
    "encoder_cnn": "vanilla", "positional_embeddings": True,
    "attn_cell_config": {"cell_type": "lstm", "num_units": 512, "dim_e": 256,
                          "dim_o": 512, "dim_embeddings": 80},
    "decoding": "greedy", "beam_size": 2, "div_gamma": 1, "div_prob": 0,
    "max_length_formula": 81,
    "unk": "_UNK", "pad": "_PAD", "end": "_END",
    "path_vocab": base + "vocab.txt",
    "batch_size": 256, "n_epochs": 260, "dropout": 1.0, "clip": 5.0,
    "lr_method": "adam", "buckets": buckets, "seed": 0,
})
vocab = Vocab(cfg)
model = Img2SeqModel(cfg, vocab, compute_dtype=jnp.bfloat16, decoder_dtype=jnp.float32)

out = "results/synthLong/"
cfg.save(out)  # snapshot so Config.from_run_dir restores this run
init_params = None
# probe for a SAVED checkpoint (the dir alone proves nothing: the
# manager mkdirs eagerly, so a run that died pre-save leaves it)
if CheckpointManager(out + "model_weights").latest_epoch() is None:
    # params-only warm start (copying the ckpt dir leaks donor host state)
    donor = model.init_params(jax.random.PRNGKey(0))
    init_params = CheckpointManager("results/synth50k/model_weights").restore_params(donor, required=True)

def pipe(split, shuffle):
    return build_cached_pipeline(
        base + f"{split}.formulas.norm.txt", base + f"images_{split}/",
        base + f"{split}.matching.txt", vocab.form_prepro,
        base + f"cache_{split}", batch_size=256,
        id_pad=vocab.id_pad, id_end=vocab.id_end, max_len=81,
        buckets=buckets, max_formula_len=82, length_bucket=32,
        shuffle_seed=0 if shuffle else None,
        target_batch_pixels=64 * 100 * 500,
        device_resident="auto" if split == "train" else False)

train_pipe = pipe("train", True)
val_pipe = pipe("val", False)
print(f"train batches/epoch: {len(train_pipe)}", flush=True)
trainer = Trainer(model, cfg, out)
lr = LRSchedule(lr_init=5e-4, lr_min=5e-5, start_decay=10**9, end_decay=2 * 10**9)
t0 = time.time()
best = trainer.train(train_pipe, val_pipe, lr, init_params=init_params)
print(f"DONE best={best} wall={time.time()-t0:.0f}s", flush=True)
scores = trainer.evaluate(trainer._final_params, pipe("test", False), out + "formulas_test/")
print("TEST:", json.dumps(scores), flush=True)
