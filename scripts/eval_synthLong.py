import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from latex_ocr_tpu.utils.jax_setup import setup_jax
setup_jax()
import json
import jax, jax.numpy as jnp
from latex_ocr_tpu.data.vocab import Vocab
from latex_ocr_tpu.data.fast_pipeline import build_cached_pipeline
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.training.trainer import Trainer
from latex_ocr_tpu.training.checkpoint import CheckpointManager
from latex_ocr_tpu.utils import Config

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
    "batch_size": 256, "buckets": buckets,
})
vocab = Vocab(cfg)
model = Img2SeqModel(cfg, vocab, compute_dtype=jnp.bfloat16, decoder_dtype=jnp.float32)
params = model.init_params(jax.random.PRNGKey(0))
params = CheckpointManager("results/synthLong/model_weights").restore_params(params)
test_pipe = build_cached_pipeline(
    base + "test.formulas.norm.txt", base + "images_test/", base + "test.matching.txt",
    vocab.form_prepro, base + "cache_test", batch_size=256,
    id_pad=vocab.id_pad, id_end=vocab.id_end, max_len=81,
    buckets=buckets, max_formula_len=82, length_bucket=32,
    target_batch_pixels=64 * 100 * 500)
trainer = Trainer(model, cfg, "results/synthLong/")
scores = trainer.evaluate(params, test_pipe, "results/synthLong/formulas_test/")
print("TEST:", json.dumps(scores), flush=True)
