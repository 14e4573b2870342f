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
ap.add_argument("--batch-size", type=int, default=256)
ap.add_argument("--max-length", type=int, default=150)
ap.add_argument("--lr-init", type=float, default=5e-4)
ap.add_argument("--lr-min", type=float, default=5e-5)
ap.add_argument("--start-decay", type=int, default=10**9,
                help="global step at which exponential decay toward lr-min "
                     "begins (default: never — constant lr)")
ap.add_argument("--end-decay", type=int, default=2 * 10**9)
ap.add_argument("--warm-start", default=None,
                help="results dir of a donor run; params-only transfer via "
                     "Trainer init_params (curriculum: ground attention on "
                     "short uniform-token formulas, then transfer — the "
                     "synthEZ->synth50k recipe)")
ap.add_argument("--decay-on-plateau", type=float, default=None,
                help="multiply lr by this whenever a validation score fails "
                     "to improve (reference lr_schedule.py score-decay "
                     "semantics) — an optional stability/polish lever for "
                     "long constant-lr phases.")
ap.add_argument("--alpha-c", type=float, default=0.0,
                help="doubly-stochastic attention regularizer weight (SAT; "
                     "models/img2seq.py _loss_fn). Penalizes re-attending "
                     "the same regions across steps — the long-formula "
                     "drift failure mode. Keep small: with R >> T the "
                     "coverage target is unreachable and a large weight "
                     "swamps the CE loss.")
ap.add_argument("--cell-type", default="lstm", choices=("lstm", "gru"),
                help="attention-RNN cell (models/decoder.py). 'gru' is the "
                     "BASELINE config #1 'attention-GRU' variant: same "
                     "Bahdanau attention + deep output, GRUCell recurrence "
                     "(reference model/decoder.py:5 latent capability)")
ap.add_argument("--decoder-arch", default="attn_lstm",
                choices=("attn_lstm", "transformer"),
                help="decoder family: the flagship Bahdanau LSTM or the "
                     "MXU-dense transformer (models/transformer.py)")
ap.add_argument("--label-smoothing", type=float, default=0.0,
                help="mix the one-hot CE target with the uniform "
                     "distribution (models/decoder.py masked_ce_loss). "
                     "Transformer-shaped quality lever; perplexity is "
                     "always reported un-smoothed.")
ap.add_argument("--lr-mode", default="exponential",
                choices=("exponential", "cosine", "noam"),
                help="'noam' = linear warm-up to --lr-init over --warmup "
                     "batches then inverse-sqrt decay (transformer-shaped; "
                     "utils/lr_schedule.py)")
ap.add_argument("--warmup", type=int, default=2000,
                help="warm-up batches for --lr-mode noam")
ap.add_argument("--transformer-config", default=None,
                help='JSON dict overriding models/transformer.py defaults, '
                     'e.g. \'{"num_layers": 4, "dim_model": 256}\'')
ap.add_argument("--clip", type=float, default=5.0,
                help="global-norm gradient clip (models/img2seq.py "
                     "optimizer factory). NOT a stability lever under adam "
                     "— the r4 same-seed A/B refuted tighter clipping for "
                     "the GRU hot phases (design.md §16.8); use "
                     "--converge-cap instead")
ap.add_argument("--spike-guard", action="store_true",
                help="loss-spike lr cooldown (utils/lr_schedule.py "
                     "SpikeGuard): after convergence, a sampled loss >3.0 "
                     "scales lr x0.1 for 300 steps. Measured and REFUTED "
                     "as a GRU stabilizer (design.md §16.8) — kept for "
                     "A/B reproducibility; use --converge-cap instead")
ap.add_argument("--converge-cap", type=float, default=None,
                help="convergence-gated lr cap (utils/lr_schedule.py "
                     "ConvergenceGate): full schedule lr while the loss "
                     "is above 1.0 (grounding/recovery), capped at this "
                     "value once converged — the onset-side stabilizer "
                     "for GRU hot phases (design.md §16.8); 2e-4 is the "
                     "measured spike-free level")
ap.add_argument("--update-clip", type=float, default=-1.0,
                help="per-element bound on the post-Adam update m̂/(√v̂+ε) "
                     "(models/img2seq.py make_optimizer): caps the "
                     "worst-case per-element step at lr×this — the "
                     "quantity a global-norm clip provably cannot bound "
                     "(design.md §16.8); the mechanism-level GRU "
                     "stabilizer candidate")
ap.add_argument("--ema-decay", type=float, default=0.0,
                help="Polyak weight averaging (training/trainer.py): eval, "
                     "keep-best selection, and the published checkpoint "
                     "all use the EMA weights; raw weights ride along for "
                     "exact resume. 0 = off; 0.999 ≈ a 1000-step window")
ap.add_argument("--seed", type=int, default=0,
                help="seeds the epoch reshuffle (the SGD trajectory) plus "
                     "init/dropout streams; distinct seeds give genuinely "
                     "distinct trajectories (multi-seed A/B spreads)")
ap.add_argument("--devices", default="auto",
                help="data-parallel mesh: 'auto' = all visible chips, '1' "
                     "opts out, 'N' = first N devices (parallel/mesh.py)")
args = ap.parse_args()
if args.spike_guard and args.converge_cap is not None:
    ap.error("--spike-guard and --converge-cap are mutually exclusive "
             "(both configure the trainer's single spike_guard slot)")
if args.converge_cap is not None and args.converge_cap <= 0:
    ap.error("--converge-cap must be > 0")

from latex_ocr_tpu.parallel.mesh import auto_mesh, batch_sharding, round_batch_to_mesh
mesh = auto_mesh(args.devices)
if mesh is not None:
    args.batch_size = round_batch_to_mesh(args.batch_size, mesh)
    print(f"data-parallel mesh: {mesh.devices.size} devices, "
          f"global batch {args.batch_size}", flush=True)

base = args.data_dir.rstrip("/") + "/"
with open(base + "buckets.json") as f:
    buckets = json.load(f)
cfg = Config({
    "encoder_cnn": "vanilla", "positional_embeddings": True,
    "attn_cell_config": {"cell_type": args.cell_type, "num_units": 512,
                          "dim_e": 256, "dim_o": 512, "dim_embeddings": 80},
    "decoder_arch": args.decoder_arch,
    "transformer_config": json.loads(args.transformer_config) if args.transformer_config else None,
    "decoding": "greedy", "beam_size": 2, "div_gamma": 1, "div_prob": 0,
    "max_length_formula": args.max_length,
    "unk": "_UNK", "pad": "_PAD", "end": "_END",
    "path_vocab": base + "vocab.txt",
    "batch_size": args.batch_size, "n_epochs": args.n_epochs,
    "dropout": args.dropout,
    "clip": args.clip,
    "update_clip": args.update_clip,
    "ema_decay": args.ema_decay,
    "spike_guard": ({"mode": "converge_cap", "cap": args.converge_cap}
                    if args.converge_cap else args.spike_guard),
    "lr_method": "adam", "buckets": buckets, "seed": args.seed, "eval_every": 3,
    "alpha_c": args.alpha_c,
    "label_smoothing": args.label_smoothing,
    # dataset paths: snapshotted (Config.save -> config.json) so the
    # evaluate_txt/evaluate_img/predict/serve CLIs can restore this run
    # exactly like a CLI-trained one (Config.from_run_dir fallback)
    **{f"path_formulas_{s}": base + f"{s}.formulas.norm.txt" for s in ("train", "val", "test")},
    **{f"dir_images_{s}": base + f"images_{s}/" for s in ("train", "val", "test")},
    **{f"path_matching_{s}": base + f"{s}.matching.txt" for s in ("train", "val", "test")},
})
vocab = Vocab(cfg)
cfg.save(args.out)
model = Img2SeqModel(cfg, vocab, compute_dtype=jnp.bfloat16, decoder_dtype=jnp.float32)

def pipe(split, shuffle):
    return build_cached_pipeline(
        base + f"{split}.formulas.norm.txt", base + f"images_{split}/",
        base + f"{split}.matching.txt", vocab.form_prepro,
        base + f"cache_{split}", batch_size=args.batch_size,
        id_pad=vocab.id_pad, id_end=vocab.id_end, max_len=args.max_length,
        buckets=buckets, max_formula_len=args.max_length + 1, length_bucket=32,
        shuffle_seed=args.seed if shuffle else None,
        target_batch_pixels=64 * 100 * 500,
        sharding=batch_sharding(mesh) if mesh is not None else None,
        # device-resident HBM dataset and batch sharding are mutually
        # exclusive; with a mesh the pipeline falls back to host assembly
        device_resident="auto" if (split == "train" and mesh is None) else False)

init_params = None
if args.warm_start:
    from latex_ocr_tpu.training.checkpoint import CheckpointManager
    donor = model.init_params(jax.random.PRNGKey(0))
    init_params = CheckpointManager(
        args.warm_start.rstrip("/") + "/model_weights"
    ).restore_params(donor, required=True)
    print(f"warm start from {args.warm_start}", flush=True)

train_pipe = pipe("train", True)
val_pipe = pipe("val", False)
print(f"train batches/epoch: {len(train_pipe)}", flush=True)
trainer = Trainer(model, cfg, args.out, mesh=mesh)
lr = LRSchedule(lr_init=args.lr_init, lr_min=args.lr_min,
                start_decay=args.start_decay, end_decay=args.end_decay,
                decay_rate=args.decay_on_plateau, decay_mode=args.lr_mode,
                end_warm=args.warmup if args.lr_mode == "noam" else None)
t0 = time.time()
best = trainer.train(train_pipe, val_pipe, lr, init_params=init_params)
print(f"DONE best={best} wall={time.time()-t0:.0f}s", flush=True)
test_pipe = build_cached_pipeline(
    base + "test.formulas.norm.txt", base + "images_test/", base + "test.matching.txt",
    vocab.form_prepro, base + "cache_test", batch_size=args.batch_size,
    id_pad=vocab.id_pad, id_end=vocab.id_end, max_len=args.max_length,
    buckets=buckets, max_formula_len=args.max_length + 1, length_bucket=32,
    sharding=batch_sharding(mesh) if mesh is not None else None,
    target_batch_pixels=64 * 100 * 500)
scores = trainer.evaluate(trainer._final_params, test_pipe, args.out + "formulas_test/")
print("TEST:", json.dumps(scores), flush=True)
