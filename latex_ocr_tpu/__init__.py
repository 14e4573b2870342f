"""latex_ocr_tpu — a TPU-native (JAX/XLA/Pallas) image-to-LaTeX framework.

Re-implements the full capability surface of LinXueyuanStdio/LaTeX_OCR
(im2latex: CNN encoder + Bahdanau-attention LSTM decoder + beam search)
as an idiomatic TPU program:

- one functional parameter pytree, jitted train/eval/decode programs
- `lax.scan` teacher forcing, `lax.while_loop` on-device greedy/beam decode
- static-shape contract via the reference's image bucket table + formula
  length buckets (bounded compile cache)
- data parallelism via `jax.sharding.Mesh` + NamedSharding (XLA collectives
  over ICI), no host round-trips in the step loop

Layout:
    utils/       config, logging, LR schedule, subprocess helpers
    data/        vocab, image preprocessing, dataset generator, renderer,
                 device input pipeline
    models/      encoder (CNN), decoder (attention LSTM), greedy/beam decode
    ops/         Pallas TPU kernels for hot paths
    parallel/    mesh + sharding helpers
    training/    trainer loop, checkpointing
    evaluation/  text + image metrics
    cli/         build / train / evaluate_txt / evaluate_img / predict /
                 visualize_attention entry points
"""

__version__ = "0.1.0"
