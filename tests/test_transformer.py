"""Transformer decoder family (models/transformer.py) numerics tests.

Invariants mirroring the LSTM path's contract (SURVEY.md §4):
- teacher forcing is causal: logits at step t depend only on tokens < t;
- the incremental KV-cache decode step reproduces the full-parallel
  teacher-forced forward exactly;
- greedy == beam(k=1); beams sorted by score;
- attention output rows are distributions over regions;
- the family trains end-to-end through the Img2SeqModel facade (loss
  drops on an overfit batch, decode/eval programs run, checkpoint shapes
  round-trip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.models.transformer import (
    _cross_kv,
    _init_caches,
    _step_logits,
    encode_memory,
    init_transformer_decoder_params,
    sinusoidal_positions,
    start_embed,
    token_embed,
    transformer_decode_beam,
    transformer_decode_greedy,
    transformer_decode_greedy_with_attention,
    transformer_teacher_forcing_logits,
)
from latex_ocr_tpu.utils import Config

TCFG = {"num_layers": 2, "num_heads": 4, "dim_model": 32, "dim_ff": 64}
CFG = Config(
    {
        "encoder_cnn": "vanilla",
        "positional_embeddings": True,
        "decoder_arch": "transformer",
        "transformer_config": TCFG,
        "decoding": "beam_search",
        "beam_size": 3,
        "div_gamma": 1,
        "div_prob": 0,
        "max_length_formula": 15,
    }
)
N_TOK = 11
ID_END = N_TOK - 1
H = TCFG["num_heads"]


@pytest.fixture(scope="module")
def dec_params():
    return init_transformer_decoder_params(jax.random.PRNGKey(1), CFG, N_TOK, n_channels=512)


@pytest.fixture(scope="module")
def feat():
    # stand-in encoder output: (B, H', W', C) feature grid
    return jax.random.normal(jax.random.PRNGKey(2), (2, 3, 5, 512), jnp.float32)


def test_param_shapes(dec_params):
    assert len(dec_params["layers"]) == TCFG["num_layers"]
    d = TCFG["dim_model"]
    assert dec_params["embedding_table"].shape == (N_TOK, d)
    assert dec_params["mem_proj"]["w"].shape == (512, d)
    assert dec_params["out_w"].shape == (d, N_TOK)
    lay = dec_params["layers"][0]
    assert lay["self_attn"]["wq"].shape == (d, d)
    assert lay["mlp"]["w1"].shape == (d, TCFG["dim_ff"])


def test_teacher_forcing_causality(dec_params, feat):
    """Changing token j must not change logits at positions <= j (inputs
    are shifted right, so y_j first enters as the input of step j+1)."""
    rng = jax.random.PRNGKey(3)
    formula = jax.random.randint(rng, (2, 8), 0, N_TOK, jnp.int32)
    base = transformer_teacher_forcing_logits(dec_params, feat, formula, num_heads=H)
    j = 4
    perturbed = formula.at[:, j:].set((formula[:, j:] + 1) % N_TOK)
    out = transformer_teacher_forcing_logits(dec_params, feat, perturbed, num_heads=H)
    np.testing.assert_allclose(np.asarray(base[:, : j + 1]), np.asarray(out[:, : j + 1]), rtol=1e-6)
    assert not np.allclose(np.asarray(base[:, j + 1 :]), np.asarray(out[:, j + 1 :]))


def test_incremental_step_matches_teacher_forcing(dec_params, feat):
    """The KV-cache decode step must reproduce the full causal forward."""
    T = 6
    formula = jax.random.randint(jax.random.PRNGKey(4), (2, T), 0, N_TOK, jnp.int32)
    full = transformer_teacher_forcing_logits(dec_params, feat, formula, num_heads=H)

    mem = encode_memory(dec_params, feat)
    table = dec_params["embedding_table"]
    D = table.shape[1]
    pos = sinusoidal_positions(T, D, mem.dtype)
    ckv = _cross_kv(dec_params, mem, H)
    caches = _init_caches(len(dec_params["layers"]), (2,), T, H, D // H, mem.dtype)

    step_logits = []
    for t in range(T):
        if t == 0:
            x_t = jnp.broadcast_to(start_embed(dec_params, mem.dtype)[None, None, :], (2, 1, D))
        else:
            x_t = token_embed(dec_params, formula[:, t - 1], mem.dtype)[:, None, :]
        x_t = x_t + pos[t]
        logits, caches, _ = _step_logits(dec_params, x_t, jnp.int32(t), caches, ckv, H, T)
        step_logits.append(logits)
    inc = jnp.stack(step_logits, axis=1)  # (B, T, V)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), rtol=2e-5, atol=2e-5)


def test_greedy_matches_beam1(dec_params, feat):
    g = transformer_decode_greedy(dec_params, feat, 10, ID_END, num_heads=H)
    b = transformer_decode_beam(dec_params, feat, 10, ID_END, beam_size=1, num_heads=H)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(b.ids[:, 0]))


def test_beams_sorted_and_shaped(dec_params, feat):
    out = transformer_decode_beam(dec_params, feat, 10, ID_END, beam_size=3, num_heads=H)
    assert out.ids.shape == (2, 3, 10)
    lp = np.asarray(out.log_probs)
    assert (np.diff(lp, axis=1) <= 1e-6).all(), "beams must be sorted best-first"


def test_decode_with_attention(dec_params, feat):
    ids, attn = transformer_decode_greedy_with_attention(dec_params, feat, 10, ID_END, num_heads=H)
    g = transformer_decode_greedy(dec_params, feat, 10, ID_END, num_heads=H)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(g))
    R = feat.shape[1] * feat.shape[2]
    assert attn.shape == (2, 10, R)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-4)


def test_bf16_decode_runs(dec_params, feat):
    """Regression: the predict path decodes with a bf16 memory; the sqrt(D)
    embedding scale must not promote step inputs back to f32 (dtype-mismatch
    crash in the KV-cache dynamic_update_slice, caught by the CLI drive)."""
    f16 = feat.astype(jnp.bfloat16)
    ids = transformer_decode_greedy(dec_params, f16, 6, ID_END, num_heads=H)
    assert ids.shape == (2, 6)
    out = transformer_decode_beam(dec_params, f16, 6, ID_END, beam_size=2, num_heads=H)
    assert out.ids.shape == (2, 2, 6)
    logits = transformer_teacher_forcing_logits(
        dec_params, f16, jnp.zeros((2, 4), jnp.int32), num_heads=H
    )
    assert logits.dtype == jnp.float32


def _vocab():
    class _V:
        pass

    v = _V()
    toks = [f"t{i}" for i in range(N_TOK - 3)] + ["_UNK", "_PAD", "_END"]
    v.tok_to_id = {t: i for i, t in enumerate(toks)}
    v.id_to_tok = {i: t for i, t in enumerate(toks)}
    v.n_tok = len(toks)
    v.id_unk, v.id_pad, v.id_end = (v.tok_to_id[t] for t in ("_UNK", "_PAD", "_END"))
    return v


def _batch(B=4, h=32, w=48, T=8):
    """Overfit fixture: one shared target sequence, structured images.

    Per-sample *random* formulas turn the overfit into an image-keyed
    texture-memorization problem that converges far too slowly for a unit
    test on either decoder family (measured: the LSTM family is still at
    unigram entropy after 200 adam steps on it, the transformer at ~1.2),
    so the end-to-end smoke memorizes a single sequence — the per-image
    conditioning invariants are covered by the causality/attention tests.
    """
    rng = np.random.default_rng(0)
    formula = np.tile(rng.integers(0, N_TOK - 3, size=(1, T)), (B, 1)).astype(np.int32)
    lengths = np.full((B,), T, np.int32)
    formula[:, T - 1] = N_TOK - 1
    xs = np.arange(w)[None, :]
    ys = np.arange(h)[:, None]
    imgs = np.stack(
        [255 * ((xs // (2 * (i + 1)) + ys // (2 * (i + 1))) % 2) for i in range(B)]
    ).astype(np.uint8)[..., None]
    return {"image": imgs, "formula": formula, "length": lengths}


def test_img2seq_transformer_end_to_end():
    vocab = _vocab()
    model = Img2SeqModel(CFG, vocab)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = model.init_optimizer(params, "adam", clip=5.0)
    batch = _batch()

    losses = []
    rng = jax.random.PRNGKey(7)
    for i in range(80):
        params, opt_state, metrics = model.train_step(
            params, opt_state, batch, jnp.float32(3e-3), jax.random.fold_in(rng, i), 1.0
        )
        losses.append(float(metrics["loss"]))
    # measured trajectory: ~0.06 by step 25, ~0.007 by step 50
    assert losses[-1] < 0.3, f"no learning: {losses[0]} -> {losses[-1]}"

    metrics, ids = model.eval_decode_step(params, batch)
    assert ids.shape[0] == 4 and ids.shape[1] == CFG.beam_size
    assert np.isfinite(float(metrics["loss"]))

    # memorized sequence should be reproduced by beam decode
    dec = np.asarray(model.decode_step(params, jnp.asarray(batch["image"])))
    em = (dec[:, 0, :8] == batch["formula"]).all(axis=1).mean()
    assert em >= 0.75, f"overfit decode EM {em}"


def test_transformer_dp_mesh_matches_single_device():
    """DP-sharded transformer train step == single-device step (the same
    contract tests/test_parallel.py proves for the LSTM family)."""
    from latex_ocr_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(jax.devices()[:8])
    vocab = _vocab()
    model = Img2SeqModel(Config(dict(CFG.to_dict(), decoding="greedy")), vocab)
    params = model.init_params(jax.random.PRNGKey(0))
    host_batch = _batch(B=8)

    def run(params_in, batch_in):
        opt_state = model.init_optimizer(params_in, "sgd", clip=-1)
        p, _, m = model.train_step(
            jax.tree.map(jnp.copy, params_in), opt_state, batch_in,
            jnp.float32(0.1), jax.random.PRNGKey(1), 1.0,
        )
        return p, m

    p1, m1 = run(params, {k: jnp.asarray(v) for k, v in host_batch.items()})
    p2, m2 = run(replicate(params, mesh), shard_batch(host_batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_img2seq_transformer_dropout_and_alpha_c():
    vocab = _vocab()
    cfg = Config(dict(CFG.to_dict(), alpha_c=0.01, decoding="greedy"))
    model = Img2SeqModel(cfg, vocab)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = model.init_optimizer(params, "adam", clip=5.0)
    batch = _batch()
    params, _, metrics = model.train_step(
        params, opt_state, batch, jnp.float32(1e-3), jax.random.PRNGKey(1), 0.8
    )
    assert np.isfinite(float(metrics["loss"]))
    _, ids = model.eval_decode_step(params, batch)
    assert ids.shape[1] == 1  # greedy path

    ids2, attn = model.decode_with_attention(params, jnp.asarray(batch["image"]))
    assert attn.shape[:2] == (4, cfg.max_length_formula + 1)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-4)
