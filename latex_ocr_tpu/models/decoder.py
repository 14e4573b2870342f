"""Attention LSTM decoder: teacher-forced training path.

Implements the Deng et al. (arXiv:1609.04938) decoder the reference builds
with TF1 dynamic_rnn (reference model/decoder.py:15-105,
model/components/attention_cell.py:58-89,
model/components/attention_mechanism.py:43-94), redesigned for XLA:

- the image-side attention projection ``att_img = regions @ W_att_img`` is
  computed ONCE per sequence (the reference's key optimization), outside
  the time loop;
- the per-step recurrence is a `lax.scan` over time with static trip count,
  so the whole teacher-forced forward+backward+update compiles to a single
  XLA program;
- state is an explicit (c, h, o) tuple; all weights live in one fp32
  pytree, activations can run in bfloat16 on the MXU.

Cell step math (per reference attention_cell.py step):
    x      = [emb_t ; o_{t-1}]
    h, c   = LSTM(x, (c_prev, h_prev))          # TF1 LSTMCell, forget_bias=1
    h      = dropout(h)
    e      = tanh(att_img + h @ W_att_h) @ beta  # Bahdanau scores over regions
    a      = softmax(e)
    ctx    = sum_r a_r * region_r
    o      = tanh(h @ o_W_h + ctx @ o_W_c); o = dropout(o)
    logits = o @ y_W_o

Initial state: each of (c0, h0, o0) = tanh(mean_region @ W + b)
(reference attention_mechanism.py:124-153).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class AttnState(NamedTuple):
    c: jnp.ndarray  # (B, num_units) LSTM cell state
    h: jnp.ndarray  # (B, num_units) LSTM hidden state
    o: jnp.ndarray  # (B, dim_o)     deep-output vector


def _glorot_uniform(rng, shape):
    fan_in, fan_out = shape[0], shape[-1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, jnp.float32, -limit, limit)


def _embedding_init(rng, shape):
    """uniform(-1, 1) rows, L2-normalized (reference decoder.py:98-105)."""
    e = jax.random.uniform(rng, shape, jnp.float32, -1.0, 1.0)
    return e / jnp.linalg.norm(e, axis=-1, keepdims=True)


def init_decoder_params(rng, config, n_tok: int, n_channels: int = 512) -> Dict:
    cfg = config.attn_cell_config
    dim_e = cfg["dim_e"]
    dim_o = cfg["dim_o"]
    dim_emb = cfg["dim_embeddings"]
    num_units = cfg["num_units"]
    cell_type = cfg.get("cell_type", "lstm")
    if cell_type not in ("lstm", "gru"):
        raise NotImplementedError(f"Unknown cell_type {cell_type!r}")

    ks = iter(jax.random.split(rng, 16))
    dim_in = dim_emb + dim_o
    if cell_type == "gru":
        # torch.nn.GRUCell layout/semantics (gate order r, z, n; separate
        # input/hidden biases so the reset gate can scale the hidden
        # candidate term alone). The reference imports GRUCell but never
        # selects it (reference decoder.py:5, hardwired LSTM at :55) —
        # this closes that latent config surface (BASELINE config #1
        # "attention-GRU"); parity pinned in tests/test_torch_parity.py.
        cell = {
            "gru": {
                "w_ih": _glorot_uniform(next(ks), (dim_in, 3 * num_units)),
                "w_hh": _glorot_uniform(next(ks), (num_units, 3 * num_units)),
                "b_ih": jnp.zeros((3 * num_units,), jnp.float32),
                "b_hh": jnp.zeros((3 * num_units,), jnp.float32),
            }
        }
    else:
        # TF1 LSTMCell layout: one kernel over [x; h], gate order (i, j, f, o)
        cell = {
            "lstm": {
                "w": _glorot_uniform(next(ks), (dim_in + num_units, 4 * num_units)),
                "b": jnp.zeros((4 * num_units,), jnp.float32),
            }
        }
    params = {
        "embedding_table": _embedding_init(next(ks), (n_tok, dim_emb)),
        "start_token": _embedding_init(next(ks), (1, dim_emb))[0],
        **cell,
        "att": {
            "img_w": _glorot_uniform(next(ks), (n_channels, dim_e)),
            "h_w": _glorot_uniform(next(ks), (num_units, dim_e)),
            "beta": _glorot_uniform(next(ks), (dim_e, 1))[:, 0],
        },
        "init": {
            "c_w": _glorot_uniform(next(ks), (n_channels, num_units)),
            "c_b": jnp.zeros((num_units,), jnp.float32),
            "h_w": _glorot_uniform(next(ks), (n_channels, num_units)),
            "h_b": jnp.zeros((num_units,), jnp.float32),
            "o_w": _glorot_uniform(next(ks), (n_channels, dim_o)),
            "o_b": jnp.zeros((dim_o,), jnp.float32),
        },
        "out": {
            "o_w_h": _glorot_uniform(next(ks), (num_units, dim_o)),
            "o_w_c": _glorot_uniform(next(ks), (n_channels, dim_o)),
            "y_w_o": _glorot_uniform(next(ks), (dim_o, n_tok)),
        },
    }
    if cfg.get("gated_attention", False):
        # Show-Attend-Tell gate: ctx *= sigmoid(h @ W_gate + b) — capability
        # match for the torch path's f_beta gate (seq2seq_torch.py:195-320)
        params["gate"] = {
            "w": _glorot_uniform(next(ks), (num_units, n_channels)),
            "b": jnp.zeros((n_channels,), jnp.float32),
        }
    return params


# ------------------------------------------------------------------ primitives


def lstm_step(
    lstm_params: Dict, x: jnp.ndarray, c: jnp.ndarray, h: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TF1-compatible LSTM step: forget_bias=1.0, gate order (i, j, f, o)."""
    dtype = x.dtype
    z = jnp.concatenate([x, h], axis=-1) @ lstm_params["w"].astype(dtype)
    z = z + lstm_params["b"].astype(dtype)
    i, j, f, o = jnp.split(z, 4, axis=-1)
    new_c = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return new_c, new_h


def gru_step(
    gru_params: Dict, x: jnp.ndarray, h: jnp.ndarray
) -> jnp.ndarray:
    """torch.nn.GRUCell-compatible step (gate order r, z, n; the reset gate
    scales the *post-matmul* hidden candidate, torch convention):

        r = sigmoid(x@W_ir + b_ir + h@W_hr + b_hr)
        z = sigmoid(x@W_iz + b_iz + h@W_hz + b_hz)
        n = tanh(x@W_in + b_in + r * (h@W_hn + b_hn))
        h' = (1 - z) * n + z * h
    """
    dtype = x.dtype
    gi = x @ gru_params["w_ih"].astype(dtype) + gru_params["b_ih"].astype(dtype)
    gh = h @ gru_params["w_hh"].astype(dtype) + gru_params["b_hh"].astype(dtype)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def recurrent_step(
    dec_params: Dict, x: jnp.ndarray, state: "AttnState"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch on the configured cell family. Returns (new_c, new_h);
    for GRU the cell state is unused and passed through unchanged."""
    if "gru" in dec_params:
        return state.c, gru_step(dec_params["gru"], x, state.h)
    return lstm_step(dec_params["lstm"], x, state.c, state.h)


def flatten_regions(img_feat: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*W, C) attention regions."""
    if img_feat.ndim == 3:
        return img_feat
    b, h, w, c = img_feat.shape
    return img_feat.reshape(b, h * w, c)


def compute_att_img(dec_params: Dict, regions: jnp.ndarray) -> jnp.ndarray:
    """Precompute the image-side attention projection (B, R, dim_e)."""
    return regions @ dec_params["att"]["img_w"].astype(regions.dtype)


def initial_state(dec_params: Dict, regions: jnp.ndarray) -> AttnState:
    """(c0, h0, o0) from the mean region feature."""
    p = dec_params["init"]
    mean = jnp.mean(regions, axis=1)
    dt = regions.dtype
    return AttnState(
        c=jnp.tanh(mean @ p["c_w"].astype(dt) + p["c_b"].astype(dt)),
        h=jnp.tanh(mean @ p["h_w"].astype(dt) + p["h_b"].astype(dt)),
        o=jnp.tanh(mean @ p["o_w"].astype(dt) + p["o_b"].astype(dt)),
    )


def attention_context(
    dec_params: Dict,
    att_img: jnp.ndarray,  # (B, R, dim_e)
    regions: jnp.ndarray,  # (B, R, C)
    h: jnp.ndarray,  # (B, num_units)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bahdanau attention over image regions. Returns (context, weights).

    Scores in fp32 for a numerically stable softmax regardless of the
    compute dtype.
    """
    att = dec_params["att"]
    att_h = h @ att["h_w"].astype(h.dtype)  # (B, dim_e)
    e = jnp.tanh(att_img + att_h[:, None, :])  # (B, R, dim_e)
    scores = e @ att["beta"].astype(e.dtype)  # (B, R)
    a = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(regions.dtype)
    ctx = jnp.einsum("br,brc->bc", a, regions)
    return ctx, a


def attention_context_beam(
    dec_params: Dict,
    att_img: jnp.ndarray,  # (B, R, dim_e)   — shared across beams
    regions: jnp.ndarray,  # (B, R, C)       — shared across beams
    h: jnp.ndarray,  # (B, K, num_units)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-aware Bahdanau attention: the image tensors stay un-tiled.

    The reference tiles img/att_img `beam_size`-fold before every step
    (attention_mechanism.py:59-65) — K x the HBM traffic. Broadcasting the
    beam axis instead lets XLA fuse the tanh into the beta reduction and
    run the context as one batched (K, R) @ (R, C) matmul per image.
    Returns (context (B, K, C), weights (B, K, R)).
    """
    att = dec_params["att"]
    att_h = h @ att["h_w"].astype(h.dtype)  # (B, K, dim_e)
    e = jnp.tanh(att_img[:, None, :, :] + att_h[:, :, None, :])  # (B, K, R, dim_e)
    scores = e @ att["beta"].astype(e.dtype)  # (B, K, R)
    a = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(regions.dtype)
    ctx = jnp.einsum("bkr,brc->bkc", a, regions)
    return ctx, a


def _dropout(x: jnp.ndarray, rng, keep_prob: float) -> jnp.ndarray:
    """Inverted dropout with TF semantics (keep_prob, scale by 1/keep)."""
    if rng is None or keep_prob >= 1.0:
        return x
    mask = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, jnp.zeros_like(x))


def _apply_gate(dec_params: Dict, h: jnp.ndarray, ctx: jnp.ndarray) -> jnp.ndarray:
    """Optional Show-Attend-Tell context gate: ctx * sigmoid(h @ W + b)."""
    gate = dec_params.get("gate")
    if gate is None:
        return ctx
    g = jax.nn.sigmoid(h @ gate["w"].astype(h.dtype) + gate["b"].astype(h.dtype))
    return ctx * g


def attn_cell_step(
    dec_params: Dict,
    emb: jnp.ndarray,  # (B, dim_emb)
    state: AttnState,
    att_img: jnp.ndarray,
    regions: jnp.ndarray,
    dropout_rng=None,
    keep_prob: float = 1.0,
    use_pallas: bool = False,
    attn_fn=None,
) -> Tuple[jnp.ndarray, AttnState, jnp.ndarray]:
    """One decoder step. Returns (logits (B, V), new_state, attn (B, R)).

    ``attn_fn`` overrides the attention-context computation (same
    signature/contract as ``attention_context``) — the hook through which
    ``region_parallel`` routes the region-sharded shard_map attention
    (parallel/region_attention.py)."""
    dt = regions.dtype
    x = jnp.concatenate([emb.astype(dt), state.o], axis=-1)
    new_c, new_h = recurrent_step(dec_params, x, state)

    if dropout_rng is not None:
        k1, k2 = jax.random.split(dropout_rng)
    else:
        k1 = k2 = None
    new_h = _dropout(new_h, k1, keep_prob)

    if attn_fn is not None:
        ctx, attn = attn_fn(dec_params, att_img, regions, new_h)
    elif use_pallas:
        from ..ops.attention import fused_attention_context

        att_h = new_h @ dec_params["att"]["h_w"].astype(dt)
        ctx = fused_attention_context(
            att_img, regions, att_h, dec_params["att"]["beta"].astype(dt), beams=1
        )
        attn = None
    else:
        ctx, attn = attention_context(dec_params, att_img, regions, new_h)
    ctx = _apply_gate(dec_params, new_h, ctx)

    out = dec_params["out"]
    new_o = jnp.tanh(new_h @ out["o_w_h"].astype(dt) + ctx @ out["o_w_c"].astype(dt))
    new_o = _dropout(new_o, k2, keep_prob)
    logits = new_o @ out["y_w_o"].astype(dt)

    return logits, AttnState(new_c, new_h, new_o), attn


def attn_cell_step_beam(
    dec_params: Dict,
    emb: jnp.ndarray,  # (B, K, dim_emb)
    state: AttnState,  # fields shaped (B, K, *)
    att_img: jnp.ndarray,  # (B, R, dim_e) un-tiled
    regions: jnp.ndarray,  # (B, R, C)     un-tiled
    use_pallas: bool = False,
    attn_fn=None,
) -> Tuple[jnp.ndarray, AttnState, jnp.ndarray]:
    """Beam-axis decoder step (inference only — no dropout).

    Same math as `attn_cell_step` but all beam-tiled tensors keep the K
    axis explicit so the image-side attention inputs are never repeated.
    With ``use_pallas``, the attention context comes from the fused
    Pallas kernel (ops/attention.py) — single VMEM pass, no (B,K,R,E)
    intermediate; attention weights are not materialized on that path.
    Returns (logits (B, K, V), new_state, attn (B, K, R) or None).
    """
    dt = regions.dtype
    x = jnp.concatenate([emb.astype(dt), state.o], axis=-1)
    new_c, new_h = recurrent_step(dec_params, x, state)

    if attn_fn is not None:
        ctx, attn = attn_fn(dec_params, att_img, regions, new_h)
    elif use_pallas:
        from ..ops.attention import fused_attention_context

        B, K, _ = new_h.shape
        att_h = (new_h @ dec_params["att"]["h_w"].astype(dt)).reshape(B * K, -1)
        ctx = fused_attention_context(
            att_img, regions, att_h, dec_params["att"]["beta"].astype(dt), beams=K
        ).reshape(B, K, -1)
        attn = None
    else:
        ctx, attn = attention_context_beam(dec_params, att_img, regions, new_h)
    ctx = _apply_gate(dec_params, new_h, ctx)

    out = dec_params["out"]
    new_o = jnp.tanh(new_h @ out["o_w_h"].astype(dt) + ctx @ out["o_w_c"].astype(dt))
    logits = new_o @ out["y_w_o"].astype(dt)
    return logits, AttnState(new_c, new_h, new_o), attn


# -------------------------------------------------------------- train forward


def shifted_embeddings(dec_params: Dict, formula: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forcing inputs: [start_token, E[y_0], ..., E[y_{T-2}]].

    formula: (B, T) int32. Returns (B, T, dim_emb).
    """
    table = dec_params["embedding_table"]
    emb = table[formula[:, :-1]]  # (B, T-1, E)
    start = jnp.broadcast_to(
        dec_params["start_token"][None, None, :], (formula.shape[0], 1, table.shape[1])
    )
    return jnp.concatenate([start, emb], axis=1)


def teacher_forcing_logits(
    dec_params: Dict,
    img_feat: jnp.ndarray,  # (B, H, W, C) encoder output
    formula: jnp.ndarray,  # (B, T) int32 target ids
    dropout_rng=None,
    keep_prob: float = 1.0,
    return_attention: bool = False,
    remat: Optional[bool] = None,
    attn_fn=None,
):
    """Full teacher-forced forward pass as one `lax.scan`.

    Returns logits (B, T, V) in fp32; with ``return_attention`` also the
    per-step attention maps (B, T, R) for the doubly-stochastic
    regularizer / introspection.

    ``remat`` recomputes each cell step in the backward pass instead of
    storing its attention intermediates — the (B, R, dim_e) tanh tensor
    per step is the memory hot spot, and for the largest image buckets
    (R ~ 10^4) storing T of them would blow HBM. Default (None): always
    on — measured faster than storing even at small R (see below).
    """
    regions = flatten_regions(img_feat)
    att_img = compute_att_img(dec_params, regions)
    state0 = initial_state(dec_params, regions)

    embs = shifted_embeddings(dec_params, formula)  # (B, T, E)
    embs_t = jnp.swapaxes(embs, 0, 1)  # (T, B, E) scan over time

    T = formula.shape[1]
    if dropout_rng is not None:
        step_rngs = jax.random.split(dropout_rng, T)
    else:
        step_rngs = jnp.zeros((T, 2), jnp.uint32)  # unused

    use_dropout = dropout_rng is not None and keep_prob < 1.0

    def step(state, inputs):
        emb_t, rng_t = inputs
        logits, new_state, attn = attn_cell_step(
            dec_params,
            emb_t,
            state,
            att_img,
            regions,
            dropout_rng=rng_t if use_dropout else None,
            keep_prob=keep_prob,
            attn_fn=attn_fn,
        )
        out = (logits, attn) if return_attention else (logits, jnp.zeros((), logits.dtype))
        return new_state, out

    if remat is None:
        # measured on v5e: recomputing the step is faster than storing and
        # reloading the (B, R, dim_e) intermediates even at small R — and
        # saving just the matmul outputs (checkpoint_dots) while
        # recomputing elementwise ops is faster still (35.3 -> 33.9 -> 32.9
        # ms/step at B=256, R=92) — default on
        remat = True
    if remat:
        step = jax.checkpoint(step, policy=jax.checkpoint_policies.checkpoint_dots)

    _, (logits_t, attn_t) = jax.lax.scan(step, state0, (embs_t, step_rngs))
    logits = jnp.swapaxes(logits_t, 0, 1).astype(jnp.float32)  # (B, T, V)
    if return_attention:
        return logits, jnp.swapaxes(attn_t, 0, 1).astype(jnp.float32)  # (B, T, R)
    return logits


def masked_ce_loss(
    logits: jnp.ndarray,  # (B, T, V) fp32
    formula: jnp.ndarray,  # (B, T) int32
    lengths: jnp.ndarray,  # (B,) int32
    label_smoothing: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked sparse-softmax CE (reference img2seq.py:68-75).

    ``label_smoothing`` mixes the one-hot target with the uniform
    distribution over the vocabulary (Szegedy et al. 2016): the training
    loss becomes ``(1-eps)*nll + eps*mean_V(-logp)``. The returned
    ``ce_words`` counter always accumulates the UN-smoothed CE so
    perplexity stays comparable across smoothing settings (and with the
    reference, which has no smoothing).

    Returns (mean loss over valid tokens, sum of true CE over valid
    tokens, number of valid tokens).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp, formula[..., None], axis=-1)[..., 0]
    mask = jnp.arange(formula.shape[1])[None, :] < lengths[:, None]
    ce = -(tok_logp * mask)
    ce_words = jnp.sum(ce)
    n_words = jnp.sum(lengths)
    n_valid = jnp.maximum(1, jnp.sum(mask))
    if label_smoothing > 0.0:
        uniform_ce = -(jnp.mean(logp, axis=-1) * mask)
        smoothed = (1.0 - label_smoothing) * ce + label_smoothing * uniform_ce
        loss = jnp.sum(smoothed) / n_valid
    else:
        loss = ce_words / n_valid
    return loss, ce_words, n_words
