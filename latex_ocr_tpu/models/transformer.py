"""Transformer decoder family: MXU-heavy alternative to the attention LSTM.

The reference framework has exactly one decoder architecture (the Deng et
al. Bahdanau-attention LSTM, reference model/decoder.py:15-105). This
module adds a second, beyond-reference family selected with
``config.decoder_arch = "transformer"``: a pre-LN transformer decoder with
causal self-attention over the emitted tokens and cross-attention over the
CNN encoder's image-region grid.

Why it exists (measured motivation, docs/design.md §11): the LSTM decoder
scan is VPU-roofline-bound on TPU — the per-step Bahdanau ``tanh`` over
(B, R, dim_e) is elementwise work the MXU cannot help with, and it caps
the single-chip train step at ~8k images/s. A transformer decoder has no
sequential scan at train time: teacher forcing is one batch of dense
matmuls over the whole (B, T) grid — exactly the shape of work the MXU's
systolic array is built for — so the same image throughput costs a
fraction of the step time and scales with model width, not sequence
position.

Design notes:
- pre-LN residual blocks (LN -> sublayer -> +residual), fp32 LayerNorm and
  softmax regardless of the compute dtype (same precision policy as the
  LSTM path's scores);
- image regions (B, R, 512) are projected once to the model width and act
  as the cross-attention memory; the encoder's 2-D sinusoidal signal
  (models/positional.py) provides the spatial positions, the text side
  adds a standard 1-D sinusoidal encoding — no learned position tables, so
  any bucket's region count works at any checkpoint;
- decoding is an incremental `lax.while_loop` with a preallocated
  per-layer KV cache written by `dynamic_update_slice` (static shapes,
  early exit when every sequence has emitted END); beam search reorders
  the caches by parent pointer each step and reuses the LSTM path's
  `finalize_beams` backtracking, masking, and diversity-penalty machinery
  (models/decoding.py) unchanged;
- cross-attention weights are a distribution over regions per output
  step, so the Show-Attend-Tell doubly-stochastic regularizer (alpha_c)
  and the attention visualizer work for this family too (last layer,
  mean over heads).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .decoder import _dropout, _glorot_uniform, _embedding_init, flatten_regions
from .decoding import BeamOutput, NEG_INF, _div_penalty, _gather_beams, _mask_finished, finalize_beams


DEFAULT_TRANSFORMER = {
    "num_layers": 4,
    "num_heads": 8,
    "dim_model": 256,
    "dim_ff": 1024,
}


def transformer_cfg(config) -> Dict:
    cfg = dict(DEFAULT_TRANSFORMER)
    cfg.update(getattr(config, "transformer_config", None) or {})
    assert cfg["dim_model"] % cfg["num_heads"] == 0, (
        f"dim_model {cfg['dim_model']} not divisible by num_heads {cfg['num_heads']}"
    )
    return cfg


# ------------------------------------------------------------------- params


def _ln_param(d: int) -> Dict:
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _attn_param(ks, d: int) -> Dict:
    return {
        "wq": _glorot_uniform(next(ks), (d, d)),
        "wk": _glorot_uniform(next(ks), (d, d)),
        "wv": _glorot_uniform(next(ks), (d, d)),
        "wo": _glorot_uniform(next(ks), (d, d)),
        "bo": jnp.zeros((d,), jnp.float32),
    }


def init_transformer_decoder_params(rng, config, n_tok: int, n_channels: int = 512) -> Dict:
    cfg = transformer_cfg(config)
    d, f = cfg["dim_model"], cfg["dim_ff"]
    n_layers = cfg["num_layers"]

    ks = iter(jax.random.split(rng, 8 + n_layers * 16))
    layers: List[Dict] = []
    for _ in range(n_layers):
        layers.append(
            {
                "ln1": _ln_param(d),
                "self_attn": _attn_param(ks, d),
                "ln2": _ln_param(d),
                "cross_attn": _attn_param(ks, d),
                "ln3": _ln_param(d),
                "mlp": {
                    "w1": _glorot_uniform(next(ks), (d, f)),
                    "b1": jnp.zeros((f,), jnp.float32),
                    "w2": _glorot_uniform(next(ks), (f, d)),
                    "b2": jnp.zeros((d,), jnp.float32),
                },
            }
        )
    return {
        "embedding_table": _embedding_init(next(ks), (n_tok, d)),
        "start_token": _embedding_init(next(ks), (1, d))[0],
        "mem_proj": {
            "w": _glorot_uniform(next(ks), (n_channels, d)),
            "b": jnp.zeros((d,), jnp.float32),
        },
        "mem_ln": _ln_param(d),
        "layers": layers,
        "ln_f": _ln_param(d),
        "out_w": _glorot_uniform(next(ks), (d, n_tok)),
    }


def _is_transformer(dec_params: Dict) -> bool:
    return "layers" in dec_params


# --------------------------------------------------------------- primitives


def _layer_norm(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """fp32 LayerNorm, cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    return (y * p["g"] + p["b"]).astype(x.dtype)


def sinusoidal_positions(T: int, d: int, dtype=jnp.float32) -> jnp.ndarray:
    """(T, d) standard 1-D sin/cos positional encoding (Vaswani et al.)."""
    pos = jnp.arange(T, dtype=jnp.float32)[:, None]
    half = d // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-np.log(10000.0) / max(1, half - 1)))
    ang = pos * freq[None, :]
    pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if pe.shape[-1] < d:  # odd d
        pe = jnp.pad(pe, ((0, 0), (0, d - pe.shape[-1])))
    return pe.astype(dtype)


def token_embed(dec_params: Dict, ids: jnp.ndarray, dt) -> jnp.ndarray:
    """Table lookup scaled by sqrt(d_model) (Vaswani et al. §3.4): the
    table rows are L2-normalized (component scale ~1/sqrt(D), the
    reference's init, reference decoder.py:98-105), so without the scale
    the O(1) sinusoidal positions swamp the token identity and training
    crawls (measured: overfit loss stalls at ~1.75 instead of <0.1)."""
    table = dec_params["embedding_table"]
    # scale in the table's f32, cast last: a float32 scalar would promote a
    # bf16 lookup back to f32 and break the KV-cache update's dtype match
    return (table[ids] * float(np.sqrt(table.shape[1]))).astype(dt)


def start_embed(dec_params: Dict, dt) -> jnp.ndarray:
    """The learned start vector, sqrt(d_model)-scaled like token_embed."""
    s = dec_params["start_token"]
    return (s * float(np.sqrt(s.shape[-1]))).astype(dt)


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """(..., L, D) -> (..., H, L, Dh)."""
    *lead, L, D = x.shape
    x = x.reshape(*lead, L, n_heads, D // n_heads)
    return jnp.swapaxes(x, -3, -2)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, L, Dh) -> (..., L, D)."""
    x = jnp.swapaxes(x, -3, -2)
    *lead, L, H, Dh = x.shape
    return x.reshape(*lead, L, H * Dh)


def _mha(
    p: Dict,
    q_in: jnp.ndarray,  # (..., Lq, D)
    kv_in: jnp.ndarray,  # (..., Lk, D)
    n_heads: int,
    mask: Optional[jnp.ndarray] = None,  # additive fp32, broadcastable to (..., H, Lq, Lk)
    return_weights: bool = False,
):
    """Multi-head attention; softmax in fp32. Returns (out, weights|None)."""
    dt = q_in.dtype
    q = _split_heads(q_in @ p["wq"].astype(dt), n_heads)
    k = _split_heads(kv_in @ p["wk"].astype(dt), n_heads)
    v = _split_heads(kv_in @ p["wv"].astype(dt), n_heads)
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum("...hqd,...hkd->...hqk", q, k).astype(jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("...hqk,...hkd->...hqd", w.astype(dt), v)
    out = _merge_heads(out) @ p["wo"].astype(dt) + p["bo"].astype(dt)
    return out, (w if return_weights else None)


def _mlp(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    dt = x.dtype
    h = jax.nn.relu(x @ p["w1"].astype(dt) + p["b1"].astype(dt))
    return h @ p["w2"].astype(dt) + p["b2"].astype(dt)


def encode_memory(dec_params: Dict, img_feat: jnp.ndarray) -> jnp.ndarray:
    """Project encoder regions (B, [H, W,] C) to the model width: (B, R, D).

    The projection ends in a LayerNorm: the raw CNN activations are
    unbounded and drift under adam, and unnormalized memory feeds the
    cross-attention dot products directly — the LSTM path is protected by
    its saturating score `tanh`, this family needs the LN (measured: the
    un-normalized variant cannot even memorize a fixed sequence, loss
    oscillates ~1.6 where the LN variant collapses to ~0)."""
    regions = flatten_regions(img_feat)
    p = dec_params["mem_proj"]
    mem = regions @ p["w"].astype(regions.dtype) + p["b"].astype(regions.dtype)
    return _layer_norm(dec_params["mem_ln"], mem)


# ---------------------------------------------------------- teacher forcing


def transformer_teacher_forcing_logits(
    dec_params: Dict,
    img_feat: jnp.ndarray,  # (B, H, W, C) encoder output
    formula: jnp.ndarray,  # (B, T) int32 target ids
    num_heads: int = DEFAULT_TRANSFORMER["num_heads"],
    dropout_rng=None,
    keep_prob: float = 1.0,
    return_attention: bool = False,
    cross_mha=None,
):
    """Full-parallel teacher-forced forward: one causal pass, no scan.

    Returns logits (B, T, V) fp32; with ``return_attention`` also the last
    layer's mean-over-heads cross-attention maps (B, T, R) fp32.

    ``cross_mha`` overrides the cross-attention sublayer (signature
    ``(layer_params, q_in, mem, n_heads) -> (B, T, D)``) — the hook through
    which ``region_parallel`` routes the region-sharded shard_map
    cross-attention (parallel/region_attention.py:make_region_cross_mha).
    That path never materializes full-R attention weights, so it cannot
    serve ``return_attention`` (alpha_c / visualization need the unsharded
    model).
    """
    if cross_mha is not None and return_attention:
        raise NotImplementedError(
            "region-sharded cross-attention does not materialize full-R "
            "weights; run alpha_c / attention introspection without "
            "region_parallel"
        )
    mem = encode_memory(dec_params, img_feat)  # (B, R, D)
    dt = mem.dtype
    B, T = formula.shape
    table = dec_params["embedding_table"]
    D = table.shape[1]
    H = num_heads

    # inputs: [start, E[y_0], ..., E[y_{T-2}]] + 1-D positions
    emb = token_embed(dec_params, formula[:, :-1], dt)
    start = jnp.broadcast_to(start_embed(dec_params, dt)[None, None, :], (B, 1, D))
    x = jnp.concatenate([start, emb], axis=1) + sinusoidal_positions(T, D, dt)[None]

    causal = jnp.where(
        jnp.arange(T)[:, None] >= jnp.arange(T)[None, :], 0.0, NEG_INF
    ).astype(jnp.float32)[None, None]  # (1, 1, T, T)

    use_dropout = dropout_rng is not None and keep_prob < 1.0
    rngs = iter(jax.random.split(dropout_rng, 3 * len(dec_params["layers"]))) if use_dropout else None

    def drop(y):
        return _dropout(y, next(rngs), keep_prob) if use_dropout else y

    cross_w = None
    for layer in dec_params["layers"]:
        sa, _ = _mha(layer["self_attn"], _layer_norm(layer["ln1"], x), _layer_norm(layer["ln1"], x), H, causal)
        x = x + drop(sa)
        if cross_mha is not None:
            ca = cross_mha(layer["cross_attn"], _layer_norm(layer["ln2"], x), mem, H)
        else:
            ca, cross_w = _mha(
                layer["cross_attn"], _layer_norm(layer["ln2"], x), mem, H,
                return_weights=return_attention,
            )
        x = x + drop(ca)
        x = x + drop(_mlp(layer["mlp"], _layer_norm(layer["ln3"], x)))

    x = _layer_norm(dec_params["ln_f"], x)
    logits = (x @ dec_params["out_w"].astype(dt)).astype(jnp.float32)
    if return_attention:
        return logits, jnp.mean(cross_w, axis=1).astype(jnp.float32)  # (B, T, R)
    return logits


# ----------------------------------------------------------------- decoding


def _init_caches(n_layers: int, shape_prefix, Tmax: int, H: int, Dh: int, dt) -> List[Dict]:
    z = jnp.zeros((*shape_prefix, H, Tmax, Dh), dt)
    return [{"k": z, "v": z} for _ in range(n_layers)]


def _step_logits(
    dec_params: Dict,
    x_t: jnp.ndarray,  # (..., 1, D) current-step input (pos added)
    t: jnp.ndarray,  # scalar int32 step index
    caches: List[Dict],
    cross_kv: List[Dict],  # per layer {"k": (..., H, R, Dh), "v": ...}
    H: int,
    Tmax: int,
    return_cross: bool = False,
):
    """One incremental decoder step over preallocated KV caches.

    Leading dims of ``x_t`` may be (B,) or (B, K). Returns
    (logits (..., V), new_caches, cross_attn (..., R)|None).
    """
    dt = x_t.dtype
    lead = x_t.shape[:-2]
    x = x_t
    # positions 0..Tmax-1 valid up to and including t
    kv_mask = jnp.where(jnp.arange(Tmax) <= t, 0.0, NEG_INF).astype(jnp.float32)
    kv_mask = kv_mask.reshape((1,) * len(lead) + (1, 1, Tmax))

    new_caches = []
    cross_w = None
    for layer, cache, ckv in zip(dec_params["layers"], caches, cross_kv):
        # --- causal self-attention against the cache -----------------------
        q_in = _layer_norm(layer["ln1"], x)
        p = layer["self_attn"]
        q = _split_heads(q_in @ p["wq"].astype(dt), H)  # (..., H, 1, Dh)
        k_t = _split_heads(q_in @ p["wk"].astype(dt), H)
        v_t = _split_heads(q_in @ p["wv"].astype(dt), H)
        start = (0,) * len(lead) + (0, t, 0)
        k_all = jax.lax.dynamic_update_slice(cache["k"], k_t, start)
        v_all = jax.lax.dynamic_update_slice(cache["v"], v_t, start)
        new_caches.append({"k": k_all, "v": v_all})
        scale = 1.0 / np.sqrt(q.shape[-1])
        scores = jnp.einsum("...hqd,...hkd->...hqk", q, k_all).astype(jnp.float32) * scale
        w = jax.nn.softmax(scores + kv_mask, axis=-1).astype(dt)
        sa = _merge_heads(jnp.einsum("...hqk,...hkd->...hqd", w, v_all))
        sa = sa @ p["wo"].astype(dt) + p["bo"].astype(dt)
        x = x + sa

        # --- cross-attention against the precomputed memory KV -------------
        q_in = _layer_norm(layer["ln2"], x)
        pc = layer["cross_attn"]
        qc = _split_heads(q_in @ pc["wq"].astype(dt), H)
        # upcast at use: a no-op normally, the dequant step when _cross_kv
        # stored K/V in a packed dtype (decode_cross_kv_dtype)
        ck = ckv["k"].astype(dt)
        cv = ckv["v"].astype(dt)
        scores = jnp.einsum("...hqd,...hkd->...hqk", qc, ck).astype(jnp.float32) * scale
        wc = jax.nn.softmax(scores, axis=-1)
        ca = _merge_heads(jnp.einsum("...hqk,...hkd->...hqd", wc.astype(dt), cv))
        ca = ca @ pc["wo"].astype(dt) + pc["bo"].astype(dt)
        x = x + ca
        cross_w = wc  # (..., H, 1, R) — keep last layer's

        x = x + _mlp(layer["mlp"], _layer_norm(layer["ln3"], x))

    x = _layer_norm(dec_params["ln_f"], x)
    logits = (x @ dec_params["out_w"].astype(dt))[..., 0, :]  # (..., V)
    if return_cross:
        cross = jnp.mean(cross_w[..., 0, :], axis=-2).astype(jnp.float32)  # (..., R)
        return logits, new_caches, cross
    return logits, new_caches, None


def _cross_kv(dec_params: Dict, mem: jnp.ndarray, H: int,
              store_dtype=None) -> List[Dict]:
    """Precompute per-layer cross-attention K/V from the memory: done once
    per decode, the transformer analogue of the LSTM path's hoisted
    ``att_img`` projection (reference attention_mechanism.py:43).

    ``store_dtype`` optionally quantizes the stored K/V (projections are
    computed in ``mem.dtype`` first, then cast — e.g. bf16 storage under
    an fp32 decoder). Consumers upcast at use, so the only numeric effect
    is the storage rounding; the megakernel applies the identical cast
    (ops/transformer_kernel.py), keeping kernel/XLA token parity."""
    out = []
    for layer in dec_params["layers"]:
        p = layer["cross_attn"]
        k = mem @ p["wk"].astype(mem.dtype)
        v = mem @ p["wv"].astype(mem.dtype)
        if store_dtype is not None:
            k = k.astype(store_dtype)
            v = v.astype(store_dtype)
        out.append({"k": _split_heads(k, H), "v": _split_heads(v, H)})
    return out


def transformer_decode_greedy(
    dec_params: Dict,
    img_feat: jnp.ndarray,
    max_length: int,
    id_end: int,
    num_heads: int = DEFAULT_TRANSFORMER["num_heads"],
    cross_kv_dtype=None,
) -> jnp.ndarray:
    """Greedy argmax decode. Returns ids (B, max_length) int32.

    ``cross_kv_dtype`` selects the cross-K/V storage dtype (see
    _cross_kv) — the XLA half of the ``decode_cross_kv_dtype`` knob."""
    mem = encode_memory(dec_params, img_feat)
    dt = mem.dtype
    B = mem.shape[0]
    table = dec_params["embedding_table"]
    D = table.shape[1]
    H = num_heads
    Dh = D // H
    T = max_length

    pos = sinusoidal_positions(T, D, dt)
    ckv = _cross_kv(dec_params, mem, H, store_dtype=cross_kv_dtype)
    caches0 = _init_caches(len(dec_params["layers"]), (B,), T, H, Dh, dt)
    x0 = (start_embed(dec_params, dt) + pos[0])[None, None, :].repeat(B, 0)
    ids0 = jnp.full((B, T), id_end, jnp.int32)
    finished0 = jnp.zeros((B,), bool)

    def cond(carry):
        t, _x, _caches, finished, _ids = carry
        return jnp.logical_and(t < T, ~jnp.all(finished))

    def body(carry):
        t, x_t, caches, finished, ids = carry
        logits, caches, _ = _step_logits(dec_params, x_t, t, caches, ckv, H, T)
        new_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_ids = jnp.where(finished, jnp.int32(id_end), new_ids)
        ids = jax.lax.dynamic_update_slice(ids, new_ids[:, None], (0, t))
        finished = jnp.logical_or(finished, new_ids == id_end)
        nxt = token_embed(dec_params, new_ids, dt) + pos[jnp.minimum(t + 1, T - 1)]
        return (t + 1, nxt[:, None, :], caches, finished, ids)

    _, _, _, _, ids = jax.lax.while_loop(cond, body, (jnp.int32(0), x0, caches0, finished0, ids0))
    return ids


def transformer_decode_greedy_with_attention(
    dec_params: Dict,
    img_feat: jnp.ndarray,
    max_length: int,
    id_end: int,
    num_heads: int = DEFAULT_TRANSFORMER["num_heads"],
    cross_kv_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode returning (ids (B, T), cross-attention (B, T, R)):
    last layer, mean over heads — the introspection contract shared with
    the LSTM path's decode_greedy_with_attention."""
    mem = encode_memory(dec_params, img_feat)
    dt = mem.dtype
    B = mem.shape[0]
    table = dec_params["embedding_table"]
    D = table.shape[1]
    H = num_heads
    T = max_length

    pos = sinusoidal_positions(T, D, dt)
    ckv = _cross_kv(dec_params, mem, H, store_dtype=cross_kv_dtype)
    caches0 = _init_caches(len(dec_params["layers"]), (B,), T, H, D // H, dt)
    x0 = (start_embed(dec_params, dt) + pos[0])[None, None, :].repeat(B, 0)

    def step(carry, t):
        x_t, caches, finished = carry
        logits, caches, cross = _step_logits(
            dec_params, x_t, t, caches, ckv, H, T, return_cross=True
        )
        new_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_ids = jnp.where(finished, jnp.int32(id_end), new_ids)
        finished = jnp.logical_or(finished, new_ids == id_end)
        nxt = token_embed(dec_params, new_ids, dt) + pos[jnp.minimum(t + 1, T - 1)]
        return (nxt[:, None, :], caches, finished), (new_ids, cross)

    _, (ids_t, attn_t) = jax.lax.scan(
        step, (x0, caches0, jnp.zeros((B,), bool)), jnp.arange(T)
    )
    return jnp.swapaxes(ids_t, 0, 1), jnp.swapaxes(attn_t, 0, 1)


def transformer_decode_beam(
    dec_params: Dict,
    img_feat: jnp.ndarray,
    max_length: int,
    id_end: int,
    beam_size: int,
    div_gamma: float = 1.0,
    div_prob: float = 0.0,
    rng: Optional[jax.Array] = None,
    length_norm_alpha: float = 0.0,
    num_heads: int = DEFAULT_TRANSFORMER["num_heads"],
    cross_kv_dtype=None,
) -> BeamOutput:
    """Batched beam search with per-step KV-cache reordering by parent.

    Emits the same (ids_buf, parents_buf, log_probs, lengths) raw buffers
    as the LSTM beam loop and reuses `finalize_beams` for backtracking and
    GNMT length-norm re-ranking.
    """
    mem = encode_memory(dec_params, img_feat)
    dt = mem.dtype
    B = mem.shape[0]
    table = dec_params["embedding_table"]
    V, D = table.shape
    H = num_heads
    K = beam_size
    assert K <= V, f"beam_size {K} exceeds vocab size {V}"
    T = max_length

    pos = sinusoidal_positions(T, D, dt)
    # memory KV broadcast over the beam axis (un-tiled: (B, 1, H, R, Dh)
    # broadcasts against (B, K, H, 1, Dh) queries — no K-fold HBM copies)
    ckv = [
        {"k": c["k"][:, None], "v": c["v"][:, None]}
        for c in _cross_kv(dec_params, mem, H, store_dtype=cross_kv_dtype)
    ]
    caches0 = _init_caches(len(dec_params["layers"]), (B, K), T, H, D // H, dt)
    x0 = jnp.broadcast_to(
        (start_embed(dec_params, dt) + pos[0])[None, None, None, :], (B, K, 1, D)
    )
    log_probs0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((K - 1,), NEG_INF)]).astype(jnp.float32)[None, :],
        (B, 1),
    )
    finished0 = jnp.zeros((B, K), bool)
    lengths0 = jnp.zeros((B, K), jnp.int32)
    ids_buf0 = jnp.full((T, B, K), id_end, jnp.int32)
    parents_buf0 = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, None, :], (T, B, K))

    use_div = (div_gamma != 1.0) and (div_prob > 0.0)
    rng0 = rng if rng is not None else jax.random.PRNGKey(0)

    def cond(carry):
        t = carry[0]
        finished = carry[4]
        return jnp.logical_and(t < T, ~jnp.all(finished))

    def body(carry):
        t, x_t, caches, log_probs, finished, lengths, ids_buf, parents_buf, step_rng = carry

        logits, caches, _ = _step_logits(dec_params, x_t, t, caches, ckv, H, T)  # (B, K, V)
        step_logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        step_logp = _mask_finished(step_logp, finished, id_end)

        total = log_probs[:, :, None] + step_logp
        if use_div:
            step_rng, sub = jax.random.split(step_rng)
            total = _div_penalty(total, div_gamma, div_prob, sub)

        flat = total.reshape(B, K * V)
        new_lp, flat_idx = jax.lax.top_k(flat, K)
        new_ids = (flat_idx % V).astype(jnp.int32)
        parents = (flat_idx // V).astype(jnp.int32)

        # reorder every layer's KV cache by parent beam
        caches = [
            {"k": _gather_beams(c["k"], parents), "v": _gather_beams(c["v"], parents)}
            for c in caches
        ]

        prev_finished = _gather_beams(finished, parents)
        new_finished = jnp.logical_or(prev_finished, new_ids == id_end)
        new_lengths = _gather_beams(lengths, parents) + (~prev_finished).astype(jnp.int32)

        ids_buf = jax.lax.dynamic_update_slice(ids_buf, new_ids[None], (t, 0, 0))
        parents_buf = jax.lax.dynamic_update_slice(parents_buf, parents[None], (t, 0, 0))

        nxt = token_embed(dec_params, new_ids, dt) + pos[jnp.minimum(t + 1, T - 1)]
        return (t + 1, nxt[:, :, None, :], caches, new_lp, new_finished, new_lengths, ids_buf, parents_buf, step_rng)

    carry = (jnp.int32(0), x0, caches0, log_probs0, finished0, lengths0, ids_buf0, parents_buf0, rng0)
    _, _, _, log_probs, _, lengths, ids_buf, parents_buf, _ = jax.lax.while_loop(cond, body, carry)
    return finalize_beams(ids_buf, parents_buf, log_probs, lengths, length_norm_alpha)
