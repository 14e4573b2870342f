"""On-device decoding: greedy and batched beam search.

Replaces the reference's TF1 `tf.while_loop` machinery
(model/components/{greedy_decoder_cell,beam_search_decoder_cell,
dynamic_decode}.py) with `lax.while_loop` programs that run entirely on
TPU — zero host round-trips:

- static trip bound ``max_length`` with early exit once every sequence
  (every beam) has emitted END;
- output buffers are preallocated and written with
  `lax.dynamic_update_slice`, initialized to END/identity so the
  backtracking pass is correct even for unexecuted steps;
- beam search follows the reference semantics: per-step log-softmax,
  finished-beam masking that forces probability 1 on END, optional
  intra-beam diversity penalty (Li et al. 2016), flat top-k over
  beam*vocab with the t=0 single-beam case handled by a -inf initial
  score for beams > 0, parent-pointer bookkeeping, and a reverse-scan
  finalize that backtracks parents to materialize aligned beams.

Note on finalize: the reference's shipped backtracking loop never
advances its parent pointers (beam_search_decoder_cell.py:236 returns the
initial ``parents`` unchanged) — upstream Genthial im2latex advances them
(``new_state.parents``). We implement the correct pointer-advancing
backtrack.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from .decoder import (
    AttnState,
    attn_cell_step,
    attn_cell_step_beam,
    compute_att_img,
    flatten_regions,
    initial_state,
)

# numpy scalar, NOT jnp: a module-level jnp constant materializes a device
# array at import time, initializing the backend before CLI entry points can
# pin the platform (utils/jax_setup.py) — restores then fail on the wrong
# device. np.float32 keeps the exact dtype semantics with no device touch.
NEG_INF = np.float32(-1e30)


# ------------------------------------------------------------------- greedy


def decode_greedy(
    dec_params: Dict,
    img_feat: jnp.ndarray,  # (B, H, W, C) encoder output
    max_length: int,
    id_end: int,
    use_pallas: bool = False,
    attn_fn=None,
) -> jnp.ndarray:
    """Greedy argmax decode. Returns ids (B, max_length) int32.

    Positions at/after each sequence's END are filled with ``id_end``.
    ``attn_fn`` routes the per-step attention through a custom context fn
    (the region-sharded path, parallel/region_attention.py).
    """
    regions = flatten_regions(img_feat)
    att_img = compute_att_img(dec_params, regions)
    state0 = initial_state(dec_params, regions)
    B = regions.shape[0]
    table = dec_params["embedding_table"]

    emb0 = jnp.broadcast_to(dec_params["start_token"][None, :], (B, table.shape[1]))
    ids0 = jnp.full((B, max_length), id_end, jnp.int32)
    finished0 = jnp.zeros((B,), bool)

    def cond(carry):
        t, _state, _emb, finished, _ids = carry
        return jnp.logical_and(t < max_length, ~jnp.all(finished))

    def body(carry):
        t, state, emb, finished, ids = carry
        logits, new_state, _ = attn_cell_step(
            dec_params, emb, state, att_img, regions, use_pallas=use_pallas,
            attn_fn=attn_fn,
        )
        new_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # keep emitting END once finished so the output stays truncatable
        new_ids = jnp.where(finished, jnp.int32(id_end), new_ids)
        ids = jax.lax.dynamic_update_slice(ids, new_ids[:, None], (0, t))
        new_finished = jnp.logical_or(finished, new_ids == id_end)
        new_emb = table[new_ids].astype(emb.dtype)
        return (t + 1, new_state, new_emb, new_finished, ids)

    _, _, _, _, ids = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state0, emb0.astype(regions.dtype), finished0, ids0)
    )
    return ids


def decode_greedy_with_attention(
    dec_params: Dict,
    img_feat: jnp.ndarray,
    max_length: int,
    id_end: int,
    attn_fn=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode that also returns per-step attention maps.

    Fixed-trip `lax.scan` (attention buffers dominate; early exit saves
    little). Returns (ids (B, T), attention (B, T, R)).

    This replaces the reference's global-variable `tf.py_func` attention
    side channel (attention_mechanism.py:96-121) with a proper functional
    output.
    """
    regions = flatten_regions(img_feat)
    att_img = compute_att_img(dec_params, regions)
    state0 = initial_state(dec_params, regions)
    B = regions.shape[0]
    table = dec_params["embedding_table"]

    emb0 = jnp.broadcast_to(
        dec_params["start_token"][None, :], (B, table.shape[1])
    ).astype(regions.dtype)
    finished0 = jnp.zeros((B,), bool)

    def step(carry, _):
        state, emb, finished = carry
        logits, new_state, attn = attn_cell_step(
            dec_params, emb, state, att_img, regions, attn_fn=attn_fn
        )
        new_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_ids = jnp.where(finished, jnp.int32(id_end), new_ids)
        new_finished = jnp.logical_or(finished, new_ids == id_end)
        new_emb = table[new_ids].astype(emb.dtype)
        return (new_state, new_emb, new_finished), (new_ids, attn.astype(jnp.float32))

    _, (ids_t, attn_t) = jax.lax.scan(
        step, (state0, emb0, finished0), None, length=max_length
    )
    return jnp.swapaxes(ids_t, 0, 1), jnp.swapaxes(attn_t, 0, 1)


# -------------------------------------------------------------------- beam


class BeamOutput(NamedTuple):
    ids: jnp.ndarray  # (B, K, T) aligned hypotheses, best beam first
    log_probs: jnp.ndarray  # (B, K) final hypothesis scores


def _gather_beams(t: jnp.ndarray, parents: jnp.ndarray) -> jnp.ndarray:
    """Reorder the beam axis of t (B, K, ...) by parent indices (B, K)."""
    idx = parents
    while idx.ndim < t.ndim:
        idx = idx[..., None]
    return jnp.take_along_axis(t, idx.astype(jnp.int32), axis=1)


def _mask_finished(step_logp: jnp.ndarray, finished: jnp.ndarray, id_end: int):
    """Force finished beams to extend only with END at probability 1."""
    V = step_logp.shape[-1]
    end_row = jnp.full((V,), NEG_INF, step_logp.dtype).at[id_end].set(0.0)
    return jnp.where(finished[..., None], end_row, step_logp)


def coverage_log_penalty(
    coverage: jnp.ndarray,  # (..., R) accumulated attention mass per region
    beta: float,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GNMT coverage penalty (Wu et al. 2016 eq. 14):
    ``cp = beta * sum_r log(min(coverage_r, 1.0))``.

    Rewards hypotheses whose attention has covered the input regions;
    re-ranks the final beams (beyond-reference lever for the long-formula
    drift failure mode, where the decoder stalls on a region and never
    attends the tail). ``coverage`` is clamped at ``eps`` below so empty
    regions contribute a large-but-finite constant — image grids have many
    legitimately blank regions, and only differences between beams matter
    for the re-rank."""
    return beta * jnp.sum(
        jnp.log(jnp.clip(coverage, eps, 1.0)), axis=-1
    ).astype(jnp.float32)


def _div_penalty(logp: jnp.ndarray, div_gamma: float, div_prob: float, rng):
    """Intra-beam diversity penalty (Li et al. 2016): log(gamma) * rank."""
    rank = jnp.argsort(jnp.argsort(-logp, axis=-1), axis=-1).astype(logp.dtype)
    penalty = jnp.log(jnp.float32(div_gamma)) * rank
    if div_prob < 1.0:
        apply = jax.random.bernoulli(rng, div_prob, logp.shape)
        penalty = penalty * apply.astype(logp.dtype)
    return logp + penalty


def decode_beam(
    dec_params: Dict,
    img_feat: jnp.ndarray,
    max_length: int,
    id_end: int,
    beam_size: int,
    div_gamma: float = 1.0,
    div_prob: float = 0.0,
    rng: Optional[jax.Array] = None,
    use_pallas: bool = False,
    length_norm_alpha: float = 0.0,
    coverage_beta: float = 0.0,
    attn_fn=None,
) -> BeamOutput:
    """Batched beam search, fully on device. Returns aligned beams (B, K, T).

    ``length_norm_alpha`` > 0 re-ranks the final beams by
    ``log_prob / length**alpha`` (GNMT-style length normalization,
    BASELINE.json config #3); 0 keeps the reference's raw-sum ranking.
    ``coverage_beta`` > 0 adds the GNMT coverage penalty
    (`coverage_log_penalty`) to the re-rank score; this carries a
    (B, K, R) coverage accumulator through the loop and requires
    materialized attention weights, so it forces the non-fused attention
    step (``use_pallas`` is ignored).
    """
    regions = flatten_regions(img_feat)  # (B, R, C) — never beam-tiled
    att_img = compute_att_img(dec_params, regions)
    B, R, C = regions.shape
    K, V = beam_size, dec_params["embedding_table"].shape[0]
    # at t=0 only beam 0 is live, so it must supply all K continuations
    assert K <= V, f"beam_size {K} exceeds vocab size {V}"
    T = max_length
    table = dec_params["embedding_table"]
    dt = regions.dtype

    s0 = initial_state(dec_params, regions)
    # broadcast the initial state over the beam axis: (B, K, *)
    state0 = AttnState(
        *(jnp.broadcast_to(s[:, None, :], (B, K, s.shape[-1])) for s in s0)
    )

    emb0 = jnp.broadcast_to(dec_params["start_token"][None, None, :], (B, K, table.shape[1])).astype(dt)
    # only beam 0 is live at t=0 (equivalent to the reference's t==0 cond)
    log_probs0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((K - 1,), NEG_INF)]).astype(jnp.float32)[None, :],
        (B, 1),
    )
    finished0 = jnp.zeros((B, K), bool)
    lengths0 = jnp.zeros((B, K), jnp.int32)
    ids_buf0 = jnp.full((T, B, K), id_end, jnp.int32)
    # identity parents for unexecuted steps keep backtracking a no-op there
    parents_buf0 = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, None, :], (T, B, K))

    use_div = (div_gamma != 1.0) and (div_prob > 0.0)
    if use_div and rng is None:
        rng = jax.random.PRNGKey(0)
    rng0 = rng if rng is not None else jax.random.PRNGKey(0)

    use_cov = coverage_beta > 0.0
    if use_cov:
        # coverage needs materialized attention weights per step
        use_pallas = False
        cov0 = jnp.zeros((B, K, R), jnp.float32)

    def cond(carry):
        t = carry[0]
        finished = carry[4]
        return jnp.logical_and(t < T, ~jnp.all(finished))

    def body(carry):
        if use_cov:
            *carry, cov = carry
        t, state, emb, log_probs, finished, lengths, ids_buf, parents_buf, step_rng = carry

        logits, new_state, attn = attn_cell_step_beam(
            dec_params, emb, state, att_img, regions, use_pallas=use_pallas,
            attn_fn=attn_fn,
        )
        step_logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # (B, K, V)
        step_logp = _mask_finished(step_logp, finished, id_end)

        total = log_probs[:, :, None] + step_logp
        if use_div:
            step_rng, sub = jax.random.split(step_rng)
            total = _div_penalty(total, div_gamma, div_prob, sub)

        flat = total.reshape(B, K * V)
        new_lp, flat_idx = jax.lax.top_k(flat, K)  # sorted desc, ties -> low idx
        new_ids = (flat_idx % V).astype(jnp.int32)
        parents = (flat_idx // V).astype(jnp.int32)

        # reorder per-beam state by parent
        new_state = AttnState(*(_gather_beams(s, parents) for s in new_state))

        prev_finished = _gather_beams(finished, parents)
        new_finished = jnp.logical_or(prev_finished, new_ids == id_end)
        # a beam's length counts tokens up to and including its END
        new_lengths = _gather_beams(lengths, parents) + (~prev_finished).astype(jnp.int32)
        new_emb = table[new_ids].astype(dt)

        ids_buf = jax.lax.dynamic_update_slice(ids_buf, new_ids[None], (t, 0, 0))
        parents_buf = jax.lax.dynamic_update_slice(parents_buf, parents[None], (t, 0, 0))

        out = (t + 1, new_state, new_emb, new_lp, new_finished, new_lengths, ids_buf, parents_buf, step_rng)
        if use_cov:
            # the new beam k extends parent p: its coverage is the parent's
            # plus the attention the parent just spent (finished parents
            # only emit END — their attention must not accumulate)
            step_cov = attn.astype(jnp.float32) * (~finished[..., None])
            out = out + (_gather_beams(cov + step_cov, parents),)
        return out

    carry = (jnp.int32(0), state0, emb0, log_probs0, finished0, lengths0, ids_buf0, parents_buf0, rng0)
    if use_cov:
        carry = carry + (cov0,)
    final = jax.lax.while_loop(cond, body, carry)
    log_probs, lengths, ids_buf, parents_buf = final[3], final[5], final[6], final[7]

    extra_scores = None
    if use_cov:
        extra_scores = coverage_log_penalty(final[9], coverage_beta)
    return finalize_beams(
        ids_buf, parents_buf, log_probs, lengths, length_norm_alpha,
        extra_scores=extra_scores,
    )


def finalize_beams(
    ids_buf: jnp.ndarray,  # (T, B, K) per-step chosen tokens
    parents_buf: jnp.ndarray,  # (T, B, K) per-step parent pointers
    log_probs: jnp.ndarray,  # (B, K) final raw scores
    lengths: jnp.ndarray,  # (B, K) hypothesis lengths incl. END
    length_norm_alpha: float = 0.0,
    extra_scores: Optional[jnp.ndarray] = None,  # (B, K) additive (e.g. coverage)
) -> BeamOutput:
    """Backtrack parent pointers into aligned beams, optionally re-ranked
    by GNMT length normalization and/or additive ``extra_scores`` (the
    coverage penalty). Shared by the XLA beam loop and the Pallas beam
    megakernel (which emits the same raw buffers)."""
    T, B, K = ids_buf.shape

    # ---- optional GNMT-style re-ranking (length norm + additive terms) ----
    if length_norm_alpha > 0.0 or extra_scores is not None:
        scores = log_probs
        if length_norm_alpha > 0.0:
            norm = jnp.maximum(1, lengths).astype(jnp.float32) ** length_norm_alpha
            scores = scores / norm
        if extra_scores is not None:
            scores = scores + extra_scores
        order = jnp.argsort(-scores, axis=1)  # (B, K) best first
        log_probs = jnp.take_along_axis(scores, order, axis=1)
    else:
        order = None

    # ---- finalize: backtrack parent pointers, last step -> first ----------
    def back_step(pointers, inputs):
        ids_t, parents_t = inputs  # (B, K) each
        aligned = jnp.take_along_axis(ids_t, pointers, axis=1)
        new_pointers = jnp.take_along_axis(parents_t, pointers, axis=1)
        return new_pointers, aligned

    init_pointers = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (B, K))
    if order is not None:
        init_pointers = jnp.take_along_axis(init_pointers, order, axis=1)
    _, aligned_rev = jax.lax.scan(
        back_step, init_pointers, (ids_buf[::-1], parents_buf[::-1])
    )
    aligned = aligned_rev[::-1]  # (T, B, K)
    return BeamOutput(ids=jnp.transpose(aligned, (1, 2, 0)), log_probs=log_probs)
