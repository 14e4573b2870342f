"""Pallas greedy-decode megakernel for the transformer decoder family.

Motivation: the transformer's incremental decode
(models/transformer.py:_step_logits) is a `lax.while_loop` whose per-layer
KV caches (B, H, T, Dh) round-trip HBM on EVERY step — each step reads the
whole cache, updates one row, and writes the whole cache back, plus a
kernel-launch per step. This is the same shape of problem the attn-LSTM
decode had (ops/decoder_kernel.py, measured 46x), so the same cure: pin
one batch-block's caches, cross-attention K/V, and all decoder weights in
VMEM and run the ENTIRE T-step loop inside one kernel — cache bytes never
leave the chip, and the decode is one kernel launch instead of T.

Head handling: Mosaic has no batched (leading-dim) matmul and head width
Dh is far below the 128-lane tile, so per-head slicing would mis-lower.
Instead the caches stay head-merged (Bb, T, D) and the per-head score
contraction/expansion runs as TWO dense matmuls against a constant
head-indicator matrix M[d, h] = [d // Dh == h]:

    scores(b, t', h) = sum_d (K[b, t', d] * q[b, d]) * M[d, h]
                     = reshape(K * q, (Bb*T, D)) @ M          # MXU
    out(b, d)        = sum_t' (w @ M^T)(b, t', d) * V[b, t', d]

The (Bb, T, D) -> (Bb*T, D) merge is layout-free when T is padded to the
dtype's sublane tile (8 rows for f32, 16 for bf16), which `_round_tile`
guarantees.

Semantics mirror transformer_decode_greedy exactly (argmax ties under
fused hardware rounding can differ, same caveat as the LSTM megakernel,
docstring there). Interpret-mode output is bit-comparable in fp32 and
covered by tests/test_transformer_kernel.py. Both greedy and beam search
(round 4, `_beam_kernel` below) are wired as the TPU defaults for the
family via Img2SeqModel (config `use_decoder_megakernel`, default
"auto").
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# exact-copy matmul precision for f32 selector/one-hot matmuls (see
# ops/decoder_kernel.py: the MXU's default f32 path runs bf16 passes)
_EXACT = jax.lax.Precision.HIGHEST


def _copy_precision(dt):
    return _EXACT if dt == jnp.float32 else None


def _round_tile(x: int, itemsize: int) -> int:
    """Round up to the sublane tile for this dtype (f32: 8, bf16: 16).

    The kernel's layout-free (Bb, T, D) -> (Bb*T, D) merges require the
    second-to-last dim padded to the dtype's sublane tile — 8 rows for
    4-byte types but 16 for bf16 (packed (16, 128) tiles), so rounding
    to 8 unconditionally would violate the kernel's own precondition
    under `decoder_dtype: bfloat16`."""
    tile = max(8, 32 // itemsize)
    return ((x + tile - 1) // tile) * tile


def _ln(x, g, b):
    """fp32 LayerNorm matching models/transformer.py:_layer_norm."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    return (y * g[None, :] + b[None, :]).astype(x.dtype)


def _mha_cached(q, k_all, v_all, m_head, m_head_t, scale, limit, dt):
    """Single-query multi-head attention against a (Bb, S, D) cache.

    q (Bb, D); positions s with s > limit (inclusive bound) are masked.
    Returns (Bb, D) in fp32. Softmax in fp32 per (b, h) group, attention
    weights cast to `dt` before the value contraction — the same
    precision schedule as the XLA _step_logits.
    """
    Bb, S, D = k_all.shape
    H = m_head.shape[1]
    prod = k_all.astype(jnp.float32) * q.astype(jnp.float32)[:, None, :]
    scores = jax.lax.dot_general(
        prod.reshape(Bb * S, D), m_head,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(Bb, S, H) * scale  # (Bb, S, H) fp32
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (Bb, S, H), 1)
    # NEG must be created inside the kernel trace: a module-level
    # jnp scalar is a committed device array -> illegal constant capture
    scores = jnp.where(s_ids <= limit, scores, jnp.float32(-1e30))
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    w = p / jnp.sum(p, axis=1, keepdims=True)  # (Bb, S, H) fp32
    w_exp = jax.lax.dot_general(
        w.astype(dt).astype(jnp.float32).reshape(Bb * S, H), m_head_t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_EXACT,
    ).reshape(Bb, S, D)
    return jnp.sum(w_exp * v_all.astype(jnp.float32), axis=1)  # (Bb, D) fp32


def _kernel(
    pos_ref,    # (Tp, D) positions, dt
    table_ref,  # (V, D) sqrt(D)-prescaled embeddings, dt
    start_ref,  # (1, D) sqrt(D)-prescaled start token, dt
    outw_ref,   # (D, V) dt
    lng_ref,    # (3L+1, D) f32 LayerNorm gains (3 per layer + final)
    lnb_ref,    # (3L+1, D) f32 LayerNorm biases
    wqkv_ref,   # (L, D, 3D) dt  [wq | wk | wv]
    wso_ref,    # (L, D, D) dt   self-attention output proj
    bso_ref,    # (L, D) f32
    wcq_ref,    # (L, D, D) dt   cross-attention query proj
    wco_ref,    # (L, D, D) dt
    bco_ref,    # (L, D) f32
    w1_ref,     # (L, D, F) dt
    b1_ref,     # (L, F) f32
    w2_ref,     # (L, F, D) dt
    b2_ref,     # (L, D) f32
    *rest,      # ck_0..ck_{L-1}, cv_0..cv_{L-1} (Bb, Rp, D) inputs in dt
                # or the packed decode_cross_kv_dtype (read whole +
                # upcast in _mha_cached, never stored to);
                # ids_ref (1, T, Bb) int32 output;
                # kc_0..kc_{L-1}, vc_0..vc_{L-1} (Bb, Tc, D) dt scratch
    L: int,
    H: int,
    T: int,
    R: int,
    id_end: int,
):
    ck_refs = rest[:L]
    cv_refs = rest[L : 2 * L]
    ids_ref = rest[2 * L]
    kc_refs = rest[2 * L + 1 : 3 * L + 1]
    vc_refs = rest[3 * L + 1 : 4 * L + 1]

    table = table_ref[...]
    V, D = table.shape
    dt = table.dtype
    Bb = ck_refs[0].shape[0]
    Dh = D // H
    scale = jnp.float32(1.0 / np.sqrt(Dh))

    # constant head-indicator matmuls (f32: exact 0/1 copies)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    m_head = (d_ids // Dh == h_ids).astype(jnp.float32)  # (D, H)
    m_head_t = m_head.T  # (H, D)

    lng = lng_ref[...]
    lnb = lnb_ref[...]
    wqkv = wqkv_ref[...]
    wso = wso_ref[...]
    bso = bso_ref[...]
    wcq = wcq_ref[...]
    wco = wco_ref[...]
    bco = bco_ref[...]
    w1 = w1_ref[...]
    b1 = b1_ref[...]
    w2 = w2_ref[...]
    b2 = b2_ref[...]

    col_v = jax.lax.broadcasted_iota(jnp.int32, (Bb, V), 1)

    def matmul(a, w, bias=None):
        out = jax.lax.dot_general(
            a, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bias is not None:
            out = out + bias[None, :]
        return out.astype(a.dtype)

    def step(t, carry):
        x, finished = carry  # x (Bb, D) dt; finished (Bb, 1) int32

        for l in range(L):
            # --- causal self-attention against the VMEM cache ------------
            h1 = _ln(x, lng[3 * l], lnb[3 * l])
            qkv = matmul(h1, wqkv[l])  # (Bb, 3D)
            q, k_t, v_t = jnp.split(qkv, 3, axis=1)
            kc_refs[l][:, pl.ds(t, 1), :] = k_t[:, None, :]
            vc_refs[l][:, pl.ds(t, 1), :] = v_t[:, None, :]
            sa = _mha_cached(
                q, kc_refs[l][...], vc_refs[l][...], m_head, m_head_t,
                scale, t, dt,
            )
            x = x + matmul(sa.astype(dt), wso[l], bso[l])

            # --- cross-attention against the precomputed memory KV -------
            h2 = _ln(x, lng[3 * l + 1], lnb[3 * l + 1])
            qc = matmul(h2, wcq[l])
            ca = _mha_cached(
                qc, ck_refs[l][...], cv_refs[l][...], m_head, m_head_t,
                scale, R - 1, dt,
            )
            x = x + matmul(ca.astype(dt), wco[l], bco[l])

            # --- MLP ------------------------------------------------------
            h3 = _ln(x, lng[3 * l + 2], lnb[3 * l + 2])
            hid = jax.nn.relu(matmul(h3, w1[l], b1[l]))
            x = x + matmul(hid, w2[l], b2[l])

        xf = _ln(x, lng[3 * L], lnb[3 * L])
        logits = jax.lax.dot_general(
            xf, outw_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Bb, V) fp32

        ids = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
        ids = jnp.where(finished > 0, jnp.int32(id_end), ids)
        ids_ref[0, pl.ds(t, 1), :] = ids.T
        new_finished = jnp.maximum(finished, (ids == id_end).astype(jnp.int32))

        # next input: embedding gather as a one-hot matmul + position
        onehot = (col_v == ids).astype(dt)
        emb = jax.lax.dot_general(
            onehot, table,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_copy_precision(dt),
        ).astype(dt)
        tp1 = jnp.minimum(t + 1, T - 1)
        nxt = emb + pos_ref[pl.ds(tp1, 1), :]
        return (nxt, new_finished)

    # zero the caches: positions > t are masked out of the softmax, but
    # uninitialized VMEM garbage (NaN bit patterns) would still reach the
    # output through 0 * NaN in the value contraction
    for l in range(L):
        kc_refs[l][...] = jnp.zeros_like(kc_refs[l])
        vc_refs[l][...] = jnp.zeros_like(vc_refs[l])

    x0 = jnp.broadcast_to(start_ref[0][None, :], (Bb, D)) + pos_ref[pl.ds(0, 1), :]
    jax.lax.fori_loop(0, T, step, (x0.astype(dt), jnp.zeros((Bb, 1), jnp.int32)))


def _auto_block_b(L: int, Tc: int, Rp: int, D: int, itemsize: int,
                  V: int = 0, F: int = 0, K: int = 1,
                  cross_itemsize: int = 0) -> int:
    """Largest batch block whose VMEM working set fits the budget.

    The working set has a fixed part — decoder weights, the (V, D)
    embedding table and (D, V) output matrix, LN/bias rows, positional
    table — and a per-batch-row part: the KV-cache scratch (Tc) plus the
    blocked cross-KV input copies, counted TWICE because the "parallel"
    grid double-buffers the next block's copies against this block's
    decode loop. Budgeting only the caches (the pre-r4 rule) compiled
    fine at 2L/256d/V=500 but let a large vocab or deeper/wider config
    blow the 100 MB vmem_limit at compile time on the DEFAULT decode
    path; with the complete accounting, oversized configs return 0 and
    take the XLA-loop fallback instead.

    The block size is the MXU lever: every per-step matmul has bb rows,
    so bb=8 runs the systolic array at 8/128 row utilization — measured
    on v5e (B=256, R=300, T=150, f32, 2L/256d) bb=8 decoded at 146 ms;
    bb=16 nearly halves that. The 72 MB budget keeps that config at
    bb=16 (fixed ~8.5 MB + 16 rows x ~3.0 MB = ~56 MB) while leaving
    ~28 MB of the 100 MB scoped limit for the fp32 attention transients
    and the output block."""
    # beam kernels (K > 1) get a higher budget: their dominant transient —
    # the K-way masked-select cache reorder — is chunked along the time
    # axis (see _beam_kernel), so per-step VMEM transients no longer scale
    # with K·bb and less headroom must be reserved for them. Greedy keeps
    # the measured 72 MB.
    budget = (88 if K > 1 else 72) * 1024 * 1024
    fixed = itemsize * (
        Tc * D                      # positional table
        + (V + 1) * D + D * V       # embedding table + start + out_w
        + L * (3 * D * D            # wqkv
               + 3 * D * D          # wso, wcq, wco
               + 2 * D * F)         # mlp w1/w2
    ) + 4 * (L * (2 * D + F + D) + (3 * L + 1) * 2 * D)  # biases + LN rows
    # beam (K > 1): K per-slot cache buffers per (layer, k/v); the cross
    # K/V blocks are shared across beam slots and do NOT scale with K.
    # cross_itemsize lets the cross blocks be stored packed (bf16 under an
    # fp32 decoder, decode_cross_kv_dtype): they are kernel INPUTS written
    # once per block — the Mosaic dynamic-row-store limitation only binds
    # the per-step SELF-cache stores, which stay at `itemsize`. Halving
    # the cross bytes is what lifts K=5/R=300 from bb=8 to bb=16.
    if cross_itemsize <= 0:
        cross_itemsize = itemsize
    per_row = 2 * L * (K * Tc * itemsize + 2 * Rp * cross_itemsize) * D
    bb = 64
    # NOTE on wide beams: an earlier revision hard-capped K>=4 at bb=8
    # because Mosaic's register allocator kept the K per-slot row blocks
    # live through whole-buffer masked-select reorder chains and spilled
    # 61.4 MB at K=5/bb=16 (147 MB total > the 128 MB VMEM — found by the
    # r4 beam-5 sweep). The reorder is now chunked along the time axis
    # (_beam_kernel), bounding those live ranges, so the block size is
    # budget-driven again for every K.
    while bb > 8 and fixed + bb * per_row > budget:
        bb //= 2
    if fixed + bb * per_row > budget:
        return 0
    return bb



def _cross_kv_blocks(layers, mem, dt, ck_dt, pad_b, Rp, R):
    """Head-merged cross K/V per layer, padded to (Bp, Rp, D), stored in
    ``ck_dt`` (the packed decode_cross_kv_dtype under an fp32 decoder).
    One definition for both kernels so the quantize-after-projection step
    cannot drift from models/transformer.py _cross_kv (the parity
    contract: project in dt, cast once, upcast at use)."""
    cks, cvs = [], []
    for layer in layers:
        p = layer["cross_attn"]
        ck = (mem @ p["wk"].astype(dt)).astype(ck_dt)
        cv = (mem @ p["wv"].astype(dt)).astype(ck_dt)
        cks.append(jnp.pad(ck, ((0, pad_b), (0, Rp - R), (0, 0))))
        cvs.append(jnp.pad(cv, ((0, pad_b), (0, Rp - R), (0, 0))))
    return cks, cvs


@functools.partial(
    jax.jit,
    static_argnames=("max_length", "id_end", "num_heads", "block_b", "interpret", "cross_kv_dtype"),
)
def transformer_decode_greedy_megakernel(
    dec_params: Dict,
    img_feat: jnp.ndarray,  # (B, H, W, C) or (B, R, C)
    max_length: int,
    id_end: int,
    num_heads: int = 8,
    block_b: int | None = None,
    interpret: bool = False,
    cross_kv_dtype=None,
) -> jnp.ndarray:
    """Greedy transformer decode with the whole T-loop in one Pallas
    kernel. Returns ids (B, max_length) int32 matching
    transformer_decode_greedy (END-filled after each sequence finishes).

    ``cross_kv_dtype`` stores the per-layer cross K/V blocks packed (e.g.
    bf16 under an fp32 decoder): they are written once per grid block and
    only ever read whole, so the dynamic-row-store limitation that keeps
    the SELF caches fp32 does not apply; _mha_cached upcasts on read. The
    same cast runs on the XLA path (models/transformer.py _cross_kv), so
    kernel/XLA token parity is preserved at equal settings."""
    from ..models.transformer import (
        encode_memory,
        sinusoidal_positions,
        transformer_decode_greedy,
    )

    mem = encode_memory(dec_params, img_feat)  # (B, R, D)
    dt = mem.dtype
    if dt.itemsize < 4 and not interpret:
        # Packed dtypes (bf16) cannot take the kernel's dynamic-row KV-cache
        # store: Mosaic requires the sublane offset of a (Bb, 1, D) store to
        # be tile-aligned for (16, 128)-tiled types, and the decode step t
        # is runtime-dynamic ("cannot statically prove that index in
        # dimension 1 is a multiple of 8"). Tile-rounding T (advisor r3
        # finding) fixes the merges but not this store, so non-f32 decoder
        # dtypes take the XLA loop.
        return transformer_decode_greedy(
            dec_params, img_feat, max_length, id_end, num_heads=num_heads,
            cross_kv_dtype=cross_kv_dtype,
        )
    ck_dt = jnp.dtype(cross_kv_dtype) if cross_kv_dtype is not None else dt
    B, R, _ = mem.shape
    layers = dec_params["layers"]
    L = len(layers)
    table = dec_params["embedding_table"]
    V, D = table.shape
    T = max_length
    Tc = _round_tile(T, dt.itemsize)
    # Rp pads the cross buffers' second-minor dim: round for the SMALLER
    # itemsize (larger sublane tile) so both dtypes' tilings are satisfied
    Rp = _round_tile(R, min(dt.itemsize, ck_dt.itemsize))

    if block_b is None:
        F = layers[0]["mlp"]["w1"].shape[1]
        block_b = _auto_block_b(L, Tc, Rp, D, dt.itemsize, V=V, F=F,
                                cross_itemsize=ck_dt.itemsize)
        if block_b == 0:
            return transformer_decode_greedy(
                dec_params, img_feat, T, id_end, num_heads=num_heads,
                cross_kv_dtype=cross_kv_dtype,
            )

    pad_b = (-B) % block_b
    cks, cvs = _cross_kv_blocks(layers, mem, dt, ck_dt, pad_b, Rp, R)
    Bp = B + pad_b
    n_blocks = Bp // block_b

    sqrt_d = float(np.sqrt(D))
    pos = sinusoidal_positions(Tc, D, dt)
    table_pre = (table * sqrt_d).astype(dt)
    start_pre = (dec_params["start_token"] * sqrt_d).astype(dt)[None, :]

    def stack(f):
        return jnp.stack([f(layer) for layer in layers])

    wqkv = stack(lambda l: jnp.concatenate(
        [l["self_attn"]["wq"], l["self_attn"]["wk"], l["self_attn"]["wv"]], axis=1
    )).astype(dt)
    wso = stack(lambda l: l["self_attn"]["wo"]).astype(dt)
    bso = stack(lambda l: l["self_attn"]["bo"]).astype(jnp.float32)
    wcq = stack(lambda l: l["cross_attn"]["wq"]).astype(dt)
    wco = stack(lambda l: l["cross_attn"]["wo"]).astype(dt)
    bco = stack(lambda l: l["cross_attn"]["bo"]).astype(jnp.float32)
    w1 = stack(lambda l: l["mlp"]["w1"]).astype(dt)
    b1 = stack(lambda l: l["mlp"]["b1"]).astype(jnp.float32)
    w2 = stack(lambda l: l["mlp"]["w2"]).astype(dt)
    b2 = stack(lambda l: l["mlp"]["b2"]).astype(jnp.float32)
    ln_rows = [(l["ln1"], l["ln2"], l["ln3"]) for l in layers]
    lng = jnp.stack(
        [p["g"] for row in ln_rows for p in row] + [dec_params["ln_f"]["g"]]
    ).astype(jnp.float32)
    lnb = jnp.stack(
        [p["b"] for row in ln_rows for p in row] + [dec_params["ln_f"]["b"]]
    ).astype(jnp.float32)

    kernel = functools.partial(
        _kernel, L=L, H=num_heads, T=T, R=R, id_end=id_end
    )
    full = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    blocked = pl.BlockSpec((block_b, Rp, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    ids_tb = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            full(pos.shape), full(table_pre.shape), full(start_pre.shape),
            full((D, V)), full(lng.shape), full(lnb.shape),
            full(wqkv.shape), full(wso.shape), full(bso.shape),
            full(wcq.shape), full(wco.shape), full(bco.shape),
            full(w1.shape), full(b1.shape), full(w2.shape), full(b2.shape),
        ] + [blocked] * (2 * L),
        out_specs=pl.BlockSpec((1, T, block_b), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, T, block_b), jnp.int32),
        scratch_shapes=[pltpu.VMEM((block_b, Tc, D), dt) for _ in range(2 * L)],
        compiler_params=pltpu.CompilerParams(
            # blocks are independent (caches re-zeroed per block):
            # "parallel" lets the pipeline overlap the next block's
            # cross-KV input copies with this block's decode loop
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        pos, table_pre, start_pre, dec_params["out_w"].astype(dt),
        lng, lnb, wqkv, wso, bso, wcq, wco, bco, w1, b1, w2, b2,
        *cks, *cvs,
    )
    ids = jnp.transpose(ids_tb, (0, 2, 1)).reshape(Bp, T)
    return ids[:B]


# --------------------------------------------------------------------------
# Beam search megakernel
# --------------------------------------------------------------------------
#
# Round 4 closes the family's last decode hole: beam-2 on the XLA loop ran
# 1,071 ms at B=256 (RESULTS.md "Decode megakernel coverage") because every
# step gathers the full (B, K, H, T, Dh) KV caches by parent through HBM.
# In the kernel the caches never leave VMEM; the parent reorder is a K-way
# masked select over per-slot cache buffers (elementwise VPU work — Mosaic
# has no dynamic row gather, and a (BK, BK) permute matmul cannot reach
# inside a 3-D cache), and the top-K / parent bookkeeping reuses the LSTM
# beam megakernel's machinery (ops/decoder_kernel.py _beam_kernel): beams
# folded into the sublane axis as row b*K + k, segment reductions and row
# permutes as one-hot matmuls. Semantics mirror
# models/transformer.py transformer_decode_beam exactly; the reference
# semantics preserved are beam_search_decoder_cell.py:43-391 (finished-beam
# END forcing, flat top-k, parent backtracking — the backtrack itself stays
# host-side in models/decoding.py finalize_beams, shared with every other
# beam path).


def _beam_kernel(
    pos_ref,    # (Tp, D) dt
    table_ref,  # (V, D) sqrt(D)-prescaled, dt
    start_ref,  # (1, D) sqrt(D)-prescaled, dt
    outw_ref,   # (D, V) dt
    lng_ref,    # (3L+1, D) f32
    lnb_ref,    # (3L+1, D) f32
    wqkv_ref,   # (L, D, 3D) dt
    wso_ref,    # (L, D, D) dt
    bso_ref,    # (L, D) f32
    wcq_ref,    # (L, D, D) dt
    wco_ref,    # (L, D, D) dt
    bco_ref,    # (L, D) f32
    w1_ref,     # (L, D, F) dt
    b1_ref,     # (L, F) f32
    w2_ref,     # (L, F, D) dt
    b2_ref,     # (L, D) f32
    *rest,      # ck_0..ck_{L-1}, cv_0..cv_{L-1} (Bb, Rp, D) inputs in dt
                # or the packed decode_cross_kv_dtype (read whole + upcast
                # in _mha_cached; cross K/V shared across beams — NOT
                # tiled by K);
                # outputs ids (1, T, BK), parents (1, T, BK) int32,
                # lp (1, BK, 1) f32, len (1, BK, 1) int32;
                # scratch kc/vc[l*K + j] (Bb, Tc, D) dt — per-layer,
                # PER-BEAM-SLOT self-attention caches
    L: int,
    H: int,
    T: int,
    R: int,
    K: int,
    id_end: int,
    div_log_gamma: float = 0.0,
):
    ck_refs = rest[:L]
    cv_refs = rest[L : 2 * L]
    ids_ref, parents_ref, lp_ref, len_ref = rest[2 * L : 2 * L + 4]
    kc_refs = rest[2 * L + 4 : 2 * L + 4 + L * K]
    vc_refs = rest[2 * L + 4 + L * K : 2 * L + 4 + 2 * L * K]

    table = table_ref[...]
    V, D = table.shape
    dt = table.dtype
    Bb = ck_refs[0].shape[0]
    BK = Bb * K
    Dh = D // H
    scale = jnp.float32(1.0 / np.sqrt(Dh))
    NEG = jnp.float32(-1e30)

    d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    m_head = (d_ids // Dh == h_ids).astype(jnp.float32)
    m_head_t = m_head.T

    lng = lng_ref[...]
    lnb = lnb_ref[...]
    wqkv = wqkv_ref[...]
    wso = wso_ref[...]
    bso = bso_ref[...]
    wcq = wcq_ref[...]
    wco = wco_ref[...]
    bco = bco_ref[...]
    w1 = w1_ref[...]
    b1 = b1_ref[...]
    w2 = w2_ref[...]
    b2 = b2_ref[...]

    # constant selectors over the (Bb, K) fold (see ops/decoder_kernel.py
    # _beam_kernel for the doctrine): row b*K + k
    sel_rows = jax.lax.broadcasted_iota(jnp.int32, (Bb, BK), 1)
    sel_base = jax.lax.broadcasted_iota(jnp.int32, (Bb, BK), 0) * K
    scat_rows = jax.lax.broadcasted_iota(jnp.int32, (BK, Bb), 0)
    scat_base = jax.lax.broadcasted_iota(jnp.int32, (BK, Bb), 1) * K
    group_base = (jax.lax.broadcasted_iota(jnp.int32, (BK, 1), 0) // K) * K
    perm_cols = jax.lax.broadcasted_iota(jnp.int32, (BK, BK), 1)
    P = [(perm_cols == group_base + k).astype(jnp.float32) for k in range(K)]

    def seg_reduce(col, combine):  # (BK, 1) f32 -> per-group reduce
        acc = None
        for k in range(K):
            mapped = jax.lax.dot_general(
                P[k], col, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_EXACT,
            )
            acc = mapped if acc is None else combine(acc, mapped)
        return acc

    def matmul(a, w, bias=None):
        out = jax.lax.dot_general(
            a, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bias is not None:
            out = out + bias[None, :]
        return out.astype(a.dtype)

    def sel_k(k, x):  # (BK, D) -> rows {b*K + k} -> (Bb, D)
        m = (sel_rows == sel_base + k).astype(dt)
        return jax.lax.dot_general(
            m, x.astype(dt), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_copy_precision(dt),
        )  # f32

    def scat_k(k, x):  # (Bb, D) f32 -> rows b*K + k of (BK, D), 0 elsewhere
        m = (scat_rows == scat_base + k).astype(jnp.float32)
        return jax.lax.dot_general(
            m, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_EXACT,
        )

    col_iota_V = jax.lax.broadcasted_iota(jnp.int32, (BK, V), 1)
    end_row = jnp.where(col_iota_V == id_end, 0.0, NEG)
    beam_idx = jax.lax.broadcasted_iota(jnp.int32, (BK, 1), 0) % K

    def step(t, carry):
        x, log_probs, finished, lengths = carry
        # x (BK, D) dt; log_probs (BK, 1) f32; finished (BK, 1) i32;
        # lengths (BK, 1) f32 (float: updated via permute matmul)

        for l in range(L):
            h1 = _ln(x, lng[3 * l], lnb[3 * l])
            qkv = matmul(h1, wqkv[l])  # (BK, 3D)
            q, k_t, v_t = jnp.split(qkv, 3, axis=1)
            sa = jnp.zeros((BK, D), jnp.float32)
            for k in range(K):
                k_t_k = sel_k(k, k_t).astype(dt)
                v_t_k = sel_k(k, v_t).astype(dt)
                kc_refs[l * K + k][:, pl.ds(t, 1), :] = k_t_k[:, None, :]
                vc_refs[l * K + k][:, pl.ds(t, 1), :] = v_t_k[:, None, :]
                sa_k = _mha_cached(
                    sel_k(k, q).astype(dt), kc_refs[l * K + k][...],
                    vc_refs[l * K + k][...], m_head, m_head_t, scale, t, dt,
                )  # (Bb, D) f32
                sa = sa + scat_k(k, sa_k)
            x = x + matmul(sa.astype(dt), wso[l], bso[l])

            h2 = _ln(x, lng[3 * l + 1], lnb[3 * l + 1])
            qc = matmul(h2, wcq[l])
            ca = jnp.zeros((BK, D), jnp.float32)
            for k in range(K):
                ca_k = _mha_cached(
                    sel_k(k, qc).astype(dt), ck_refs[l][...], cv_refs[l][...],
                    m_head, m_head_t, scale, R - 1, dt,
                )
                ca = ca + scat_k(k, ca_k)
            x = x + matmul(ca.astype(dt), wco[l], bco[l])

            h3 = _ln(x, lng[3 * l + 2], lnb[3 * l + 2])
            hid = jax.nn.relu(matmul(h3, w1[l], b1[l]))
            x = x + matmul(hid, w2[l], b2[l])

        xf = _ln(x, lng[3 * L], lnb[3 * L])
        logits = jax.lax.dot_general(
            xf, outw_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, V) f32

        m = jnp.max(logits, axis=-1, keepdims=True)
        shifted = logits - m
        step_logp = shifted - jnp.log(
            jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))
        step_logp = jnp.where(finished > 0, end_row, step_logp)
        total = log_probs + step_logp  # (BK, V)

        if div_log_gamma != 0.0:
            # deterministic intra-beam diversity penalty — identical
            # machinery to ops/decoder_kernel.py _beam_kernel
            pen = total
            penalized = jnp.full_like(total, NEG)
            for j in range(K):
                token_j = jnp.argmax(pen, axis=-1, keepdims=True).astype(jnp.int32)
                rowmax_j = jnp.max(pen, axis=-1, keepdims=True)
                hit_j = col_iota_V == token_j
                penalized = jnp.where(
                    hit_j, rowmax_j + jnp.float32(div_log_gamma) * j, penalized)
                pen = jnp.where(hit_j, NEG, pen)
            total = penalized

        # flat top-K over each group's (K, V) grid — identical iterative
        # segment-argmax to the LSTM beam kernel (same tie-breaking:
        # lowest parent row, then lowest token)
        work = total
        k_idx = beam_idx.astype(jnp.float32)
        j_col = k_idx
        BIG = jnp.float32(1e30)
        parents_col = jnp.zeros((BK, 1), jnp.int32)
        tokens_col = jnp.zeros((BK, 1), jnp.int32)
        new_lp = jnp.zeros((BK, 1), jnp.float32)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (BK, V), 0)
        for j in range(K):
            rowmax = jnp.max(work, axis=1, keepdims=True)
            grpmax = seg_reduce(rowmax, jnp.maximum)
            cand = jnp.where(rowmax >= grpmax, k_idx, BIG)
            parent = seg_reduce(cand, jnp.minimum).astype(jnp.int32)
            srcsel = (perm_cols == group_base + parent).astype(jnp.float32)
            chosen = jax.lax.dot_general(
                srcsel, work, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_EXACT,
            )
            token = jnp.argmax(chosen, axis=-1, keepdims=True).astype(jnp.int32)
            is_j = j_col == float(j)
            parents_col = jnp.where(is_j, parent, parents_col)
            tokens_col = jnp.where(is_j, token, tokens_col)
            new_lp = jnp.where(is_j, grpmax, new_lp)
            hit = jnp.logical_and(
                row_iota == group_base + parent, col_iota_V == token)
            work = jnp.where(hit, NEG, work)

        ids_ref[0, pl.ds(t, 1), :] = tokens_col.T
        parents_ref[0, pl.ds(t, 1), :] = parents_col.T

        # KV-cache reorder: per-slot parent as (Bb, 1) int, then a K-way
        # masked select across the per-slot buffers. The select runs in
        # CHUNKS along the time axis (the reorder mixes only across the K
        # buffer axis, so time positions are independent): whole-buffer
        # selects kept all 2K (Bb, Tc, D) values live through the chain,
        # and at K=5/bb=16 Mosaic's register allocator spilled 61 MB for
        # them (the r4 beam-5 sweep failure that forced the bb=8 cap).
        # Chunking bounds the live set at 2K·Bb·chunk·D bytes per
        # iteration, and the loop stops after the chunk holding position
        # t — later positions are still the zeros this kernel initialized
        # (masked out of every softmax), and zeros permute to zeros.
        pars = []
        for k in range(K):
            p_f = sel_k(k, jnp.broadcast_to(
                parents_col.astype(jnp.float32), (BK, D)).astype(dt))
            pars.append(p_f[:, :1].astype(jnp.int32))  # (Bb, 1)
        masks = [
            [(pars[k] == m).astype(jnp.float32)[:, :, None] for m in range(K)]
            for k in range(K)
        ]
        Tc = kc_refs[0].shape[1]
        chunk = max(8, 32 // np.dtype(dt).itemsize)  # the sublane tile
        assert Tc % chunk == 0, (Tc, chunk)

        def reorder_chunk(c, _):
            off = c * chunk
            for l in range(L):
                for refs in (kc_refs, vc_refs):
                    olds = [
                        refs[l * K + m][:, pl.ds(off, chunk), :]
                        for m in range(K)
                    ]
                    news = []
                    for k in range(K):
                        acc = olds[0].astype(jnp.float32) * masks[k][0]
                        for m in range(1, K):
                            acc = acc + olds[m].astype(jnp.float32) * masks[k][m]
                        news.append(acc.astype(dt))
                    for k in range(K):
                        refs[l * K + k][:, pl.ds(off, chunk), :] = news[k]
            return 0

        jax.lax.fori_loop(0, t // chunk + 1, reorder_chunk, 0)

        # permute the (BK, 1) carries by parent (one-hot matmul)
        src = parents_col + group_base
        perm = (perm_cols == src).astype(jnp.float32)

        def permute(col):
            return jax.lax.dot_general(
                perm, col, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_EXACT,
            )

        prev_fin = permute(finished.astype(jnp.float32))
        prev_fin_i = (prev_fin > 0.5).astype(jnp.int32)
        new_finished = jnp.maximum(
            prev_fin_i, (tokens_col == id_end).astype(jnp.int32))
        new_lengths = permute(lengths) + (1 - prev_fin_i).astype(jnp.float32)

        onehot_tok = (col_iota_V == tokens_col).astype(dt)
        emb = jax.lax.dot_general(
            onehot_tok, table, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_copy_precision(dt),
        ).astype(dt)
        tp1 = jnp.minimum(t + 1, T - 1)
        nxt = emb + pos_ref[pl.ds(tp1, 1), :]
        return (nxt.astype(dt), new_lp, new_finished, new_lengths)

    for i in range(L * K):
        kc_refs[i][...] = jnp.zeros_like(kc_refs[i])
        vc_refs[i][...] = jnp.zeros_like(vc_refs[i])

    x0 = jnp.broadcast_to(start_ref[0][None, :], (BK, D)) + pos_ref[pl.ds(0, 1), :]
    log_probs0 = jnp.where(beam_idx == 0, 0.0, NEG)
    carry = (
        x0.astype(dt), log_probs0,
        jnp.zeros((BK, 1), jnp.int32), jnp.zeros((BK, 1), jnp.float32),
    )
    _, log_probs, _, lengths = jax.lax.fori_loop(0, T, step, carry)
    lp_ref[0] = log_probs
    len_ref[0] = lengths.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_length", "id_end", "beam_size", "length_norm_alpha",
        "num_heads", "block_b", "interpret", "div_gamma", "div_prob",
        "cross_kv_dtype",
    ),
)
def transformer_decode_beam_megakernel(
    dec_params: Dict,
    img_feat: jnp.ndarray,  # (B, H, W, C) or (B, R, C)
    max_length: int,
    id_end: int,
    beam_size: int,
    length_norm_alpha: float = 0.0,
    num_heads: int = 8,
    block_b: int | None = None,
    interpret: bool = False,
    div_gamma: float = 1.0,
    div_prob: float = 0.0,
    cross_kv_dtype=None,
):
    """Transformer beam search with the whole T-loop in one Pallas kernel.

    Returns a BeamOutput matching models/transformer.py
    transformer_decode_beam. Like the LSTM beam megakernel, the
    deterministic diversity penalty (div_prob >= 1, 0 < div_gamma < 1)
    runs in-kernel; the stochastic variant falls back to the XLA loop
    (a kernel cannot reproduce its random stream), as do configs whose
    K-scaled caches exceed the VMEM budget. Length normalization and
    parent backtracking reuse models/decoding.py finalize_beams.
    """
    from ..models.decoding import finalize_beams
    from ..models.transformer import (
        encode_memory,
        sinusoidal_positions,
        transformer_decode_beam,
    )

    K = beam_size
    use_div = (div_gamma != 1.0) and (div_prob > 0.0)
    div_kernel_ok = use_div and div_prob >= 1.0 and 0.0 < div_gamma < 1.0

    def _fallback():
        return transformer_decode_beam(
            dec_params, img_feat, max_length, id_end, K,
            div_gamma=div_gamma, div_prob=div_prob,
            length_norm_alpha=length_norm_alpha, num_heads=num_heads,
            cross_kv_dtype=cross_kv_dtype,
        )

    if use_div and not div_kernel_ok:
        return _fallback()

    mem = encode_memory(dec_params, img_feat)  # (B, R, D)
    dt = mem.dtype
    if dt.itemsize < 4 and not interpret:
        # same packed-dtype limitation as the greedy kernel: the per-step
        # KV-cache row store has a runtime-dynamic sublane offset, which
        # Mosaic rejects for (16, 128)-tiled types — bf16 decoders take
        # the XLA loop.
        return _fallback()
    B, R, _ = mem.shape
    ck_dt = jnp.dtype(cross_kv_dtype) if cross_kv_dtype is not None else dt
    layers = dec_params["layers"]
    L = len(layers)
    table = dec_params["embedding_table"]
    V, D = table.shape
    T = max_length
    Tc = _round_tile(T, dt.itemsize)
    # round for the smaller itemsize so both dtypes' sublane tilings hold
    Rp = _round_tile(R, min(dt.itemsize, ck_dt.itemsize))

    if block_b is None:
        F = layers[0]["mlp"]["w1"].shape[1]
        block_b = _auto_block_b(L, Tc, Rp, D, dt.itemsize, V=V, F=F, K=K,
                                cross_itemsize=ck_dt.itemsize)
        if block_b == 0:
            return _fallback()
        # the top-k permutation matmuls scale with (Bb*K)^2 — keep BK
        # in the LSTM beam kernel's measured sweet spot
        block_b = min(block_b, max(8, (128 // K) // 8 * 8))

    pad_b = (-B) % block_b
    cks, cvs = _cross_kv_blocks(layers, mem, dt, ck_dt, pad_b, Rp, R)
    Bp = B + pad_b
    n_blocks = Bp // block_b
    BK = block_b * K

    sqrt_d = float(np.sqrt(D))
    pos = sinusoidal_positions(Tc, D, dt)
    table_pre = (table * sqrt_d).astype(dt)
    start_pre = (dec_params["start_token"] * sqrt_d).astype(dt)[None, :]

    def stack(f):
        return jnp.stack([f(layer) for layer in layers])

    wqkv = stack(lambda l: jnp.concatenate(
        [l["self_attn"]["wq"], l["self_attn"]["wk"], l["self_attn"]["wv"]], axis=1
    )).astype(dt)
    wso = stack(lambda l: l["self_attn"]["wo"]).astype(dt)
    bso = stack(lambda l: l["self_attn"]["bo"]).astype(jnp.float32)
    wcq = stack(lambda l: l["cross_attn"]["wq"]).astype(dt)
    wco = stack(lambda l: l["cross_attn"]["wo"]).astype(dt)
    bco = stack(lambda l: l["cross_attn"]["bo"]).astype(jnp.float32)
    w1 = stack(lambda l: l["mlp"]["w1"]).astype(dt)
    b1 = stack(lambda l: l["mlp"]["b1"]).astype(jnp.float32)
    w2 = stack(lambda l: l["mlp"]["w2"]).astype(dt)
    b2 = stack(lambda l: l["mlp"]["b2"]).astype(jnp.float32)
    ln_rows = [(l["ln1"], l["ln2"], l["ln3"]) for l in layers]
    lng = jnp.stack(
        [p["g"] for row in ln_rows for p in row] + [dec_params["ln_f"]["g"]]
    ).astype(jnp.float32)
    lnb = jnp.stack(
        [p["b"] for row in ln_rows for p in row] + [dec_params["ln_f"]["b"]]
    ).astype(jnp.float32)

    kernel = functools.partial(
        _beam_kernel, L=L, H=num_heads, T=T, R=R, K=K, id_end=id_end,
        div_log_gamma=float(np.log(div_gamma)) if div_kernel_ok else 0.0,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    blocked = pl.BlockSpec((block_b, Rp, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    ids_tb, parents_tb, lp, lens = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            full(pos.shape), full(table_pre.shape), full(start_pre.shape),
            full((D, V)), full(lng.shape), full(lnb.shape),
            full(wqkv.shape), full(wso.shape), full(bso.shape),
            full(wcq.shape), full(wco.shape), full(bco.shape),
            full(w1.shape), full(b1.shape), full(w2.shape), full(b2.shape),
        ] + [blocked] * (2 * L),
        out_specs=(
            pl.BlockSpec((1, T, BK), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, BK), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks, T, BK), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, T, BK), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, BK, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, BK, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, Tc, D), dt) for _ in range(2 * L * K)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the physical v5e VMEM: the 88 MB data budget (_auto_block_b)
            # admits mid-band shapes whose data + fp32 attention
            # transients can exceed a 100 MB scoped cap while fitting the
            # hardware — give Mosaic the real capacity and let the budget
            # math (plus trainer._decode_fallback_model on the eval path)
            # govern
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        pos, table_pre, start_pre, dec_params["out_w"].astype(dt),
        lng, lnb, wqkv, wso, bso, wcq, wco, bco, w1, b1, w2, b2,
        *cks, *cvs,
    )

    # (n_blocks, T, Bb*K) -> (T, B, K); the BK axis is (Bb, K) row-major
    ids_buf = jnp.transpose(ids_tb, (1, 0, 2)).reshape(T, Bp, K)[:, :B]
    parents_buf = jnp.transpose(parents_tb, (1, 0, 2)).reshape(T, Bp, K)[:, :B]
    log_probs = lp.reshape(Bp, K)[:B]
    lengths = lens.reshape(Bp, K)[:B]
    return finalize_beams(ids_buf, parents_buf, log_probs, lengths, length_norm_alpha)
