"""Pallas greedy-decode megakernel (prototype, opt-in).

Motivation (docs/design.md §11): the XLA decode loop re-reads the image
tensors (att_img (B,R,E), regions (B,R,C)) from HBM on every step. This
kernel pins one batch-block's image tensors and all decoder weights in
VMEM and runs the ENTIRE T-step greedy loop inside the kernel — each image
byte crosses HBM exactly once per decode instead of once per step.

Layout: grid = (B / block_b,), one instance per batch block. The id
buffer is (T, block_b) so per-step writes hit the sublane dimension.

Status: SHIPPED (round 2). Compiles and runs on the real TPU with the
2026-08-16 toolchain after two fixes: (a) the toolchain itself now
legalizes 3-D vector ops under `fori_loop` (round-1 blocker, repro kept
in tests), and (b) the `finished` loop carry must be int32 — an i1
(Bb, 1) carry fails Mosaic legalization of `scf.for`
("tpu.unroll_vectors (8,1)xi1 -> (8,128,32)xi1"). Interpret-mode output
is bit-identical to `decode_greedy`; compiled output can flip argmax on
near-ties (hardware tanh/exp rounding differs from XLA's), which is
inherent to any fused kernel. Measured on v5e (B=256, R=184, T=151,
fp32): 23.9 ms vs 1113 ms for the XLA `lax.while_loop` decode — ~46x,
because the image tensors cross HBM once per decode instead of once per
step and the whole step graph is one kernel launch. Wired as the default
greedy decode on TPU via Img2SeqModel (config `use_decoder_megakernel`,
default "auto").

Both kernels dispatch on the recurrence family (`_cell_update`): the TF1
LSTM gates or the torch-semantics GRU (models/decoder.py:gru_step), so
`cell_type: "gru"` keeps the megakernel decode paths.

Beam variant `decode_beam_megakernel`: same VMEM-residency story, beam
rows folded into the sublane axis (row b*K + k), per-group flat top-k as
K rounds of segment argmax built from constant one-hot matmuls —
sub-8-sublane row slices and (1, K)-shaped ops mis-lower on this
toolchain, so everything stays (Bb*K, ·)-shaped. Measured on v5e
(B=256, R=184, T=151, fp32): K=2 41.4 ms vs 3042 ms XLA (73x), K=5
93.2 ms vs 2230 ms (24x). Wired as the default beam decode on TPU
(falls back to XLA for the diversity penalty, gated attention, or
huge buckets).

Interpret-mode parity note: the kernels compute the Bahdanau score as
sum(e * beta) where XLA runs e @ beta — different accumulation order
over dim_e. At the small test dims this is exact; at dim_e ~512 with
*untrained* near-uniform logits the accumulated beam scores can drift
~1e-3 relative and flip near-tied beams (LSTM and GRU alike) — the same
inherent near-tie caveat as the compiled path above. Greedy stays exact.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One-hot/selector matmuls must copy values EXACTLY: the MXU's default
# f32 matmul runs bf16 multiply passes, and a bf16-rounded copy breaks
# the equality comparisons the beam top-k relies on (and quantizes
# gathered state). HIGHEST forces the exact multi-pass f32 path; the
# real math matmuls keep the default, matching XLA's own TPU behavior.
_EXACT = jax.lax.Precision.HIGHEST


def _copy_precision(dt):
    """HIGHEST is only legal (and only needed) for f32 operands; a bf16
    one-hot matmul is already an exact copy (bf16*1.0 accumulated f32)."""
    return _EXACT if dt == jnp.float32 else None


def _cell_update(cell, cell_refs, emb, o, c, h):
    """Recurrent cell inside the kernel: (new_c, new_h).

    Mirrors models/decoder.py lstm_step / gru_step computation order
    exactly (same concat/matmul/bias association) so interpret-mode
    output is bit-identical to the XLA decode loop. `cell` is a static
    Python string; `cell_refs` are the cell's VMEM weight refs —
    (w, b) for lstm, (w_ih, w_hh, b_ih, b_hh) for gru.
    """
    if cell == "lstm":
        w_ref, b_ref = cell_refs
        z = jax.lax.dot_general(
            jnp.concatenate([emb, o, h], axis=1),
            w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0][None, :]
        i_g, j_g, f_g, o_g = jnp.split(z, 4, axis=1)
        new_c = c * jax.nn.sigmoid(f_g + 1.0) + jax.nn.sigmoid(i_g) * jnp.tanh(j_g)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o_g)
        return new_c, new_h
    # torch.nn.GRUCell semantics (models/decoder.py:gru_step): the reset
    # gate scales the post-matmul hidden candidate; cell state unused.
    w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref = cell_refs
    gi = jax.lax.dot_general(
        jnp.concatenate([emb, o], axis=1),
        w_ih_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ih_ref[0][None, :]
    gh = jax.lax.dot_general(
        h, w_hh_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_hh_ref[0][None, :]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=1)
    r = jax.nn.sigmoid(i_r + h_r)
    z_g = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return c, (1.0 - z_g) * n + z_g * h


def _cell_inputs_specs(dec_params: Dict, dt):
    """(cell, inputs, specs) for the kernel's cell-weight slots."""
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, n=len(shape): (0,) * n, memory_space=pltpu.VMEM
    )
    if "gru" in dec_params:
        g = dec_params["gru"]
        inputs = [
            g["w_ih"].astype(dt),
            g["w_hh"].astype(dt),
            g["b_ih"].astype(jnp.float32)[None, :],
            g["b_hh"].astype(jnp.float32)[None, :],
        ]
        return "gru", inputs, [full(x.shape) for x in inputs]
    inputs = [
        dec_params["lstm"]["w"].astype(dt),
        dec_params["lstm"]["b"].astype(jnp.float32)[None, :],
    ]
    return "lstm", inputs, [full(x.shape) for x in inputs]


def _kernel(
    att_img_ref,  # (Bb, R, E)
    regions_ref,  # (Bb, R, C)
    c0_ref,  # (Bb, U)
    h0_ref,  # (Bb, U)
    o0_ref,  # (Bb, O)
    *rest,  # cell weight refs — (w (emb+O+U, 4U), b (1, 4U)) for lstm,
            # (w_ih (emb+O, 3U), w_hh (U, 3U), b_ih, b_hh (1, 3U)) for
            # gru — then att_h_w (U, E), beta (1, E), o_w_h (U, O),
            # o_w_c (C, O), y_w_o (O, V), table (V, emb), start (1, emb),
            # ids (1, T, Bb) output int32
    T: int,
    id_end: int,
    cell: str = "lstm",
):
    n_cell = 2 if cell == "lstm" else 4
    cell_refs = rest[:n_cell]
    (
        att_h_w_ref,
        beta_ref,
        o_w_h_ref,
        o_w_c_ref,
        y_w_o_ref,
        table_ref,
        start_ref,
        ids_ref,
    ) = rest[n_cell:]
    att_img = att_img_ref[...]
    regions = regions_ref[...]
    Bb, R, E = att_img.shape
    C = regions.shape[-1]
    U = h0_ref.shape[-1]
    V, emb_dim = table_ref.shape

    def step(t, carry):
        c, h, o, emb, finished = carry
        new_c, new_h = _cell_update(cell, cell_refs, emb, o, c, h)

        att_h = jax.lax.dot_general(
            new_h, att_h_w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Bb, E)
        e = jnp.tanh(att_img.astype(jnp.float32) + att_h[:, None, :])  # (Bb, R, E)
        s = jnp.sum(e * beta_ref[0][None, None, :].astype(jnp.float32), axis=-1)
        a = jax.nn.softmax(s, axis=-1)  # (Bb, R) fp32

        # per-image context: a[b] @ regions[b]; static unroll over the block
        ctx = jnp.stack(
            [
                jax.lax.dot_general(
                    a[b][None, :].astype(regions.dtype),
                    regions[b],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[0]
                for b in range(Bb)
            ],
            axis=0,
        )  # (Bb, C) fp32

        new_o = jnp.tanh(
            jax.lax.dot_general(
                new_h, o_w_h_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                ctx.astype(regions.dtype), o_w_c_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        logits = jax.lax.dot_general(
            new_o.astype(regions.dtype), y_w_o_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Bb, V)

        # keep everything >= 2-D: Mosaic dislikes 1-D vectors. `finished` is
        # int32 (not bool): i1 loop carries fail to legalize under scf.for
        # ("tpu.unroll_vectors (8,1)xi1 -> (8,128,32)xi1", 2026-08-16 toolchain)
        ids = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)  # (Bb, 1)
        ids = jnp.where(finished > 0, jnp.int32(id_end), ids)
        ids_ref[0, pl.ds(t, 1), :] = ids.T
        new_finished = jnp.maximum(
            finished, (ids == id_end).astype(jnp.int32)
        )  # (Bb, 1) int32 0/1

        # embedding gather as a one-hot matmul (MXU-native; Mosaic has no
        # general dynamic row gather)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (Bb, V), 1) == ids
        ).astype(regions.dtype)
        new_emb = jax.lax.dot_general(
            onehot, table_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_copy_precision(regions.dtype),
        )
        return (
            new_c.astype(c.dtype),
            new_h.astype(h.dtype),
            new_o.astype(o.dtype),
            new_emb.astype(emb.dtype),
            new_finished,
        )

    dt = regions.dtype
    emb0 = jnp.broadcast_to(start_ref[0][None, :], (Bb, emb_dim)).astype(dt)
    finished0 = jnp.zeros((Bb, 1), jnp.int32)
    carry = (
        c0_ref[...].astype(dt),
        h0_ref[...].astype(dt),
        o0_ref[...].astype(dt),
        emb0,
        finished0,
    )
    jax.lax.fori_loop(0, T, step, carry)


def _auto_block_b(R: int, E: int, C: int, itemsize: int) -> int:
    """Largest batch block whose image tensors fit the VMEM budget, or 0.

    v5e has 128 MB of physical VMEM; the default 16 MB scoped limit is
    raised via vmem_limit_bytes, so blocks are sized against a 24 MB
    image-tensor budget (double-buffered by the pipeline, plus ~12 MB of
    weights, comfortably under 100 MB). Bigger blocks help the MXU: at
    R=184/fp32/T=151, block 8 -> 20.2 ms, block 16 -> 13.3 ms,
    block 32 -> 10.6 ms per B=256 decode.

    Mosaic requires block sublane dims divisible by 8, so the block floor
    is 8; returns 0 when even a block of 8 cannot hold the image tensors
    (huge buckets, e.g. R≈4500 for 1600x200) — callers fall back to the
    XLA decode loop there.
    """
    budget = 24 * 1024 * 1024
    bb = 64
    while bb > 8 and bb * R * (E + C) * itemsize > budget:
        bb //= 2
    if bb * R * (E + C) * itemsize > budget:
        return 0
    return bb


@functools.partial(
    jax.jit,
    static_argnames=("max_length", "id_end", "block_b", "interpret", "fallback_use_pallas"),
)
def decode_greedy_megakernel(
    dec_params: Dict,
    img_feat: jnp.ndarray,  # (B, H, W, C) or (B, R, C)
    max_length: int,
    id_end: int,
    block_b: int | None = None,
    interpret: bool = False,
    fallback_use_pallas: bool = False,
) -> jnp.ndarray:
    """Greedy decode with the whole T-loop in one Pallas kernel.

    Returns ids (B, max_length) int32, matching `decode_greedy` semantics
    (END-filled after each sequence finishes).
    """
    from ..models.decoder import compute_att_img, flatten_regions, initial_state

    if "gate" in dec_params:
        # Show-Attend-Tell context gate not fused in the kernel
        from ..models.decoding import decode_greedy

        return decode_greedy(dec_params, img_feat, max_length, id_end,
                             use_pallas=fallback_use_pallas)

    regions = flatten_regions(img_feat)
    att_img = compute_att_img(dec_params, regions)
    s0 = initial_state(dec_params, regions)
    B, R, C = regions.shape
    if block_b is None:
        block_b = _auto_block_b(R, att_img.shape[-1], C, regions.dtype.itemsize)
        if block_b == 0:
            # image tensors for even one 8-row block exceed VMEM (huge
            # bucket): stream from HBM — and there the blockwise Pallas
            # attention (online softmax over R) still pays, so keep it
            from ..models.decoding import decode_greedy

            return decode_greedy(dec_params, img_feat, max_length, id_end,
                                 use_pallas=fallback_use_pallas)

    pad_b = (-B) % block_b
    if pad_b:
        regions = jnp.pad(regions, ((0, pad_b), (0, 0), (0, 0)))
        att_img = jnp.pad(att_img, ((0, pad_b), (0, 0), (0, 0)))
        s0 = type(s0)(*(jnp.pad(s, ((0, pad_b), (0, 0))) for s in s0))
    Bp = B + pad_b
    n_blocks = Bp // block_b

    dt = regions.dtype
    cell, cell_inputs, cell_specs = _cell_inputs_specs(dec_params, dt)
    att = dec_params["att"]
    out = dec_params["out"]
    T = max_length

    kernel = functools.partial(_kernel, T=T, id_end=id_end, cell=cell)

    ids_tb = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_b, R, att_img.shape[-1]), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, R, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, s0.c.shape[-1]), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, s0.h.shape[-1]), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, s0.o.shape[-1]), lambda b: (b, 0), memory_space=pltpu.VMEM),
            *cell_specs,
            pl.BlockSpec(att["h_w"].shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, att["beta"].shape[0]), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(out["o_w_h"].shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(out["o_w_c"].shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(out["y_w_o"].shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(dec_params["embedding_table"].shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dec_params["start_token"].shape[0]), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, block_b), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, T, block_b), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        att_img,
        regions,
        s0.c.astype(dt),
        s0.h.astype(dt),
        s0.o.astype(dt),
        *cell_inputs,
        att["h_w"].astype(dt),
        att["beta"].astype(dt)[None, :],
        out["o_w_h"].astype(dt),
        out["o_w_c"].astype(dt),
        out["y_w_o"].astype(dt),
        dec_params["embedding_table"].astype(dt),
        dec_params["start_token"].astype(dt)[None, :],
    )
    # (n_blocks, T, block_b) -> (B, T)
    ids = jnp.transpose(ids_tb, (0, 2, 1)).reshape(Bp, T)
    return ids[:B]


# --------------------------------------------------------------------- beam


def _beam_kernel(
    att_img_ref,  # (Bb, R, E)
    regions_ref,  # (Bb, R, C)
    c0_ref,  # (Bb, U)
    h0_ref,  # (Bb, U)
    o0_ref,  # (Bb, O)
    *rest,  # cell weight refs (see _kernel) — then att_h_w (U, E),
            # beta (1, E), o_w_h (U, O), o_w_c (C, O), y_w_o (O, V),
            # table (V, emb), start (1, emb), and the outputs:
            # ids (1, T, Bb*K) int32, parents (1, T, Bb*K) int32
            # (within-K parent index), lp (1, Bb*K, 1) fp32 final raw
            # scores, len (1, Bb*K, 1) int32 hyp lengths incl. END
    T: int,
    K: int,
    id_end: int,
    div_log_gamma: float = 0.0,
    cell: str = "lstm",
):
    """Full beam search, T steps in one kernel instance.

    Semantics mirror models/decoding.py decode_beam exactly: finished
    beams are forced to extend with END at probability 1, top-K over the
    flat (K, V) continuation grid with lowest-flat-index tie-breaking,
    parent pointers recorded per step for the host-side backtrack. Beam
    rows are folded into the sublane axis as row b*K + k; every gather /
    broadcast over the fold is a one-hot matmul (Mosaic has no dynamic
    row gather, and the MXU eats these for free at this size).
    """
    n_cell = 2 if cell == "lstm" else 4
    cell_refs = rest[:n_cell]
    (
        att_h_w_ref,
        beta_ref,
        o_w_h_ref,
        o_w_c_ref,
        y_w_o_ref,
        table_ref,
        start_ref,
        ids_ref,
        parents_ref,
        lp_ref,
        len_ref,
    ) = rest[n_cell:]
    att_img = att_img_ref[...]
    regions = regions_ref[...]
    Bb, R, E = att_img.shape
    C = regions.shape[-1]
    V, emb_dim = table_ref.shape
    BK = Bb * K
    dt = regions.dtype
    NEG = jnp.float32(-1e30)

    # constant selectors over the (Bb, K) fold, built once per instance:
    # expand rows b -> rows b*K+k (state broadcast over beams)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (BK, Bb), 0)  # row index
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (BK, Bb), 1)
    expand = (row_ids // K == col_ids).astype(dt)  # (BK, Bb)

    def bcast(x):  # (Bb, D) -> (BK, D), row b*K+k = x[b]
        return jax.lax.dot_general(
            expand, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_copy_precision(dt),
        ).astype(x.dtype)

    # per-beam row selectors: pick rows {b*K+k : b} -> (Bb, D)
    sel_rows = jax.lax.broadcasted_iota(jnp.int32, (Bb, BK), 1)
    sel_base = jax.lax.broadcasted_iota(jnp.int32, (Bb, BK), 0) * K
    # scatter rows b -> b*K+k
    scat_rows = jax.lax.broadcasted_iota(jnp.int32, (BK, Bb), 0)
    scat_base = jax.lax.broadcasted_iota(jnp.int32, (BK, Bb), 1) * K

    group_base = (
        jax.lax.broadcasted_iota(jnp.int32, (BK, 1), 0) // K
    ) * K  # (BK, 1): b*K for each row
    # P_k copies row (g*K + k) of a (BK, 1) column to every row of group g;
    # segment max/min over the K-row groups = elementwise max/min of the K
    # P_k-mapped copies. Constant, built once.
    perm_cols = jax.lax.broadcasted_iota(jnp.int32, (BK, BK), 1)
    P = [
        (perm_cols == group_base + k).astype(jnp.float32) for k in range(K)
    ]  # each (BK, BK)

    def seg_reduce(col, combine):  # col (BK, 1) f32 -> per-group reduce
        acc = None
        for k in range(K):
            mapped = jax.lax.dot_general(
                P[k], col,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_EXACT,
            )
            acc = mapped if acc is None else combine(acc, mapped)
        return acc  # (BK, 1), constant within each group

    c = bcast(c0_ref[...].astype(dt))
    h = bcast(h0_ref[...].astype(dt))
    o = bcast(o0_ref[...].astype(dt))
    emb = jnp.broadcast_to(start_ref[0][None, :], (BK, emb_dim)).astype(dt)
    # only beam 0 live at t=0
    beam_idx = jax.lax.broadcasted_iota(jnp.int32, (BK, 1), 0) % K
    log_probs = jnp.where(beam_idx == 0, 0.0, NEG)  # (BK, 1) fp32
    finished = jnp.zeros((BK, 1), jnp.int32)
    lengths = jnp.zeros((BK, 1), jnp.float32)  # float: updated via matmul

    col_iota_V = jax.lax.broadcasted_iota(jnp.int32, (BK, V), 1)
    end_row = jnp.where(col_iota_V == id_end, 0.0, NEG)  # (BK, V)

    def step(t, carry):
        c, h, o, emb, log_probs, finished, lengths = carry

        new_c, new_h = _cell_update(cell, cell_refs, emb, o, c, h)

        att_h = jax.lax.dot_general(
            new_h, att_h_w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, E) fp32

        # attention per beam slice k: image tensors stay un-tiled in VMEM
        ctx = jnp.zeros((BK, C), jnp.float32)
        for k in range(K):
            sel_k = (sel_rows == sel_base + k).astype(dt)  # (Bb, BK)
            att_h_k = jax.lax.dot_general(
                sel_k, att_h.astype(dt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_copy_precision(dt),
            )  # (Bb, E)
            e_k = jnp.tanh(att_img.astype(jnp.float32) + att_h_k[:, None, :])
            s_k = jnp.sum(e_k * beta_ref[0][None, None, :].astype(jnp.float32), axis=-1)
            a_k = jax.nn.softmax(s_k, axis=-1)  # (Bb, R) fp32
            ctx_k = jnp.stack(
                [
                    jax.lax.dot_general(
                        a_k[b][None, :].astype(dt),
                        regions[b],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )[0]
                    for b in range(Bb)
                ],
                axis=0,
            )  # (Bb, C) fp32
            scat_k = (scat_rows == scat_base + k).astype(jnp.float32)  # (BK, Bb)
            ctx = ctx + jax.lax.dot_general(
                scat_k, ctx_k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_EXACT,
            )

        new_o = jnp.tanh(
            jax.lax.dot_general(
                new_h, o_w_h_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                ctx.astype(dt), o_w_c_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        logits = jax.lax.dot_general(
            new_o.astype(dt), y_w_o_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, V) fp32

        # log_softmax in fp32 (stable: subtract rowmax first)
        m = jnp.max(logits, axis=-1, keepdims=True)
        shifted = logits - m
        step_logp = shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))
        step_logp = jnp.where(finished > 0, end_row, step_logp)
        total = log_probs + step_logp  # (BK, V)

        if div_log_gamma != 0.0:
            # Deterministic intra-beam diversity penalty (Li et al. 2016,
            # reference config div_gamma with div_prob=1): rank-r entry of
            # each row gets + log(gamma)*r. For gamma < 1 the penalty is
            # strictly decreasing in rank, so within-row order is
            # preserved and only each row's top-K entries can ever win
            # the global (K, V) top-K — extract exactly those K with
            # iterative argmax (ties -> lowest token, matching argsort
            # rank order) and mask the rest to NEG. Exact vs the XLA
            # _div_penalty path; gamma >= 1 callers use the XLA loop.
            pen = total
            penalized = jnp.full_like(total, NEG)
            for j in range(K):
                token_j = jnp.argmax(pen, axis=-1, keepdims=True).astype(jnp.int32)
                rowmax_j = jnp.max(pen, axis=-1, keepdims=True)
                hit_j = col_iota_V == token_j
                penalized = jnp.where(
                    hit_j, rowmax_j + jnp.float32(div_log_gamma) * j, penalized
                )
                pen = jnp.where(hit_j, NEG, pen)
            total = penalized

        # top-K over each group's (K, V) grid: K iterations of segment
        # argmax, all on full (BK, ·) tensors (sub-8-sublane slices and
        # tiny matmuls mis-lower on this toolchain). Tie-breaking matches
        # lax.top_k on the flat (K*V,) vector: lowest parent row first,
        # then lowest token.
        work = total  # (BK, V)
        k_idx = (
            jax.lax.broadcasted_iota(jnp.int32, (BK, 1), 0) % K
        ).astype(jnp.float32)
        j_col = k_idx  # destination beam index per row, same values
        BIG = jnp.float32(1e30)
        parents_col = jnp.zeros((BK, 1), jnp.int32)
        tokens_col = jnp.zeros((BK, 1), jnp.int32)
        new_lp = jnp.zeros((BK, 1), jnp.float32)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (BK, V), 0)
        for j in range(K):
            rowmax = jnp.max(work, axis=1, keepdims=True)  # (BK, 1)
            grpmax = seg_reduce(rowmax, jnp.maximum)  # (BK, 1)
            cand = jnp.where(rowmax >= grpmax, k_idx, BIG)
            parent = seg_reduce(cand, jnp.minimum).astype(jnp.int32)  # (BK, 1)
            # every row of group g reads the chosen source row g*K+parent
            srcsel = (perm_cols == group_base + parent).astype(jnp.float32)
            chosen = jax.lax.dot_general(
                srcsel, work,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_EXACT,
            )  # (BK, V): group-constant rows
            token = jnp.argmax(chosen, axis=-1, keepdims=True).astype(jnp.int32)
            is_j = j_col == float(j)
            parents_col = jnp.where(is_j, parent, parents_col)
            tokens_col = jnp.where(is_j, token, tokens_col)
            new_lp = jnp.where(is_j, grpmax, new_lp)
            # retire the chosen (parent, token) cell in every group
            hit = jnp.logical_and(
                row_iota == group_base + parent, col_iota_V == token
            )
            work = jnp.where(hit, NEG, work)

        ids_ref[0, pl.ds(t, 1), :] = tokens_col.T
        parents_ref[0, pl.ds(t, 1), :] = parents_col.T

        # permutation: destination row (b, j) pulls source row b*K + parent
        src = parents_col + group_base  # (BK, 1)
        perm_iota = jax.lax.broadcasted_iota(jnp.int32, (BK, BK), 1)
        perm = (perm_iota == src).astype(jnp.float32)

        def permute(x):
            return jax.lax.dot_general(
                perm, x.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_EXACT,
            ).astype(x.dtype)

        new_c = permute(new_c)
        new_h = permute(new_h)
        new_o = permute(new_o)
        prev_fin = permute(finished.astype(jnp.float32))
        prev_fin_i = (prev_fin > 0.5).astype(jnp.int32)
        new_finished = jnp.maximum(prev_fin_i, (tokens_col == id_end).astype(jnp.int32))
        new_lengths = permute(lengths) + (1 - prev_fin_i).astype(jnp.float32)

        onehot_tok = (col_iota_V == tokens_col).astype(dt)
        new_emb = jax.lax.dot_general(
            onehot_tok, table_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_copy_precision(dt),
        ).astype(dt)

        return (
            new_c.astype(c.dtype),
            new_h.astype(h.dtype),
            new_o.astype(o.dtype),
            new_emb.astype(emb.dtype),
            new_lp,
            new_finished,
            new_lengths,
        )

    carry = (c, h, o, emb, log_probs, finished, lengths)
    _, _, _, _, log_probs, _, lengths = jax.lax.fori_loop(0, T, step, carry)
    lp_ref[0] = log_probs
    len_ref[0] = lengths.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_length", "id_end", "beam_size", "length_norm_alpha", "block_b",
        "interpret",
        "fallback_use_pallas", "div_gamma", "div_prob",
    ),
)
def decode_beam_megakernel(
    dec_params: Dict,
    img_feat: jnp.ndarray,  # (B, H, W, C) or (B, R, C)
    max_length: int,
    id_end: int,
    beam_size: int,
    length_norm_alpha: float = 0.0,
    block_b: int | None = None,
    interpret: bool = False,
    fallback_use_pallas: bool = False,
    div_gamma: float = 1.0,
    div_prob: float = 0.0,
):
    """Beam search with the whole T-loop in one Pallas kernel.

    Returns a BeamOutput matching `decode_beam`. The deterministic
    diversity penalty (div_prob >= 1, 0 < div_gamma < 1) runs inside the
    kernel; the stochastic (Bernoulli-masked) or gamma >= 1 variants fall
    back to the XLA loop, whose random stream a kernel cannot reproduce.
    The kernel emits raw (ids, parents, log_probs, lengths) buffers;
    length normalization and parent backtracking reuse
    models/decoding.py finalize_beams.
    """
    from ..models.decoder import compute_att_img, flatten_regions, initial_state
    from ..models.decoding import decode_beam, finalize_beams

    K = beam_size
    use_div = (div_gamma != 1.0) and (div_prob > 0.0)
    div_kernel_ok = use_div and div_prob >= 1.0 and 0.0 < div_gamma < 1.0

    def _fallback():
        return decode_beam(
            dec_params, img_feat, max_length, id_end, K,
            div_gamma=div_gamma, div_prob=div_prob,
            length_norm_alpha=length_norm_alpha, use_pallas=fallback_use_pallas,
        )

    if "gate" in dec_params or (use_div and not div_kernel_ok):
        return _fallback()

    regions = flatten_regions(img_feat)
    att_img = compute_att_img(dec_params, regions)
    s0 = initial_state(dec_params, regions)
    B, R, C = regions.shape
    if block_b is None:
        block_b = _auto_block_b(R, att_img.shape[-1], C, regions.dtype.itemsize)
        if block_b == 0:
            return _fallback()
        # the top-k permutation matmuls scale with (Bb*K)^2 — measured
        # sweet spot is Bb*K around 64-128 (bf16, R=184: K=2 best at
        # Bb=32-64, K=5 best at Bb=16-24)
        block_b = min(block_b, max(8, (128 // K) // 8 * 8))

    pad_b = (-B) % block_b
    if pad_b:
        regions = jnp.pad(regions, ((0, pad_b), (0, 0), (0, 0)))
        att_img = jnp.pad(att_img, ((0, pad_b), (0, 0), (0, 0)))
        s0 = type(s0)(*(jnp.pad(s, ((0, pad_b), (0, 0))) for s in s0))
    Bp = B + pad_b
    n_blocks = Bp // block_b
    BK = block_b * K

    dt = regions.dtype
    cell, cell_inputs, cell_specs = _cell_inputs_specs(dec_params, dt)
    att = dec_params["att"]
    out = dec_params["out"]
    T = max_length

    kernel = functools.partial(
        _beam_kernel, T=T, K=K, id_end=id_end,
        div_log_gamma=float(np.log(div_gamma)) if div_kernel_ok else 0.0,
        cell=cell,
    )

    ids_tb, parents_tb, lp, lens = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_b, R, att_img.shape[-1]), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, R, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, s0.c.shape[-1]), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, s0.h.shape[-1]), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, s0.o.shape[-1]), lambda b: (b, 0), memory_space=pltpu.VMEM),
            *cell_specs,
            pl.BlockSpec(att["h_w"].shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, att["beta"].shape[0]), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(out["o_w_h"].shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(out["o_w_c"].shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(out["y_w_o"].shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(dec_params["embedding_table"].shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dec_params["start_token"].shape[0]), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        att_img,
        regions,
        s0.c.astype(dt),
        s0.h.astype(dt),
        s0.o.astype(dt),
        *cell_inputs,
        att["h_w"].astype(dt),
        att["beta"].astype(dt)[None, :],
        out["o_w_h"].astype(dt),
        out["o_w_c"].astype(dt),
        out["y_w_o"].astype(dt),
        dec_params["embedding_table"].astype(dt),
        dec_params["start_token"].astype(dt)[None, :],
    )

    # (n_blocks, T, Bb*K) -> (T, B, K); the BK axis is (Bb, K) row-major
    ids_buf = jnp.transpose(ids_tb, (1, 0, 2)).reshape(T, Bp, K)[:, :B]
    parents_buf = jnp.transpose(parents_tb, (1, 0, 2)).reshape(T, Bp, K)[:, :B]
    log_probs = lp.reshape(Bp, K)[:B]
    lengths = lens.reshape(Bp, K)[:B]
    return finalize_beams(ids_buf, parents_buf, log_probs, lengths, length_norm_alpha)
