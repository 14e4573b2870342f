"""Pallas TPU kernel: fused Bahdanau attention context.

One decoder step computes, per query row q (a batch item, or a
batch-item x beam pair):

    s_r   = beta . tanh(att_img[q, r] + att_h[q])     r = 1..R regions
    a     = softmax(s)
    ctx_q = sum_r a_r * regions[q, r]

The XLA version materializes the (Q, R, E) tanh intermediate in HBM every
step. This kernel streams att_img/regions through VMEM in R-blocks with an
online softmax (flash-attention style: running max m, running sum l, and a
rescaled context accumulator), so per step each image tensor is read from
HBM exactly once and nothing (Q, R, E)-sized is ever written back.

Beam sharing: for beam search the image tensors are shaped (B, R, *) while
queries are (B*K, E); the BlockSpec index map `q // beams` reads the same
image block for all K beams of a batch item without materializing K copies.

Used in the inference path (no VJP needed); training keeps the XLA formul-
ation, whose backward pass XLA fuses well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attention_kernel(
    att_h_ref,  # (1, E)            query projection for this q
    beta_ref,  # (1, E)
    att_img_ref,  # (1, Rb, E)      image keys block
    regions_ref,  # (1, Rb, C)      image values block
    ctx_ref,  # (1, C)              output context
    m_ref,  # (1, 1) scratch        running max
    l_ref,  # (1, 1) scratch        running sum of exp
    acc_ref,  # (1, C) scratch      running rescaled context
    *,
    r_total: int,
    block_r: int,
):
    r_idx = pl.program_id(1)

    @pl.when(r_idx == 0)
    def _init():
        m_ref[0, 0] = NEG_INF
        l_ref[0, 0] = 0.0
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # scores for this block: tanh(att_img + att_h) @ beta   -> (Rb,)
    e = jnp.tanh(att_img_ref[0] + att_h_ref[0][None, :])  # (Rb, E)
    s = jax.lax.dot_general(
        e,
        beta_ref[0][:, None],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, 0]  # (Rb,)

    # mask out padding regions in the final partial block
    start = r_idx * block_r
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (block_r, 1), 0)[:, 0] + start
    s = jnp.where(r_ids < r_total, s, NEG_INF)

    # online softmax update
    m_prev = m_ref[0, 0]
    m_new = jnp.maximum(m_prev, jnp.max(s))
    p = jnp.exp(s - m_new)  # (Rb,)
    scale = jnp.exp(m_prev - m_new)
    l_ref[0, 0] = l_ref[0, 0] * scale + jnp.sum(p)

    pv = jax.lax.dot_general(
        p[None, :].astype(regions_ref.dtype),
        regions_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, C)
    acc_ref[...] = acc_ref[...] * scale + pv
    m_ref[0, 0] = m_new

    @pl.when(r_idx == pl.num_programs(1) - 1)
    def _finalize():
        ctx_ref[...] = (acc_ref[...] / l_ref[0, 0]).astype(ctx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("beams", "block_r", "interpret"))
def fused_attention_context(
    att_img: jnp.ndarray,  # (B, R, E)
    regions: jnp.ndarray,  # (B, R, C)
    att_h: jnp.ndarray,  # (Q, E) with Q = B * beams
    beta: jnp.ndarray,  # (E,)
    beams: int = 1,
    block_r: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused context vectors (Q, C); queries q map to image q // beams."""
    B, R, E = att_img.shape
    C = regions.shape[-1]
    Q = att_h.shape[0]
    assert Q == B * beams, (Q, B, beams)

    block_r = min(block_r, _round_up(R, 128))
    r_blocks = pl.cdiv(R, block_r)
    r_pad = r_blocks * block_r - R
    if r_pad:
        att_img = jnp.pad(att_img, ((0, 0), (0, r_pad), (0, 0)))
        regions = jnp.pad(regions, ((0, 0), (0, r_pad), (0, 0)))

    kernel = functools.partial(_attention_kernel, r_total=R, block_r=block_r)
    grid = (Q, r_blocks)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, E), lambda q, r: (q, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda q, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, block_r, E),
                lambda q, r, _b=beams: (q // _b, r, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_r, C),
                lambda q, r, _b=beams: (q // _b, r, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, C), lambda q, r: (q, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, C), regions.dtype),
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(att_h, beta[None, :], att_img, regions)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def reference_attention_context(att_img, regions, att_h, beta, beams: int = 1):
    """Plain-XLA reference implementation (for testing the kernel)."""
    B, R, E = att_img.shape
    Q = att_h.shape[0]
    K = beams
    att_h_b = att_h.reshape(B, K, E)
    e = jnp.tanh(att_img[:, None, :, :] + att_h_b[:, :, None, :])
    scores = e @ beta
    a = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(regions.dtype)
    ctx = jnp.einsum("bkr,brc->bkc", a, regions)
    return ctx.reshape(Q, -1)
