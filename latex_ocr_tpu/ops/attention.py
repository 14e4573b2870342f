"""Pallas TPU kernel: fused Bahdanau attention context.

One decoder step computes, per query (a batch item x beam pair):

    s_r   = beta . tanh(att_img[b, r] + att_h[b, k])     r = 1..R regions
    a     = softmax(s)
    ctx   = sum_r a_r * regions[b, r]

The XLA version materializes the (B, K, R, E) tanh intermediate in HBM
every step. This kernel streams att_img/regions through VMEM in R-blocks
with an online softmax (flash-attention style: running max m, running sum
l, rescaled context accumulator), so per step each image tensor is read
from HBM exactly once and nothing (B, K, R, E)-sized is ever written.

Layout: grid = (B, R/block_r); each kernel instance handles ALL K beams
of one image, so beam search shares the image block reads without any
K-fold tiling. Block shapes keep the Mosaic constraint (last two dims
divisible by (8, 128) or equal to the array dims) by putting (K, E) /
(block_r, E) / (block_r, C) in the trailing positions.

Used in the inference path (no VJP needed); training keeps the XLA
formulation, whose backward pass XLA fuses well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attention_kernel(
    att_h_ref,  # (1, K, E)       all beam queries for this image
    beta_ref,  # (1, E)
    att_img_ref,  # (1, Rb, E)    image keys block
    regions_ref,  # (1, Rb, C)    image values block
    ctx_ref,  # (1, K, C)         output contexts
    m_ref,  # (K, 128) scratch    running max (col 0 used, full-width ops)
    l_ref,  # (K, 128) scratch    running sum of exp
    acc_ref,  # (K, C) scratch    running rescaled context
    *,
    r_total: int,
    block_r: int,
):
    r_idx = pl.program_id(1)

    @pl.when(r_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    ah = att_h_ref[0]  # (K, E)
    K, E = ah.shape
    Rb = att_img_ref.shape[1]

    # scores: beta . tanh(att_img + att_h)  -> (K, Rb), fp32
    # (lane-dim multiply-reduce: Mosaic cannot reshape a bf16 row to a column
    # for a matvec, and the VPU reduction is just as fast for E=256)
    e = jnp.tanh(att_img_ref[0][None, :, :] + ah[:, None, :])  # (K, Rb, E)
    s = jnp.sum(
        e.astype(jnp.float32) * beta_ref[0][None, None, :].astype(jnp.float32),
        axis=-1,
    )  # (K, Rb)

    # mask padding regions in the final partial block
    start = r_idx * block_r
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (K, Rb), 1) + start
    s = jnp.where(r_ids < r_total, s, NEG_INF)

    # online softmax update (per beam row)
    m_prev = m_ref[:, 0:1]  # (K, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)  # (K, Rb)
    scale = jnp.exp(m_prev - m_new)  # (K, 1)
    l_ref[:, 0:1] = l_ref[:, 0:1] * scale + jnp.sum(p, axis=1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(regions_ref.dtype),
        regions_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, C)
    acc_ref[...] = acc_ref[...] * scale + pv
    m_ref[:, 0:1] = m_new

    @pl.when(r_idx == pl.num_programs(1) - 1)
    def _finalize():
        ctx_ref[0] = (acc_ref[...] / l_ref[:, 0:1]).astype(ctx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("beams", "block_r", "interpret"))
def fused_attention_context(
    att_img: jnp.ndarray,  # (B, R, E)
    regions: jnp.ndarray,  # (B, R, C)
    att_h: jnp.ndarray,  # (Q, E) with Q = B * beams
    beta: jnp.ndarray,  # (E,)
    beams: int = 1,
    block_r: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused context vectors (Q, C); queries of image b are rows b*K..b*K+K-1."""
    B, R, E = att_img.shape
    C = regions.shape[-1]
    Q = att_h.shape[0]
    K = beams
    assert Q == B * K, (Q, B, K)

    block_r = min(block_r, _round_up(R, 8))
    r_blocks = pl.cdiv(R, block_r)
    r_pad = r_blocks * block_r - R
    if r_pad:
        att_img = jnp.pad(att_img, ((0, 0), (0, r_pad), (0, 0)))
        regions = jnp.pad(regions, ((0, 0), (0, r_pad), (0, 0)))

    att_h_bk = att_h.reshape(B, K, E)

    kernel = functools.partial(_attention_kernel, r_total=R, block_r=block_r)
    grid = (B, r_blocks)

    ctx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, K, E), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, block_r, E), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_r, C), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, K, C), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, K, C), regions.dtype),
        scratch_shapes=[
            pltpu.VMEM((K, 128), jnp.float32),
            pltpu.VMEM((K, 128), jnp.float32),
            pltpu.VMEM((K, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(att_h_bk, beta[None, :], att_img, regions)
    return ctx.reshape(Q, C)


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
