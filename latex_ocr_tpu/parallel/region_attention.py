"""Sequence-parallel attention: shard the image-region axis across chips.

SURVEY.md §2.3 (SP/CP row): the reference's attention runs over image
regions (R = H'·W' after the CNN's /8 reduction, up to ~7k for the widest
buckets) on one device (reference model/components/attention_mechanism.py:31).
For very large buckets on small-HBM chips, the TPU-native scale-out is to
shard R across the mesh and reassemble the softmax with collectives —
the blockwise/ring-attention recipe specialized to one query per step:

  - each chip holds a (B, R/n, ·) shard of ``att_img``/``regions``
  - local scores + a 3-collective online softmax: psum-max (stability),
    psum of exp-sums (denominator), psum of the locally-weighted context
    (numerator). All three ride ICI; no chip ever materializes full-R.

Numerics match the unsharded ``models/decoder.py:attention_context``
exactly in fp32 (same max-subtracted softmax; addition reassociation only).

This module is exercised on the 8-device CPU mesh in tests
(tests/test_parallel.py) — the same virtual-mesh contract the DP path
uses (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def region_sharding(mesh: Mesh, axis_name: str = "region") -> NamedSharding:
    """Shard axis 1 (the region axis of (B, R, ·) tensors) over the mesh."""
    return NamedSharding(mesh, P(None, axis_name))


def attention_context_region_sharded(
    dec_params: Dict,
    att_img: jnp.ndarray,  # (B, R, dim_e), R sharded over the mesh
    regions: jnp.ndarray,  # (B, R, C), R sharded over the mesh
    h: jnp.ndarray,  # (B, num_units), replicated
    mesh: Mesh,
    axis_name: str = "region",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bahdanau attention with the region axis sharded across ``mesh``.

    Returns (context (B, C) replicated, weights (B, R) region-sharded) —
    the same contract as the unsharded attention_context.
    """
    att = dec_params["att"]
    h_w = att["h_w"]
    beta = att["beta"]

    def local(att_img_s, regions_s, h_r, h_w_r, beta_r):
        # att_img_s/regions_s: (B, R/n, ·) local shards
        att_h = h_r @ h_w_r.astype(h_r.dtype)  # (B, dim_e)
        e = jnp.tanh(att_img_s + att_h[:, None, :])
        scores = (e @ beta_r.astype(e.dtype)).astype(jnp.float32)  # (B, R/n)
        # online softmax across shards: global max, then exp-sum + weighted
        # context as psums — no full-R tensor on any chip
        m = jax.lax.pmax(jnp.max(scores, axis=-1), axis_name)  # (B,)
        ex = jnp.exp(scores - m[:, None])  # (B, R/n)
        denom = jax.lax.psum(jnp.sum(ex, axis=-1), axis_name)  # (B,)
        a = (ex / denom[:, None]).astype(regions_s.dtype)  # (B, R/n)
        ctx = jax.lax.psum(
            jnp.einsum("br,brc->bc", a.astype(jnp.float32),
                       regions_s.astype(jnp.float32)),
            axis_name,
        )
        return ctx.astype(regions_s.dtype), a

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name), P(None, axis_name), P(), P(), P()),
        out_specs=(P(), P(None, axis_name)),
    )(att_img, regions, h, h_w, beta)


def make_region_cross_mha(
    mesh: Mesh,
    batch_axis: str | None = None,
    axis_name: str = "region",
):
    """Region-sharded multi-head cross-attention for the transformer family
    — the ``config.region_parallel`` integration for
    ``decoder_arch: "transformer"`` (teacher forcing).

    The transformer's training memory hot spot at large buckets is the
    (B, H, T, R) cross-attention score tensor (T up to 151, R up to ~7k for
    the widest buckets): sharding the memory/region axis divides it — and
    the (B, R, D) projected memory plus its K/V — by the region-mesh size.
    Recipe matches the LSTM path's Bahdanau shard (``make_region_attn_fn``):
    each chip holds an R/n shard of the memory, computes local K/V and
    scores, and the softmax reassembles with an online max (all_gather, so
    the whole fn stays differentiable) + psum denominator + psum of the
    locally-weighted values. No chip materializes a full-R tensor.

    Returns ``cross_mha(p, q_in, mem, n_heads) -> (B, T, D)`` — a drop-in
    for the cross-attention sublayer of
    ``models.transformer.transformer_teacher_forcing_logits`` (which
    handles the residual add around it). Attention weights are not
    materialized on this path (``alpha_c`` and the visualizer need the
    unsharded model).
    """
    b = batch_axis
    n_region = int(mesh.shape[axis_name])

    def cross_mha(p: Dict, q_in: jnp.ndarray, mem: jnp.ndarray, n_heads: int):
        from ..models.transformer import _merge_heads, _split_heads

        R = mem.shape[1]
        pad = (-R) % n_region
        if pad:
            mem = jnp.pad(mem, ((0, 0), (0, pad), (0, 0)))
        Rs = (R + pad) // n_region

        def local(q_in_s, mem_s, wq, wk, wv, wo, bo):
            dt = q_in_s.dtype
            q = _split_heads(q_in_s @ wq.astype(dt), n_heads)  # (B, H, T, Dh)
            k = _split_heads(mem_s @ wk.astype(dt), n_heads)  # (B, H, Rs, Dh)
            v = _split_heads(mem_s @ wv.astype(dt), n_heads)
            scale = 1.0 / float(np.sqrt(q.shape[-1]))
            scores = (
                jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
            )  # (B, H, T, Rs)
            if pad:
                pos = jax.lax.axis_index(axis_name) * Rs + jnp.arange(Rs)
                scores = jnp.where(pos < R, scores, jnp.float32(-1e30))
            # online softmax across region shards; all_gather+max instead of
            # pmax keeps the fn differentiable (the shift cancels in the
            # softmax — stop_gradient makes that explicit)
            m = jax.lax.stop_gradient(
                jnp.max(
                    jax.lax.all_gather(jnp.max(scores, axis=-1), axis_name),
                    axis=0,
                )
            )  # (B, H, T)
            ex = jnp.exp(scores - m[..., None])
            denom = jax.lax.psum(jnp.sum(ex, axis=-1), axis_name)
            w = ex / denom[..., None]  # (B, H, T, Rs) fp32
            ctx = jax.lax.psum(
                jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.float32)),
                axis_name,
            ).astype(dt)
            return _merge_heads(ctx) @ wo.astype(dt) + bo.astype(dt)

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(b), P(b, axis_name), P(), P(), P(), P(), P()),
            out_specs=P(b),
        )(q_in, mem, p["wq"], p["wk"], p["wv"], p["wo"], p["bo"])

    return cross_mha


def make_region_attn_fn(
    mesh: Mesh,
    batch_axis: str | None = None,
    axis_name: str = "region",
):
    """Build a drop-in replacement for ``models.decoder.attention_context``
    with the region axis sharded over ``mesh[axis_name]`` — the user-facing
    integration behind ``config.region_parallel``.

    ``batch_axis`` composes SP with DP on a 2-D (data, region) mesh: batch
    rows shard over ``batch_axis`` while each row's regions shard over
    ``axis_name``, so the Bahdanau softmax's psum collectives ride only the
    region submesh. The returned fn is differentiable (shard_map + psum
    have transpose rules), so it serves teacher-forced training as well as
    decode.

    Weights are returned fully materialized ((B, R), same contract as the
    unsharded fn) — XLA keeps them region-sharded under jit; they are only
    all-gathered if a consumer (alpha_c regularizer, visualization) asks
    for them.
    """
    b = batch_axis
    n_region = int(mesh.shape[axis_name])

    def attn_fn(dec_params, att_img, regions, h):
        """h: (B, U) — per-batch query — or (B, K, U) — beam query (the
        image tensors stay un-tiled, matching attention_context_beam's
        broadcast-over-beams contract). Returns (ctx, weights) with the
        leading shape of h."""
        att = dec_params["att"]
        beam = h.ndim == 3
        R = att_img.shape[1]
        # the bucket tables produce arbitrary R = (H/8-2)(W/8-2); pad the
        # region axis up to the mesh multiple and mask the tail to -inf so
        # every bucket shards (e.g. R=92 on an 8-way region mesh -> 96)
        pad = (-R) % n_region
        if pad:
            att_img = jnp.pad(att_img, ((0, 0), (0, pad), (0, 0)))
            regions = jnp.pad(regions, ((0, 0), (0, pad), (0, 0)))
        Rs = (R + pad) // n_region

        def local(att_img_s, regions_s, h_r, h_w_r, beta_r):
            att_h = h_r @ h_w_r.astype(h_r.dtype)  # (B/n_d, [K,] dim_e)
            if beam:
                e = jnp.tanh(att_img_s[:, None, :, :] + att_h[:, :, None, :])
            else:
                e = jnp.tanh(att_img_s + att_h[:, None, :])
            scores = (e @ beta_r.astype(e.dtype)).astype(jnp.float32)
            if pad:
                pos = jax.lax.axis_index(axis_name) * Rs + jnp.arange(Rs)
                scores = jnp.where(pos < R, scores, jnp.float32(-1e30))
            # global max via all_gather+max rather than pmax: the stability
            # shift cancels in the softmax (stop_gradient makes that
            # explicit), and pmax has no JAX differentiation rule while
            # all_gather does — this keeps the whole attn_fn trainable
            m = jax.lax.stop_gradient(
                jnp.max(
                    jax.lax.all_gather(jnp.max(scores, axis=-1), axis_name),
                    axis=0,
                )
            )
            ex = jnp.exp(scores - m[..., None])
            denom = jax.lax.psum(jnp.sum(ex, axis=-1), axis_name)
            a = (ex / denom[..., None]).astype(regions_s.dtype)
            eq = "bkr,brc->bkc" if beam else "br,brc->bc"
            ctx = jax.lax.psum(
                jnp.einsum(eq, a.astype(jnp.float32),
                           regions_s.astype(jnp.float32)),
                axis_name,
            )
            return ctx.astype(regions_s.dtype), a

        a_spec = P(b, None, axis_name) if beam else P(b, axis_name)
        ctx, a = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(b, axis_name), P(b, axis_name), P(b), P(), P()),
            out_specs=(P(b), a_spec),
        )(att_img, regions, h, att["h_w"], att["beta"])
        return ctx, a[..., :R]

    return attn_fn
