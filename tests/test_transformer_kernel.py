"""Transformer decode megakernel: interpret-mode parity with the XLA loop."""

import jax
import jax.numpy as jnp
import numpy as np

from latex_ocr_tpu.models.transformer import (
    init_transformer_decoder_params,
    transformer_decode_greedy,
)
from latex_ocr_tpu.ops.transformer_kernel import transformer_decode_greedy_megakernel
from latex_ocr_tpu.utils import Config


def _cfg(**tf):
    base = {"num_layers": 2, "num_heads": 4, "dim_model": 32, "dim_ff": 64}
    base.update(tf)
    return Config({"attn_cell_config": {"cell_type": "lstm", "num_units": 16,
                                         "dim_e": 8, "dim_o": 16, "dim_embeddings": 8},
                   "decoder_arch": "transformer", "transformer_config": base})


def test_transformer_megakernel_matches_greedy_interpret():
    cfg = _cfg()
    dec = init_transformer_decoder_params(jax.random.PRNGKey(1), cfg, n_tok=11, n_channels=512)
    feat = jax.random.normal(jax.random.PRNGKey(2), (5, 2, 4, 512), jnp.float32)
    ref = transformer_decode_greedy(dec, feat, 9, 10, num_heads=4)
    mega = transformer_decode_greedy_megakernel(
        dec, feat, 9, 10, num_heads=4, block_b=4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(mega))


def test_transformer_megakernel_batch_padding():
    """B not a multiple of the block: the pad rows must not leak."""
    cfg = _cfg(num_layers=1, num_heads=2)
    dec = init_transformer_decoder_params(jax.random.PRNGKey(3), cfg, n_tok=9, n_channels=512)
    feat = jax.random.normal(jax.random.PRNGKey(4), (3, 1, 5, 512), jnp.float32)
    ref = transformer_decode_greedy(dec, feat, 6, 8, num_heads=2)
    mega = transformer_decode_greedy_megakernel(
        dec, feat, 6, 8, num_heads=2, block_b=2, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(mega))


def test_transformer_megakernel_huge_bucket_fallback():
    """block_b=None with an R too large for VMEM falls back to the XLA
    loop (exact same function, so just check it returns sane ids)."""
    from latex_ocr_tpu.ops.transformer_kernel import _auto_block_b

    assert _auto_block_b(L=6, Tc=152, Rp=20000, D=512, itemsize=4) == 0


def test_transformer_beam_megakernel_matches_xla_interpret():
    from latex_ocr_tpu.models.transformer import transformer_decode_beam
    from latex_ocr_tpu.ops.transformer_kernel import (
        transformer_decode_beam_megakernel,
    )

    cfg = _cfg()
    dec = init_transformer_decoder_params(jax.random.PRNGKey(5), cfg, n_tok=11, n_channels=512)
    feat = jax.random.normal(jax.random.PRNGKey(6), (5, 2, 4, 512), jnp.float32)
    ref = transformer_decode_beam(dec, feat, 9, 10, beam_size=2, num_heads=4)
    mega = transformer_decode_beam_megakernel(
        dec, feat, 9, 10, beam_size=2, num_heads=4, block_b=4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref.ids), np.asarray(mega.ids))
    np.testing.assert_allclose(
        np.asarray(ref.log_probs), np.asarray(mega.log_probs), rtol=1e-5, atol=1e-5
    )


def test_transformer_beam_megakernel_k5_length_norm():
    from latex_ocr_tpu.models.transformer import transformer_decode_beam
    from latex_ocr_tpu.ops.transformer_kernel import (
        transformer_decode_beam_megakernel,
    )

    cfg = _cfg(num_layers=1, num_heads=2)
    dec = init_transformer_decoder_params(jax.random.PRNGKey(7), cfg, n_tok=9, n_channels=512)
    feat = jax.random.normal(jax.random.PRNGKey(8), (3, 1, 5, 512), jnp.float32)
    ref = transformer_decode_beam(
        dec, feat, 7, 8, beam_size=5, num_heads=2, length_norm_alpha=0.6
    )
    mega = transformer_decode_beam_megakernel(
        dec, feat, 7, 8, beam_size=5, num_heads=2, length_norm_alpha=0.6,
        block_b=2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref.ids), np.asarray(mega.ids))
    np.testing.assert_allclose(
        np.asarray(ref.log_probs), np.asarray(mega.log_probs), rtol=1e-5, atol=1e-5
    )


def test_transformer_beam_megakernel_stochastic_div_falls_back():
    """div_prob < 1 uses the XLA loop's random stream — the wrapper must
    return the XLA result exactly (it IS the XLA path)."""
    from latex_ocr_tpu.models.transformer import transformer_decode_beam
    from latex_ocr_tpu.ops.transformer_kernel import (
        transformer_decode_beam_megakernel,
    )

    cfg = _cfg(num_layers=1, num_heads=2)
    dec = init_transformer_decoder_params(jax.random.PRNGKey(9), cfg, n_tok=9, n_channels=512)
    feat = jax.random.normal(jax.random.PRNGKey(10), (2, 1, 5, 512), jnp.float32)
    ref = transformer_decode_beam(
        dec, feat, 6, 8, beam_size=2, num_heads=2, div_gamma=0.5, div_prob=0.5
    )
    mega = transformer_decode_beam_megakernel(
        dec, feat, 6, 8, beam_size=2, num_heads=2,
        div_gamma=0.5, div_prob=0.5, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref.ids), np.asarray(mega.ids))


def test_transformer_megakernel_bf16_falls_back_to_xla():
    """Packed decoder dtypes can't take the kernel's dynamic-row cache
    store (Mosaic: sublane offset of a (Bb, 1, D) bf16 store must be
    tile-aligned; the decode step t is runtime-dynamic). Found live by
    the r4 verify drive: train.py with a minimal training.json (no
    decoder_dtype pin -> bf16) crashed at compile. Both entries must
    short-circuit to the XLA loop BEFORE building any pallas call, so
    this runs on CPU with interpret=False."""
    from latex_ocr_tpu.models.transformer import transformer_decode_beam
    from latex_ocr_tpu.ops.transformer_kernel import (
        transformer_decode_beam_megakernel,
    )

    cfg = _cfg(num_layers=1, num_heads=2)
    dec = init_transformer_decoder_params(jax.random.PRNGKey(11), cfg, n_tok=9, n_channels=512)
    dec = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, dec
    )
    feat = jax.random.normal(jax.random.PRNGKey(12), (3, 1, 5, 512), jnp.bfloat16)

    ref = transformer_decode_greedy(dec, feat, 6, 8, num_heads=2)
    mega = transformer_decode_greedy_megakernel(
        dec, feat, 6, 8, num_heads=2, block_b=2, interpret=False
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(mega))

    bref = transformer_decode_beam(dec, feat, 6, 8, beam_size=2, num_heads=2)
    bmega = transformer_decode_beam_megakernel(
        dec, feat, 6, 8, beam_size=2, num_heads=2, block_b=2, interpret=False
    )
    np.testing.assert_array_equal(np.asarray(bref.ids), np.asarray(bmega.ids))


def test_auto_block_b_budget_arithmetic():
    """Pin the beam/greedy VMEM budget picker (flagship 2L/256d, V=503,
    F=1024, f32, T=151→Tc=152). The K≥4 hard cap is gone (the chunked
    reorder removed the register-spill failure); block size is
    budget-driven: beam 88 MB, greedy 72 MB. Guards the arithmetic the
    r4 chip A/B validated (bb=16 compiles and runs at K=5/R=184)."""
    from latex_ocr_tpu.ops.transformer_kernel import _auto_block_b, _round_tile

    Tc = _round_tile(151, 4)
    kw = dict(V=503, F=1024)
    # greedy (K=1): 72 MB budget
    assert _auto_block_b(2, Tc, _round_tile(184, 4), 256, 4, K=1, **kw) == 16
    # beam: 88 MB budget; K=5 fits bb=16 at R=184 but not at R=300
    assert _auto_block_b(2, Tc, _round_tile(184, 4), 256, 4, K=5, **kw) == 16
    assert _auto_block_b(2, Tc, _round_tile(300, 4), 256, 4, K=5, **kw) == 8
    assert _auto_block_b(2, Tc, _round_tile(300, 4), 256, 4, K=2, **kw) == 16
    # an oversized config returns 0 -> the caller takes the XLA fallback
    assert _auto_block_b(6, _round_tile(1000, 4), _round_tile(2000, 4),
                         512, 4, V=5000, F=2048, K=5) == 0


def test_cross_kv_bf16_kernel_matches_xla_greedy():
    """decode_cross_kv_dtype=bf16: kernel and XLA paths apply the SAME
    quantization (cast once after projection, upcast at use), so token
    parity must hold between them at equal settings."""
    cfg = _cfg()
    dec = init_transformer_decoder_params(jax.random.PRNGKey(11), cfg,
                                          n_tok=11, n_channels=512)
    feat = jax.random.normal(jax.random.PRNGKey(12), (5, 2, 4, 512), jnp.float32)
    ref = transformer_decode_greedy(dec, feat, 9, 10, num_heads=4,
                                    cross_kv_dtype=jnp.bfloat16)
    mega = transformer_decode_greedy_megakernel(
        dec, feat, 9, 10, num_heads=4, block_b=4, interpret=True,
        cross_kv_dtype=jnp.bfloat16,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(mega))


def test_cross_kv_bf16_kernel_matches_xla_beam():
    from latex_ocr_tpu.models.transformer import transformer_decode_beam
    from latex_ocr_tpu.ops.transformer_kernel import (
        transformer_decode_beam_megakernel,
    )

    cfg = _cfg()
    dec = init_transformer_decoder_params(jax.random.PRNGKey(13), cfg,
                                          n_tok=11, n_channels=512)
    feat = jax.random.normal(jax.random.PRNGKey(14), (4, 2, 4, 512), jnp.float32)
    ref = transformer_decode_beam(dec, feat, 9, 10, beam_size=2, num_heads=4,
                                  cross_kv_dtype=jnp.bfloat16)
    mega = transformer_decode_beam_megakernel(
        dec, feat, 9, 10, beam_size=2, num_heads=4, block_b=4, interpret=True,
        cross_kv_dtype=jnp.bfloat16,
    )
    np.testing.assert_array_equal(np.asarray(ref.ids), np.asarray(mega.ids))
    np.testing.assert_allclose(
        np.asarray(ref.log_probs), np.asarray(mega.log_probs), rtol=1e-5, atol=1e-5
    )


def test_cross_kv_bf16_lifts_beam_block():
    """The measured point of the knob: the K=5/R=300 flagship shape's
    VMEM data budget caps bb at 8 with f32 cross blocks and at 16 with
    bf16 ones (ROADMAP §4 / r4 VERDICT weak #8)."""
    from latex_ocr_tpu.ops.transformer_kernel import _auto_block_b, _round_tile

    Tc = _round_tile(151, 4)
    assert _auto_block_b(2, Tc, _round_tile(300, 4), 256, 4,
                         V=512, F=1024, K=5) == 8
    assert _auto_block_b(2, Tc, _round_tile(300, 2), 256, 4,
                         V=512, F=1024, K=5, cross_itemsize=2) == 16


def test_cross_kv_config_plumbing():
    """decode_cross_kv_dtype flows from config into Img2SeqModel and its
    decode output still matches the default-config decode on an easy
    (tie-free) input."""
    from latex_ocr_tpu.models.img2seq import Img2SeqModel

    class _V:
        n_tok, id_end, id_pad = 11, 10, 9

        @staticmethod
        def form_prepro(x):
            return x

    base = {"attn_cell_config": {"cell_type": "lstm", "num_units": 16,
                                 "dim_e": 8, "dim_o": 16, "dim_embeddings": 8},
            "decoder_arch": "transformer",
            "transformer_config": {"num_layers": 2, "num_heads": 4,
                                   "dim_model": 32, "dim_ff": 64},
            "max_length_formula": 8, "use_decoder_megakernel": False,
            "use_pallas_attention": False}
    m_f32 = Img2SeqModel(Config(base), _V)
    m_bf16 = Img2SeqModel(Config({**base, "decode_cross_kv_dtype": "bfloat16"}), _V)
    assert m_f32.cross_kv_dtype is None
    assert m_bf16.cross_kv_dtype == jnp.bfloat16
    # the knob participates in the jit/program cache key
    assert m_f32._jit_key() != m_bf16._jit_key()
    params = m_f32.init_params(jax.random.PRNGKey(0))
    imgs = (np.random.default_rng(0).integers(0, 255, (2, 24, 24, 1))
            .astype(np.uint8))
    ids_a = np.asarray(m_f32._greedy(params["decoder"], _feat(m_f32, params, imgs)))
    ids_b = np.asarray(m_bf16._greedy(params["decoder"], _feat(m_bf16, params, imgs)))
    # the knob must actually reach the decode: with the feat quantized to
    # bf16 cross-KV the step scores differ in the low mantissa bits, but a
    # random-weight decode has no meaningful margins — so assert the knob
    # reproduces the DIRECT functional call with the same dtype instead
    from latex_ocr_tpu.models.transformer import transformer_decode_greedy

    ids_direct = np.asarray(transformer_decode_greedy(
        params["decoder"], _feat(m_bf16, params, imgs),
        m_bf16.max_length, m_bf16.id_end, num_heads=m_bf16.num_heads,
        cross_kv_dtype=jnp.bfloat16,
    ))
    np.testing.assert_array_equal(ids_b, ids_direct)
    assert ids_a.shape == ids_b.shape


def _feat(model, params, imgs):
    from latex_ocr_tpu.models.encoder import encode

    feat = encode(params["encoder"], jnp.asarray(imgs), model.config,
                  model.compute_dtype)
    return feat.astype(model.decoder_dtype)
