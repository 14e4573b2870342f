"""Img2Seq model facade: params, jitted train/eval/decode programs.

The reference builds one TF1 graph with shared train/test branches
(model/img2seq.py:48-123); here the same weights flow through three jitted
pure functions instead:

    train_step(params, opt_state, batch, lr, rng) -> params', opt_state', metrics
    eval_step(params, batch)                      -> ce_words, n_words
    decode(params, images)                        -> ids [greedy or beam]

Static-shape contract: jax.jit specializes per (image bucket, length
bucket) pair — the data pipeline snaps batches to a bounded set of
shapes, so the compile cache stays small and every program is reused
across the run.

Optimizers mirror the reference factory (adam/adagrad/sgd/rmsprop +
optional clip-by-global-norm, img2seq.py:85-123) via optax, with the
learning rate passed as a traced scalar each step so the host-side
LRSchedule drives it without recompilation.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .decoder import init_decoder_params, masked_ce_loss, teacher_forcing_logits
from .decoding import decode_beam, decode_greedy, decode_greedy_with_attention
from .encoder import encode, init_encoder_params


def make_optimizer(
    lr_method: str = "adam", clip: float = -1.0, update_clip: float = -1.0
) -> optax.GradientTransformation:
    """lr-less optimizer core; the per-step lr is multiplied in at update.

    ``clip`` bounds the global gradient norm BEFORE the core (the
    reference's clip, model/img2seq.py optimizer factory). ``update_clip``
    bounds each element of the post-core update — for Adam that is
    m̂/(√v̂+ε) itself, the quantity a pre-core norm clip provably cannot
    bound (design.md §16.8: once v̂ adapts, a uniformly rescaled gradient
    leaves g/√v̂ unchanged). With ``update_clip: c`` the worst-case
    per-element step is exactly lr·c, so a stale second moment meeting a
    hard batch can no longer rewrite the weights in one step.
    """
    m = lr_method.lower()
    if m == "adam":
        core = optax.scale_by_adam()
    elif m == "adamax":
        core = optax.scale_by_adamax()
    elif m == "adagrad":
        core = optax.scale_by_rss(initial_accumulator_value=0.1)
    elif m == "sgd":
        core = optax.identity()
    elif m == "rmsprop":
        core = optax.scale_by_rms(decay=0.9)
    else:
        raise NotImplementedError(f"Unknown lr_method {lr_method}")
    steps = []
    if clip is not None and clip > 0:
        steps.append(optax.clip_by_global_norm(clip))
    steps.append(core)
    if update_clip is not None and update_clip > 0:
        steps.append(optax.clip(update_clip))
    steps.append(optax.scale(-1.0))
    return optax.chain(*steps)


class Img2SeqModel:
    """Functional Img2Seq model with a jit-cached program per batch shape."""

    def __init__(self, config, vocab, compute_dtype=jnp.float32, decoder_dtype=None,
                 mesh=None):
        self.config = config
        self.vocab = vocab
        self.compute_dtype = compute_dtype
        # Split-precision policy: the conv encoder runs fine in bf16 on the
        # MXU, but the decoder's recurrence + attention-score path is where
        # reduced precision can stall the attention-grounding phase of
        # training; it can be pinned to fp32 independently.
        if decoder_dtype is None:
            name = getattr(config, "decoder_dtype", None)
            if name is not None:
                decoder_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]
            else:
                decoder_dtype = compute_dtype
        self.decoder_dtype = decoder_dtype
        self.n_tok = vocab.n_tok
        self.id_end = vocab.id_end
        # decoder family: the reference's Bahdanau-attention LSTM (default)
        # or the beyond-reference MXU-heavy transformer (models/transformer.py)
        self.decoder_arch = getattr(config, "decoder_arch", "attn_lstm")
        if self.decoder_arch not in ("attn_lstm", "transformer"):
            raise NotImplementedError(f"Unknown decoder_arch {self.decoder_arch}")
        self.cell_type = "lstm"
        if self.decoder_arch == "attn_lstm":
            self.cell_type = (getattr(config, "attn_cell_config", None) or {}).get(
                "cell_type", "lstm"
            )
        if self.decoder_arch == "transformer":
            from .transformer import transformer_cfg

            self.num_heads = transformer_cfg(config)["num_heads"]
        self.decoding = getattr(config, "decoding", "greedy")
        self.beam_size = getattr(config, "beam_size", 5)
        self.div_gamma = getattr(config, "div_gamma", 1.0)
        self.div_prob = getattr(config, "div_prob", 0.0)
        self.length_norm_alpha = float(getattr(config, "length_norm_alpha", 0.0) or 0.0)
        # GNMT coverage penalty re-rank (models/decoding.py
        # coverage_log_penalty); attn_lstm beam only — routes around the
        # beam megakernel (needs per-step attention weights in the carry)
        self.coverage_beta = float(getattr(config, "coverage_beta", 0.0) or 0.0)
        self.max_length = getattr(config, "max_length_formula", 150) + 1
        # decode_cross_kv_dtype: storage dtype for the precomputed
        # cross-attention K/V at decode time (transformer family only).
        # "bfloat16" halves the per-row VMEM the beam megakernel budgets
        # for the cross blocks — at K=5/R=300 that lifts the batch block
        # from 8 to 16 rows (ops/transformer_kernel.py _auto_block_b).
        # Applied identically on the kernel and XLA paths (quantize once,
        # upcast at use) so kernel/XLA token parity is preserved.
        ckv_dt = getattr(config, "decode_cross_kv_dtype", None)
        if isinstance(ckv_dt, str):
            try:
                ckv_dt = jnp.dtype(ckv_dt)
            except TypeError as e:
                raise ValueError(
                    f"decode_cross_kv_dtype {ckv_dt!r} is not a dtype name "
                    f"(use e.g. \"bfloat16\" or \"float32\")"
                ) from e
        self.cross_kv_dtype = ckv_dt
        self._tx: Optional[optax.GradientTransformation] = None
        pallas = getattr(config, "use_pallas_attention", "auto")
        if pallas == "auto":
            import jax as _jax

            pallas = _jax.default_backend() not in ("cpu", "gpu")
        self.use_pallas = bool(pallas)
        # Greedy-decode megakernel (ops/decoder_kernel.py): the whole T-step
        # loop in one Pallas kernel, image tensors resident in VMEM. ~46x
        # faster than the XLA while_loop decode on v5e; TPU-only (the
        # interpret path exists but is far slower than XLA on CPU).
        mega = getattr(config, "use_decoder_megakernel", "auto")
        if mega == "auto":
            import jax as _jax

            mega = _jax.default_backend() not in ("cpu", "gpu")
        self.use_megakernel = bool(mega)
        # Training megakernel (ops/train_kernel.py): teacher-forced scan +
        # hand-derived backward as one Pallas pair, image tensors resident
        # in VMEM across all T steps. Opt-in (default OFF): measured on
        # v5e the decoder scan is VPU-roofline bound (the Bahdanau tanh
        # over (B,R,E)), and XLA already hides its HBM re-reads behind
        # that compute, so removing the traffic does not pay — see
        # docs/design.md §11. Requires dropout off (keep_prob == 1.0, a
        # static jit arg) and no attention output.
        self.use_train_megakernel = bool(
            getattr(config, "use_train_megakernel", False)
        )
        if self.cell_type == "gru":
            # the decode megakernels dispatch on the cell family
            # (ops/decoder_kernel.py:_cell_update) and cover GRU; the
            # training megakernel's hand-derived VJP is LSTM-only, so
            # GRU training runs the XLA scan path
            self.use_train_megakernel = False
        # Sequence parallelism over image regions (SURVEY §2.3 SP row):
        # `region_parallel: true` + a mesh carrying a "region" axis routes
        # every Bahdanau context (teacher forcing, greedy AND beam decode)
        # through the shard_map online-softmax attention
        # (parallel/region_attention.py) — R shards across chips, the
        # softmax reassembles via pmax/psum over ICI, and a 2-D
        # ("data", "region") mesh composes it with DP batch sharding.
        # Meant for the largest buckets (R ~ 10^4) on small-HBM chips.
        self.region_parallel = bool(getattr(config, "region_parallel", False))
        self.mesh = mesh
        self._attn_fn = None
        self._cross_mha = None
        if self.region_parallel:
            if mesh is None or "region" not in mesh.axis_names:
                raise ValueError(
                    "region_parallel: true requires Img2SeqModel(..., mesh=) "
                    "with a 'region' axis, e.g. "
                    "Mesh(devices.reshape(d, r), ('data', 'region'))"
                )
            batch_axis = "data" if "data" in mesh.axis_names else None
            if self.decoder_arch == "transformer":
                # transformer family: the training memory hot spot is the
                # (B, H, T, R) cross-attention score tensor — shard the
                # region axis of every layer's cross-attention
                # (parallel/region_attention.py:make_region_cross_mha).
                # Decode stays on the replicated path: per-step cross
                # scores are (B, H, 1, R) — tiny — and the per-chip cross-KV
                # cache already divides by the data axis under DP.
                if float(getattr(config, "alpha_c", 0.0) or 0.0) > 0.0:
                    raise ValueError(
                        "alpha_c needs full-R attention weights, which the "
                        "region-sharded cross-attention never materializes; "
                        "disable region_parallel for alpha_c fine-tunes"
                    )
                from ..parallel.region_attention import make_region_cross_mha

                self._cross_mha = make_region_cross_mha(mesh, batch_axis=batch_axis)
            else:
                from ..parallel.region_attention import make_region_attn_fn

                self._attn_fn = make_region_attn_fn(mesh, batch_axis=batch_axis)
            # the fused single-device attention kernels assume local full-R
            self.use_pallas = False
            self.use_megakernel = False
            self.use_train_megakernel = False
        self._opt_spec = None
        self._jit_key_cache = None

    # ----------------------------------------------------- program sharing
    def _jit_key(self):
        """Value key for jit's static ``self`` argument.

        The traced programs depend only on the (JSON-able) config, the
        vocab's structural ids, the dtype policy, and the optimizer spec —
        so two instances built from equal configs hash equal and share
        every compiled program instead of recompiling per instance (the
        reference pays one TF graph per process; identity keying made us
        pay one XLA compile per *instance*). Computed lazily once: mutating
        the config after the first traced call was already unsupported
        under identity keying (the stale program would be reused) and
        remains so.
        """
        if self._jit_key_cache is None:
            import json as _json

            self._jit_key_cache = (
                _json.dumps(self.config.to_dict(), sort_keys=True, default=str),
                self.n_tok,
                self.id_end,
                str(self.compute_dtype),
                str(self.decoder_dtype),
                self.use_pallas,
                self.use_megakernel,
                self.use_train_megakernel,
                self.mesh,  # region_parallel programs close over the mesh
            )
        return self._jit_key_cache + (self._opt_spec,)

    def __hash__(self):
        return hash(self._jit_key())

    def __eq__(self, other):
        return (
            isinstance(other, Img2SeqModel) and self._jit_key() == other._jit_key()
        )

    # ------------------------------------------------------------- params
    def init_params(self, rng: jax.Array) -> Dict:
        enc_rng, dec_rng = jax.random.split(rng)
        if self.decoder_arch == "transformer":
            from .transformer import init_transformer_decoder_params

            decoder = init_transformer_decoder_params(dec_rng, self.config, self.n_tok, 512)
        else:
            decoder = init_decoder_params(dec_rng, self.config, self.n_tok, 512)
        return {
            "encoder": init_encoder_params(enc_rng, self.config),
            "decoder": decoder,
        }

    def init_optimizer(self, params: Dict, lr_method: str = "adam", clip: float = -1.0,
                       update_clip: float = -1.0):
        self._tx = make_optimizer(lr_method, clip, update_clip)
        # part of the jit key: train_step traces through self._tx, so
        # program sharing must distinguish (method, clip, update_clip)
        self._opt_spec = (str(lr_method), float(clip), float(update_clip))
        return self._tx.init(params)

    # ------------------------------------------------------------ forward
    def _tf_logits(self, dec_params, feat, formula, dropout_rng=None,
                   keep_prob: float = 1.0, return_attention: bool = False):
        """Teacher-forced logits for the configured decoder family."""
        if self.decoder_arch == "transformer":
            from .transformer import transformer_teacher_forcing_logits

            return transformer_teacher_forcing_logits(
                dec_params, feat, formula, num_heads=self.num_heads,
                dropout_rng=dropout_rng, keep_prob=keep_prob,
                return_attention=return_attention,
                cross_mha=self._cross_mha,
            )
        return teacher_forcing_logits(
            dec_params, feat, formula, dropout_rng=dropout_rng,
            keep_prob=keep_prob, return_attention=return_attention,
            attn_fn=self._attn_fn,
        )

    def _loss_fn(self, params, batch, dropout_rng, keep_prob):
        feat = encode(params["encoder"], batch["image"], self.config, self.compute_dtype)
        feat = feat.astype(self.decoder_dtype)
        alpha_c = float(getattr(self.config, "alpha_c", 0.0) or 0.0)
        if alpha_c > 0.0:
            logits, attn = self._tf_logits(
                params["decoder"], feat, batch["formula"],
                dropout_rng=dropout_rng, keep_prob=keep_prob,
                return_attention=True,
            )
        else:
            logits = None
            if (
                self.decoder_arch == "attn_lstm"
                and self.use_train_megakernel
                and (dropout_rng is None or keep_prob >= 1.0)
            ):
                from ..ops.train_kernel import teacher_forcing_fused

                # returns None when the bucket exceeds the VMEM budget
                logits = teacher_forcing_fused(params["decoder"], feat, batch["formula"])
            if logits is None:
                logits = self._tf_logits(
                    params["decoder"], feat, batch["formula"],
                    dropout_rng=dropout_rng, keep_prob=keep_prob,
                )
        # label smoothing applies to the training loss only; eval_step /
        # eval_decode_step keep true CE so perplexity stays comparable
        smooth = 0.0 if dropout_rng is None else float(
            getattr(self.config, "label_smoothing", 0.0) or 0.0
        )
        loss, ce_words, n_words = masked_ce_loss(
            logits, batch["formula"], batch["length"], label_smoothing=smooth
        )
        if alpha_c > 0.0:
            # doubly-stochastic attention regularizer (Show-Attend-Tell;
            # torch reference getLoss, img2seq_torch.py:136-172):
            # encourage each region's attention to sum to ~1 over time
            mask = (
                jnp.arange(batch["formula"].shape[1])[None, :, None]
                < batch["length"][:, None, None]
            )
            alpha_sum = jnp.sum(attn * mask, axis=1)  # (B, R)
            loss = loss + alpha_c * jnp.mean((1.0 - alpha_sum) ** 2)
        return loss, (ce_words, n_words)

    @functools.partial(jax.jit, static_argnums=(0, 6), donate_argnums=(1, 2))
    def train_step(
        self,
        params: Dict,
        opt_state: Any,
        batch: Dict[str, jnp.ndarray],
        lr: jnp.ndarray,
        dropout_rng: jax.Array,
        keep_prob: float = 1.0,
    ) -> Tuple[Dict, Any, Dict[str, jnp.ndarray]]:
        """One fused fwd+bwd+update program."""
        (loss, (ce_words, n_words)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True
        )(params, batch, dropout_rng, keep_prob)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "ce_words": ce_words, "n_words": n_words}
        return params, opt_state, metrics

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_step(self, params: Dict, batch: Dict[str, jnp.ndarray]):
        """CE counters for perplexity on a labelled batch (no dropout)."""
        loss, (ce_words, n_words) = self._loss_fn(params, batch, None, 1.0)
        return {"loss": loss, "ce_words": ce_words, "n_words": n_words}

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_decode_step(self, params: Dict, batch: Dict[str, jnp.ndarray]):
        """CE counters + decoded ids in ONE program (the reference fetches
        ce_words/n_words/pred ids in a single sess.run, img2seq.py:236)."""
        feat = encode(params["encoder"], batch["image"], self.config, self.compute_dtype)
        feat = feat.astype(self.decoder_dtype)
        logits = self._tf_logits(params["decoder"], feat, batch["formula"])
        loss, ce_words, n_words = masked_ce_loss(logits, batch["formula"], batch["length"])
        if self.decoding == "greedy":
            ids = self._greedy(params["decoder"], feat)[:, None, :]
        else:
            ids = self._beam(params["decoder"], feat).ids
        return {"loss": loss, "ce_words": ce_words, "n_words": n_words}, ids

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_decode_step_scored(self, params: Dict, batch: Dict[str, jnp.ndarray]):
        """`eval_decode_step` plus per-hypothesis confidences (B, n_hyps).

        Beam scores are free (the search already ranks with them); the
        greedy path pays one teacher-forced rescoring forward — same
        contract as `decode_step_scored`."""
        feat = encode(params["encoder"], batch["image"], self.config, self.compute_dtype)
        feat = feat.astype(self.decoder_dtype)
        logits = self._tf_logits(params["decoder"], feat, batch["formula"])
        loss, ce_words, n_words = masked_ce_loss(logits, batch["formula"], batch["length"])
        metrics = {"loss": loss, "ce_words": ce_words, "n_words": n_words}
        if self.decoding == "greedy":
            ids = self._greedy(params["decoder"], feat)  # (B, T)
            return (metrics, ids[:, None, :],
                    self._greedy_scores(params, feat, ids)[:, None])
        out = self._beam(params["decoder"], feat)
        return metrics, out.ids, out.log_probs

    def _greedy(self, dec_params: Dict, feat: jnp.ndarray) -> jnp.ndarray:
        """Greedy ids (B, T): megakernel on TPU, XLA while_loop elsewhere."""
        if self.decoder_arch == "transformer":
            if self.use_megakernel:
                from ..ops.transformer_kernel import (
                    transformer_decode_greedy_megakernel,
                )

                # falls back to the XLA loop itself when the KV caches
                # exceed the VMEM budget (huge-R buckets)
                return transformer_decode_greedy_megakernel(
                    dec_params, feat, self.max_length, self.id_end,
                    num_heads=self.num_heads,
                    cross_kv_dtype=self.cross_kv_dtype,
                )
            from .transformer import transformer_decode_greedy

            return transformer_decode_greedy(
                dec_params, feat, self.max_length, self.id_end,
                num_heads=self.num_heads,
                cross_kv_dtype=self.cross_kv_dtype,
            )
        if self.use_megakernel:
            from ..ops.decoder_kernel import decode_greedy_megakernel

            return decode_greedy_megakernel(
                dec_params, feat, self.max_length, self.id_end,
                fallback_use_pallas=self.use_pallas,
            )
        return decode_greedy(
            dec_params, feat, self.max_length, self.id_end,
            use_pallas=self.use_pallas, attn_fn=self._attn_fn,
        )

    def _beam(self, dec_params: Dict, feat: jnp.ndarray):
        """Beam search: megakernel on TPU (73x over the XLA loop at K=2),
        XLA while_loop elsewhere. The megakernel handles the deterministic
        diversity penalty in-kernel and falls back to the XLA loop itself
        for the stochastic (div_prob < 1) variant."""
        if self.decoder_arch == "transformer":
            from .transformer import transformer_decode_beam

            if self.coverage_beta > 0.0:
                raise ValueError(
                    "coverage_beta is an attn_lstm-family beam feature: the "
                    "transformer's cross-attention is per-layer/per-head and "
                    "has no single coverage distribution to accumulate"
                )
            if self.use_megakernel:
                from ..ops.transformer_kernel import (
                    transformer_decode_beam_megakernel,
                )

                # falls back to the XLA loop itself for the stochastic
                # diversity penalty or VMEM-oversized (K-scaled) configs
                return transformer_decode_beam_megakernel(
                    dec_params, feat, self.max_length, self.id_end,
                    self.beam_size, length_norm_alpha=self.length_norm_alpha,
                    num_heads=self.num_heads,
                    div_gamma=self.div_gamma, div_prob=self.div_prob,
                    cross_kv_dtype=self.cross_kv_dtype,
                )
            return transformer_decode_beam(
                dec_params, feat, self.max_length, self.id_end,
                self.beam_size, div_gamma=self.div_gamma, div_prob=self.div_prob,
                length_norm_alpha=self.length_norm_alpha,
                num_heads=self.num_heads,
                cross_kv_dtype=self.cross_kv_dtype,
            )
        if self.use_megakernel and self.coverage_beta == 0.0:
            from ..ops.decoder_kernel import decode_beam_megakernel

            return decode_beam_megakernel(
                dec_params, feat, self.max_length, self.id_end,
                self.beam_size, length_norm_alpha=self.length_norm_alpha,
                fallback_use_pallas=self.use_pallas,
                div_gamma=self.div_gamma, div_prob=self.div_prob,
            )
        return decode_beam(
            dec_params, feat, self.max_length, self.id_end,
            self.beam_size, self.div_gamma, self.div_prob,
            use_pallas=self.use_pallas,
            length_norm_alpha=self.length_norm_alpha,
            coverage_beta=self.coverage_beta,
            attn_fn=self._attn_fn,
        )

    # ------------------------------------------------------------- decode
    @functools.partial(jax.jit, static_argnums=(0,))
    def decode_step(self, params: Dict, images: jnp.ndarray) -> jnp.ndarray:
        """Decode a uint8 image batch to ids (B, n_hyps, T), best first."""
        feat = encode(params["encoder"], images, self.config, self.compute_dtype)
        feat = feat.astype(self.decoder_dtype)
        if self.decoding == "greedy":
            return self._greedy(params["decoder"], feat)[:, None, :]
        return self._beam(params["decoder"], feat).ids

    @functools.partial(jax.jit, static_argnums=(0,))
    def decode_step_scored(self, params: Dict, images: jnp.ndarray):
        """Decode with per-hypothesis confidence scores.

        Returns (ids (B, n_hyps, T), scores (B, n_hyps)) — scores are
        total sequence log-probabilities up to and including END. Under
        beam search they are the beam's final hypothesis scores exactly
        as ranked (with `length_norm_alpha`/`coverage_beta` configured
        these are the re-ranked scores, comparable within an image's
        beam but not across lengths as raw log-probs). Under greedy the
        decoded sequence is re-scored by one teacher-forced pass — the
        exact log-prob the model assigns its own output (the decode
        loops and megakernels track only argmax ids, so scoring costs
        one extra forward rather than threading accumulators through
        every kernel)."""
        feat = encode(params["encoder"], images, self.config, self.compute_dtype)
        feat = feat.astype(self.decoder_dtype)
        if self.decoding == "greedy":
            ids = self._greedy(params["decoder"], feat)  # (B, T)
            return ids[:, None, :], self._greedy_scores(params, feat, ids)[:, None]
        out = self._beam(params["decoder"], feat)
        return out.ids, out.log_probs

    def _greedy_scores(self, params: Dict, feat: jnp.ndarray,
                       ids: jnp.ndarray) -> jnp.ndarray:
        """Sequence log-prob (B,) of greedy ids via one teacher-forced
        rescoring pass — shared by decode_step_scored and
        eval_decode_step_scored so eval and serving confidences cannot
        drift."""
        logits = self._tf_logits(params["decoder"], feat, ids)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(logp, ids[..., None], axis=-1)[..., 0]
        is_end = (ids == self.id_end).astype(jnp.int32)
        # count positions through the FIRST END (inclusive); later
        # positions are decoder filler and must not affect the score
        ended_before = jnp.cumsum(is_end, axis=1) - is_end
        mask = (ended_before == 0).astype(jnp.float32)
        return jnp.sum(tok_lp * mask, axis=1)

    @functools.partial(jax.jit, static_argnums=(0,))
    def decode_with_attention(self, params: Dict, images: jnp.ndarray):
        """Greedy decode returning (ids (B, T), attention (B, T, R))."""
        feat = encode(params["encoder"], images, self.config, self.compute_dtype)
        feat = feat.astype(self.decoder_dtype)
        if self.decoder_arch == "transformer":
            from .transformer import transformer_decode_greedy_with_attention

            return transformer_decode_greedy_with_attention(
                params["decoder"], feat, self.max_length, self.id_end,
                num_heads=self.num_heads,
                cross_kv_dtype=self.cross_kv_dtype,
            )
        return decode_greedy_with_attention(
            params["decoder"], feat, self.max_length, self.id_end,
            attn_fn=self._attn_fn,
        )

    # --------------------------------------------------------- host utils
    def predict_batch(self, params: Dict, images, with_scores: bool = False):
        """Decode a list of raw (H, W, 1) uint8 images.

        Returns hyps[rank][i] = LaTeX string — the reference's
        predict_batch contract (img2seq.py:256-276). With
        ``with_scores=True`` returns (hyps, scores) where
        scores[rank][i] is the hypothesis confidence
        (``decode_step_scored``: sequence log-prob; beam re-rank score
        when length-norm/coverage re-ranking is configured).
        """
        import numpy as np

        from ..data.images import get_max_shape
        from ..data.pipeline import snap_image_shape

        H, W = snap_image_shape(get_max_shape(images)[:2], None)
        batch = np.full((len(images), H, W, 1), 255, np.uint8)
        for i, img in enumerate(images):
            batch[i, : img.shape[0], : img.shape[1]] = img
        if with_scores:
            ids, scores = self.decode_step_scored(params, jnp.asarray(batch))
            ids, scores = np.asarray(ids), np.asarray(scores)
        else:
            ids = np.asarray(self.decode_step(params, jnp.asarray(batch)))
        n_hyps = ids.shape[1]
        hyps = [
            [self.ids_to_latex(ids[b, k]) for b in range(len(images))]
            for k in range(n_hyps)
        ]
        if with_scores:
            return hyps, [
                [float(scores[b, k]) for b in range(len(images))]
                for k in range(n_hyps)
            ]
        return hyps

    def predict(self, params: Dict, img, with_scores: bool = False):
        """Decode one image; returns [best hyp, 2nd hyp, ...] (or
        (hyps, scores) lists with ``with_scores=True``)."""
        if with_scores:
            hyps, scores = self.predict_batch(params, [img], with_scores=True)
            return [h[0] for h in hyps], [s[0] for s in scores]
        hyps = self.predict_batch(params, [img])
        return [h[0] for h in hyps]

    def ids_to_latex(self, ids) -> str:
        """Detokenize one id sequence, truncating at END."""
        from ..data.vocab import truncate_end

        toks = truncate_end([int(i) for i in ids], self.id_end)
        return " ".join(self.vocab.id_to_tok[t] for t in toks)
