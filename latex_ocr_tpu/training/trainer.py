"""Training loop: epochs, per-batch LR schedule, eval-by-perplexity,
keep-best checkpointing, early stopping.

Reproduces the reference train lifecycle (model/base.py:95-138,
model/img2seq.py:144-196): per epoch, iterate minibatches updating the LR
schedule each batch; after each epoch decode the validation set, score it,
select on perplexity computed as ``-exp(Σce/Σn)`` (the reference's
sign-flipped internal score, img2seq.py:252 — reported positive), save a
checkpoint when the score improves, and stop early when the schedule says
so. All device work happens inside three jitted programs; the host only
moves python floats.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..data.pipeline import BatchPipeline
from ..evaluation.text import score_files, write_answers
from ..utils.general import Progbar, get_logger, init_dir
from ..utils.metrics import MetricsWriter, StepProfiler
from .checkpoint import CheckpointManager
import functools


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
def _ema_step(ema, params, decay: float):
    """One fused Polyak-average update: ema ← d·ema + (1−d)·params.

    The old EMA buffers are donated (updated in place); params leaves are
    cast onto the EMA dtype so a mixed-precision tree averages in the
    master dtype."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, params
    )


class Trainer:
    def __init__(
        self,
        model,
        config,
        dir_output: str,
        mesh=None,
    ):
        self.model = model
        self.config = config
        self.dir_output = dir_output
        init_dir(dir_output)
        self.logger = get_logger(os.path.join(dir_output, "model.log"))
        self.mesh = mesh
        self.sharding = None
        # lazily-built XLA-loop sibling used if the decode megakernel
        # fails to compile (see _decode_fallback_model); the fallback is
        # scoped to the batch shapes that actually failed
        self._xla_decode_model = None
        self._megakernel_failed_shapes: set = set()
        if mesh is not None:
            from ..parallel.mesh import batch_sharding

            self.sharding = batch_sharding(mesh)

    def _make_pipeline(self, dataset_or_pipeline, batch_size):
        """Accept a DataGenerator (wrapped per the slow path) or a
        ready-made pipeline object (e.g. CachedBatchPipeline) directly."""
        if hasattr(dataset_or_pipeline, "id_pad") or hasattr(
            dataset_or_pipeline, "cache"
        ):
            return dataset_or_pipeline  # already a pipeline
        model = self.model
        # `shuffle_data: true` turns on epoch-seeded reshuffling of the
        # bucketed listing (seeded by `seed`, so distinct seeds give
        # genuinely distinct SGD trajectories even with dropout off).
        # Opt-in: the curriculum A/B chains rely on bit-identical data
        # order across decoder families.
        shuffle_seed = (
            int(getattr(self.config, "seed", 0))
            if getattr(self.config, "shuffle_data", False)
            else None
        )
        return BatchPipeline(
            dataset_or_pipeline,
            batch_size,
            model.vocab.id_pad,
            model.vocab.id_end,
            buckets=getattr(self.config, "buckets", None),
            max_formula_len=model.max_length,
            sharding=self.sharding,
            shuffle_seed=shuffle_seed,
        )

    # ------------------------------------------------------------------ train
    def train(self, train_set, val_set, lr_schedule, init_params=None) -> Optional[float]:
        """``init_params``: warm-start weights transferred from ANOTHER run
        (curriculum / fine-tune scripts). Used only when this run has no
        checkpoint of its own — a restart of a warm-started run resumes
        its own checkpoint as usual. Unlike the old copy-the-ckpt-dir
        pattern, the donor's host state (best_score, epoch counter,
        LR-schedule counters) never leaks into the new run: a transferred
        best_score from an easier task can otherwise sit unbeatable and
        keep-best never saves (observed: the copied synthEZ perplexity
        1.000005 blocked every curriculum save)."""
        config = self.config
        model = self.model
        rng = jax.random.PRNGKey(int(getattr(config, "seed", 42)))
        rng, init_rng = jax.random.split(rng)

        # opt-in loss-excursion lr guard (utils/lr_schedule.py; design.md
        # §16.8): `spike_guard: true` for the cooldown defaults, or a dict
        # of overrides with an optional `mode` — "cooldown" (SpikeGuard,
        # measured and refuted; kept for A/B reproducibility) or
        # "converge_cap" (ConvergenceGate, the onset-side stabilizer).
        # Host-side on the sampled loss; the lr stays a dynamic scalar so
        # the guard never recompiles. Guard state is NOT checkpointed
        # (schema-stable): on resume it re-arms after the first converged
        # sample, which is the safe direction.
        guard_cfg = getattr(config, "spike_guard", None)
        spike_guard = None
        if guard_cfg:
            from ..utils.lr_schedule import ConvergenceGate, SpikeGuard

            opts = dict(guard_cfg) if isinstance(guard_cfg, dict) else {}
            mode = opts.pop("mode", "cooldown")
            guard_cls = {"cooldown": SpikeGuard,
                         "converge_cap": ConvergenceGate}[mode]
            spike_guard = guard_cls(**opts)

        params = model.init_params(init_rng)
        if init_params is not None:
            params = jax.tree.map(lambda a, b: b.astype(a.dtype), params, init_params)
            self.logger.info("Warm start: weights transferred, fresh schedule")
        opt_state = model.init_optimizer(
            params,
            getattr(config, "lr_method", "adam"),
            getattr(config, "clip", -1),
            getattr(config, "update_clip", -1),
        )
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            params = replicate(params, self.mesh)
            opt_state = replicate(opt_state, self.mesh)

        # `ema_decay: d` (0 = off) keeps a Polyak average of the weights on
        # device and makes IT the published model: eval decodes, keep-best
        # selection, the saved checkpoint's `params`, and _final_params are
        # all the averaged weights; raw weights ride along as `raw_params`
        # for exact resume. One fused multiply-add program per step.
        ema_decay = float(getattr(config, "ema_decay", 0.0) or 0.0)
        assert 0.0 <= ema_decay < 1.0, f"ema_decay out of range: {ema_decay}"
        ema_params = None
        if ema_decay > 0.0:
            # a real device copy: train_step donates its params buffers, so
            # aliasing them here would hand EMA a deleted array
            ema_params = jax.tree.map(jax.numpy.copy, params)

        ckpt = CheckpointManager(os.path.join(self.dir_output, "model_weights"))
        start_epoch = 0
        best_score = None
        global_step = 0
        # host-state template for exact resume: keep-best threshold, global
        # step (dropout streams + cosine decay), LRSchedule counters
        # (reference resumes only the epoch, base.py:40-47; we also restore
        # the score-decay/early-stop trajectory)
        extra_like = {
            "best_score": 0.0,
            "global_step": 0,
            "lr": 0.0,
            "score": 0.0,
            "n_no_improvement": 0,
        }
        try:
            # raw_like is always passed so an EMA-written checkpoint is
            # DETECTED even when this run has ema_decay off — the silent
            # published-weights + raw-trajectory-moments mismatch is worth
            # a visible warning (see below)
            restored = ckpt.restore(
                params, opt_state, extra_like, raw_like=params,
            )
        except ValueError as e:
            # orbax raises a deep shape-compat error when the run dir holds
            # a checkpoint for a DIFFERENT model (e.g. another vocab size) —
            # surface what actually happened and how to proceed
            raise ValueError(
                f"Auto-resume found an incompatible checkpoint under "
                f"{self.dir_output!r} (saved for a different model/vocab "
                f"shape). Clear that run dir or train into a fresh "
                f"--output. Original error: {e}"
            ) from e
        if restored is not None:
            saved_params, opt_state, extra, start_epoch, raw_params = restored
            if ema_decay > 0.0:
                # checkpoint `params` are the EMA (the published model);
                # training resumes from `raw_params` when present (a
                # checkpoint written before EMA was enabled has none —
                # then both start from the saved weights)
                ema_params = saved_params
                params = raw_params if raw_params is not None else jax.tree.map(
                    jax.numpy.copy, saved_params
                )
                if raw_params is None:
                    self.logger.warning(
                        "EMA resume from a checkpoint without raw_params "
                        "(written with ema_decay off): the averaged stream "
                        "restarts from the published weights — expect a "
                        "trajectory discontinuity"
                    )
            else:
                params = saved_params
                if raw_params is not None:
                    self.logger.warning(
                        "Resuming an EMA-written checkpoint with ema_decay "
                        "off: the saved raw trajectory is DISCARDED and "
                        "training continues from the published (averaged) "
                        "weights paired with the raw trajectory's optimizer "
                        "moments — expect a trajectory discontinuity"
                    )
            start_epoch += 1
            if extra:
                best_score = float(extra["best_score"])
                global_step = int(extra["global_step"])
                lr_schedule.load_state_dict(
                    {
                        "lr": float(extra["lr"]),
                        "score": float(extra["score"]),
                        "n_no_improvement": int(extra["n_no_improvement"]),
                    }
                )
            self.logger.info(f"Restored checkpoint; resuming at epoch {start_epoch}")

        # ---- step-granular save-latest stream (r4 VERDICT #5): crash
        # recovery at BATCH granularity. `save_every_steps: N` writes an
        # async checkpoint of the raw trajectory every N steps (plus one at
        # each epoch end) into model_weights_latest/, storing
        # (epoch, batch_index) so resume re-enters the same epoch at the
        # same batch with the deterministic epoch-seeded shuffle order —
        # the keep-best stream in model_weights/ keeps its published-model
        # semantics untouched. In the latest stream `params` is the RAW
        # trajectory and the optional `raw_params` slot carries the EMA
        # tree (only the trainer reads this stream).
        save_every = int(config.get("save_every_steps", 0) or 0)
        start_batch = 0
        latest_ckpt = None
        if save_every > 0:
            latest_ckpt = CheckpointManager(
                os.path.join(self.dir_output, "model_weights_latest")
            )
            latest_extra_like = {
                "epoch": 0, "batch_index": 0, "global_step": 0,
                "has_best": 0, "best_score": 0.0, "lr": 0.0,
                "has_score": 0, "score": 0.0, "score_mult": 1.0,
                "n_no_improvement": 0,
            }
            latest = latest_ckpt.restore(
                params, opt_state, latest_extra_like,
                raw_like=params if ema_decay > 0.0 else None,
            )
            if latest is not None:
                l_params, l_opt, l_extra, _, l_ema = latest
                if l_extra and int(l_extra["global_step"]) >= global_step:
                    params, opt_state = l_params, l_opt
                    if ema_decay > 0.0:
                        ema_params = (
                            l_ema if l_ema is not None
                            else jax.tree.map(jax.numpy.copy, params)
                        )
                    start_epoch = int(l_extra["epoch"])
                    start_batch = int(l_extra["batch_index"])
                    global_step = int(l_extra["global_step"])
                    if int(l_extra["has_best"]):
                        best_score = float(l_extra["best_score"])
                    lr_schedule.load_state_dict({
                        "lr": float(l_extra["lr"]),
                        "score": (float(l_extra["score"])
                                  if int(l_extra["has_score"]) else None),
                        "score_mult": float(l_extra.get("score_mult", 1.0)),
                        "n_no_improvement": int(l_extra["n_no_improvement"]),
                    })
                    self.logger.info(
                        f"Restored save-latest stream; resuming at epoch "
                        f"{start_epoch + 1}, batch {start_batch}, "
                        f"step {global_step}"
                    )

        def _latest_extra(epoch: int, batch_index: int):
            sd = lr_schedule.state_dict()
            return {
                "epoch": int(epoch), "batch_index": int(batch_index),
                "global_step": int(global_step),
                "has_best": int(best_score is not None),
                "best_score": float(best_score if best_score is not None else 0.0),
                "lr": float(sd["lr"]),
                "has_score": int(sd["score"] is not None),
                "score": float(sd["score"] if sd["score"] is not None else 0.0),
                "score_mult": float(sd["score_mult"]),
                "n_no_improvement": int(sd["n_no_improvement"]),
            }

        keep_prob = float(np.clip(getattr(config, "dropout", 1.0), 0.0, 1.0))
        if keep_prob == 0.0:
            keep_prob = 1.0  # guard nonsense configs (e.g. reference's 127)

        batch_size = config.batch_size
        train_pipeline = self._make_pipeline(train_set, batch_size)
        if hasattr(train_pipeline, "__len__"):
            n_batches = len(train_pipeline)
        else:
            n_batches = (len(train_set) + batch_size - 1) // batch_size
        if restored is not None and not extra:
            # pre-extra checkpoint: best estimate of the resume step
            global_step = start_epoch * n_batches
        metrics_writer = MetricsWriter(
            self.dir_output, tensorboard=bool(config.get("tensorboard", True))
        )
        profiler = StepProfiler.from_config(config, self.dir_output)

        for epoch in range(start_epoch, config.n_epochs):
            self.logger.info(f"Epoch {epoch + 1}/{config.n_epochs}")
            tic = time.time()
            prog = Progbar(n_batches)
            if hasattr(train_pipeline, "set_epoch"):
                train_pipeline.set_epoch(epoch)  # deterministic resume order

            n_images = 0
            batch_iter = iter(train_pipeline)
            skip = start_batch if epoch == start_epoch else 0
            if skip:
                # deterministic mid-epoch re-entry: same epoch seed, same
                # order; the first `skip` batches were already trained
                self.logger.info(f"- Mid-epoch resume: skipping {skip} batches")
                for _ in range(skip):
                    next(batch_iter, None)
            for i, batch in enumerate(batch_iter, start=skip):
                # a true monotone counter, NOT epoch*n_batches+i: pipelines
                # that split minibatches at image-shape boundaries yield
                # more batches than the estimate, and a derived step would
                # collide across epochs (reused dropout streams, cosine lr
                # jumping back at epoch boundaries)
                step = global_step
                if profiler is not None:
                    profiler.maybe_start(step)
                # rng keyed on the global step: exact on resume
                step_rng = jax.random.fold_in(rng, step)
                n_real = int(batch.pop("n_real"))
                lr_eff = lr_schedule.lr
                if spike_guard is not None:
                    lr_eff = spike_guard.apply(step, lr_eff)
                params, opt_state, metrics = model.train_step(
                    params, opt_state, batch, lr_eff, step_rng, keep_prob
                )
                if ema_params is not None:
                    ema_params = _ema_step(ema_params, params, ema_decay)
                n_images += n_real
                global_step += 1
                lr_schedule.update(batch_no=step)
                if (
                    latest_ckpt is not None
                    and global_step % save_every == 0
                ):
                    # async: trees are copied to host inside save_async, so
                    # the next step's buffer donation can't race the write
                    latest_ckpt.save_async(
                        global_step, params, opt_state,
                        raw_params=ema_params,
                        extra=_latest_extra(epoch, i + 1),
                    )
                if (i + 1) % 10 == 0 or i == 0:
                    loss = float(metrics["loss"])
                    if spike_guard is not None:
                        event = spike_guard.observe(step, loss)
                        if event:
                            self.logger.warning("%s", event)
                    prog.update(
                        i + 1,
                        [("loss", loss), ("perplexity", float(np.exp(min(20.0, loss)))),
                         ("lr", lr_eff)],
                    )
                    row = {"loss": loss, "lr": lr_eff, "keep_prob": keep_prob}
                    if spike_guard is not None:
                        row["spike_guard_triggers"] = spike_guard.n_triggers
                    metrics_writer.write(step, row, epoch=epoch)
                if profiler is not None:
                    profiler.maybe_stop(step)
            prog.update(n_batches, [])
            elapsed = time.time() - tic
            rate = n_images / max(1e-6, elapsed)
            if self.mesh is not None:
                n_chips = int(self.mesh.devices.size)
                self.logger.info(
                    f"- Training: {prog.info} ({rate:.1f} img/s = "
                    f"{rate / n_chips:.1f} img/s/chip over {n_chips} chips)"
                )
            else:
                self.logger.info(f"- Training: {prog.info} ({rate:.1f} img/s)")

            # ---- evaluation on val: decode + metrics, select on perplexity.
            # eval_every > 1 skips the (expensive) full-val decode on
            # intermediate epochs — keep-best/LR-score/early-stop all move
            # only on eval epochs; the final epoch always evaluates.
            eval_every = int(config.get("eval_every", 1))
            if (epoch + 1) % eval_every != 0 and epoch != config.n_epochs - 1:
                if (
                    latest_ckpt is not None
                    and latest_ckpt.latest_epoch() != global_step
                ):
                    latest_ckpt.save_async(
                        global_step, params, opt_state,
                        raw_params=ema_params,
                        extra=_latest_extra(epoch + 1, 0),
                    )
                self.logger.info(
                    f"- Elapsed: {elapsed:.2f}s (eval skipped, every {eval_every})"
                )
                continue
            eval_params = ema_params if ema_params is not None else params
            scores = self.evaluate(
                eval_params, val_set, os.path.join(self.dir_output, "formulas_val/")
            )
            score = scores["perplexity_score"]
            lr_schedule.update(score=score)
            # written at the true global step (same counter as the train
            # scalars): pipelines can yield more batches than the
            # n_batches estimate, and a derived (epoch+1)*n_batches step
            # would jump backwards in TensorBoard
            metrics_writer.write(
                global_step,
                {k: v for k, v in scores.items()},
                epoch=epoch,
                split="val",
            )

            if best_score is None or score >= best_score:
                best_score = score
                self.logger.info(f"- New best score ({score:.4f})! Saving.")
                sd = lr_schedule.state_dict()
                ckpt.save(
                    epoch,
                    eval_params,
                    opt_state,
                    raw_params=params if ema_params is not None else None,
                    extra={
                        "best_score": float(best_score),
                        "global_step": int(global_step),
                        "lr": sd["lr"],
                        # _score is set just above via update(score=score)
                        "score": float(sd["score"]),
                        "n_no_improvement": sd["n_no_improvement"],
                    },
                )
            if (
                latest_ckpt is not None
                and latest_ckpt.latest_epoch() != global_step
            ):
                # epoch-boundary save carries the post-eval host state
                # (best_score, score-decay lr) so a crash in a long
                # non-improving stretch resumes at the NEXT epoch instead
                # of replaying everything since the last improvement —
                # the r4 VERDICT's exact complaint. Skipped when a
                # periodic save already used this step key (the content
                # difference is immaterial: both resume points replay the
                # same deterministic eval).
                latest_ckpt.save_async(
                    global_step, params, opt_state, raw_params=ema_params,
                    extra=_latest_extra(epoch + 1, 0),
                )
            if lr_schedule.stop_training:
                self.logger.info("- Early stopping.")
                break
            self.logger.info(
                f"- Elapsed: {elapsed:.2f}s, lr: {lr_schedule.lr:.5f}"
            )

        ckpt.close()
        if latest_ckpt is not None:
            latest_ckpt.close()
        metrics_writer.close()
        # the published weights: the EMA when averaging is on (what eval
        # selected and the checkpoint stores as `params`)
        self._final_params = ema_params if ema_params is not None else params
        return best_score

    # ------------------------------------------------------------------- eval
    def _decode_fallback_model(self, err: Exception):
        """Kernel-compile resource failures must not kill a multi-hour run.

        A decode megakernel that fits the VMEM *model* (_auto_block_b) can
        still lose to the real compiler — e.g. the r4 beam-5 sweep died on
        61 MB of Mosaic register-allocator spill slots the budget cannot
        see. When the first eval decode of a shape fails with a
        compile-resource error and the megakernel was on, rebuild the same
        model with ``use_decoder_megakernel: false`` (fresh _jit_key, so
        fresh programs) and continue on the XLA loop; anything else
        re-raises unchanged.
        """
        msg = str(err)
        resource = any(
            s in msg for s in ("vmem", "Mosaic", "RESOURCE_EXHAUSTED",
                               "out of memory",
                               # backend-capability failure: Pallas kernels
                               # refuse non-TPU backends outside interpret
                               # mode — same "megakernel can't run here"
                               # class as a VMEM overflow
                               "interpret mode")
        )
        if not (resource and self.model.use_megakernel):
            raise err
        if self._xla_decode_model is None:
            from ..models.img2seq import Img2SeqModel
            from ..utils import Config as _Config

            self.logger.warning(
                "decode megakernel failed to compile (%s...); falling back "
                "to the XLA decode loop for evaluation",
                msg.splitlines()[0][:120],
            )
            self._xla_decode_model = Img2SeqModel(
                _Config({**self.model.config.to_dict(),
                         "use_decoder_megakernel": False}),
                self.model.vocab,
                compute_dtype=self.model.compute_dtype,
                decoder_dtype=self.model.decoder_dtype,
                mesh=self.model.mesh,
            )
        return self._xla_decode_model

    def evaluate(self, params, test_set, dir_answers: str,
                 with_scores: bool = False) -> Dict[str, float]:
        """Decode a labelled set, write ref/hyp files, compute metrics.

        Returns text metrics plus ``perplexity`` (positive, reported) and
        ``perplexity_score`` (sign-flipped, for model selection). With
        ``with_scores=True`` the decode also collects per-hypothesis
        confidences, writes ``hyp_0.scores.txt`` next to the answers, and
        adds the selective-prediction report (EM at confidence coverage
        100/90/75/50% — evaluation.text.selective_report) to the result.
        """
        config = self.config
        batch_size = getattr(config, "batch_size", 20)
        pipeline = self._make_pipeline(test_set, batch_size)
        model = self.model

        n_hyps = model.beam_size if model.decoding == "beam_search" else 1
        refs: list = []
        hyps: list = [[] for _ in range(n_hyps)]
        confs: list = []
        ce_total = 0.0
        n_total = 0

        def decode(m, batch):
            if with_scores:
                return m.eval_decode_step_scored(params, batch)
            metrics, ids = m.eval_decode_step(params, batch)
            return metrics, ids, None

        for batch in pipeline:
            n_real = int(batch.pop("n_real"))
            # fallback is scoped to the SHAPES that failed (not global/
            # permanent): other buckets keep the megakernel, and a fresh
            # evaluate retries megakernels for shapes that never failed
            shape_key = (tuple(batch["image"].shape),
                         int(batch["formula"].shape[1]))
            model = (self._xla_decode_model
                     if shape_key in self._megakernel_failed_shapes
                     else self.model)
            try:
                metrics, ids, sc = decode(model, batch)  # ids (B, n_hyps, T)
            except Exception as e:  # noqa: BLE001 — non-resource errors re-raise below
                model = self._decode_fallback_model(e)
                self._megakernel_failed_shapes.add(shape_key)
                metrics, ids, sc = decode(model, batch)
            ce_total += float(metrics["ce_words"])
            n_total += int(metrics["n_words"])
            ids = np.asarray(ids)
            formula = np.asarray(batch["formula"])
            lengths = np.asarray(batch["length"])
            if sc is not None:
                sc = np.asarray(sc)
            for b in range(n_real):
                refs.append(formula[b, : lengths[b] - 1].tolist())  # strip END
                for k in range(n_hyps):
                    hyps[k].append(ids[b, k].tolist())
                if sc is not None:
                    confs.append(float(sc[b, 0]))

        files = write_answers(
            refs, hyps, model.vocab.id_to_tok, dir_answers, model.vocab.id_end
        )
        scores = score_files(files[0], files[1])
        if with_scores:
            from ..evaluation.text import selective_report

            with open(os.path.join(dir_answers, "hyp_0.scores.txt"), "w") as f:
                for s in confs:
                    f.write(f"{s:.6f}\n")
            scores.update(selective_report(files[0], files[1], confs))
        perp = float(np.exp(ce_total / max(1, n_total)))
        scores["perplexity"] = perp
        scores["perplexity_score"] = -perp
        msg = " || ".join(f"{k} is {v:04.2f}" for k, v in scores.items())
        self.logger.info(f"- Eval: {msg}")
        return scores
