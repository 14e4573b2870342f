"""Learning-rate schedule with warm-up, exponential decay window,
score-based multiplicative decay and early stopping.

Pure host-side math reproducing the exact semantics of the reference
schedule (model/utils/lr_schedule.py:4-118): durations are measured in
batches; the decay factor is precomputed so that lr decays from ``lr_init``
to ``lr_min`` over ``[start_decay, end_decay]``; warm-up holds ``lr_warm``
until ``end_warm``; score-based decay multiplies by ``decay_rate`` whenever
the (higher-is-better) score fails to improve; ``lr`` is floored at
``lr_min``.
"""

from __future__ import annotations

from typing import Optional


class LRSchedule:
    def __init__(
        self,
        lr_init: float = 1e-3,
        lr_min: float = 1e-4,
        start_decay: int = 0,
        decay_rate: Optional[float] = None,
        end_decay: Optional[int] = None,
        lr_warm: float = 1e-4,
        end_warm: Optional[int] = None,
        early_stopping: Optional[int] = None,
        decay_mode: str = "exponential",
    ):
        self._lr_init = lr_init
        self._lr_min = lr_min
        self._start_decay = start_decay
        self._decay_rate = decay_rate
        self._end_decay = end_decay
        self._lr_warm = lr_warm
        self._end_warm = end_warm

        self._score: Optional[float] = None
        self._early_stopping = early_stopping
        self._n_no_improvement = 0
        # "exponential" (reference TF path), "cosine" (reference torch
        # path's CosineAnnealingLR, base_torch.py:129-133), or "noam"
        # (transformer-shaped: linear warm-up to lr_init over end_warm
        # batches, then inverse-sqrt decay — Vaswani et al. 2017 §5.3,
        # beyond-reference lever for the transformer decoder family)
        assert decay_mode in ("exponential", "cosine", "noam"), decay_mode
        self._decay_mode = decay_mode
        # score-decay events multiply this persistent factor in recompute
        # modes (cosine/noam recompute lr from batch_no, which would
        # otherwise clobber multiplicative score decay)
        self._score_mult = 1.0

        if self._decay_mode == "noam":
            if not self._end_warm:
                self._end_warm = 1  # degenerate: pure inverse-sqrt
            self.lr = lr_init / self._end_warm
            return

        if self._end_warm is not None:
            # decay must not start inside the warm-up window
            self._start_decay = max(self._end_warm, self._start_decay)
            self.lr = self._lr_warm
        else:
            self.lr = lr_init

        if self._end_decay is not None:
            span = float(self._end_decay - self._start_decay)
            self._exp_decay = (lr_min / lr_init) ** (1.0 / span)

    @property
    def stop_training(self) -> bool:
        return (
            self._early_stopping is not None
            and self._n_no_improvement >= self._early_stopping
        )

    def state_dict(self) -> dict:
        """Host state that must survive a restart for exact resume: the
        current lr (exponential decay is multiplicative, so it cannot be
        recomputed from batch_no alone once score-decay events happened),
        the best score seen, and the no-improvement streak."""
        return {
            "lr": float(self.lr),
            "score": None if self._score is None else float(self._score),
            "n_no_improvement": int(self._n_no_improvement),
            "score_mult": float(self._score_mult),
        }

    def load_state_dict(self, state: dict) -> None:
        self.lr = float(state["lr"])
        self._score = state["score"]
        self._n_no_improvement = int(state["n_no_improvement"])
        # absent in checkpoints written before the noam mode existed
        self._score_mult = float(state.get("score_mult", 1.0))

    def update(self, batch_no: Optional[int] = None, score: Optional[float] = None) -> None:
        """Advance the schedule by time (``batch_no``) and/or by ``score``.

        Higher score is better. Both updates may apply in the same call.
        """
        if batch_no is not None and self._decay_mode == "noam":
            import math

            step = max(1, batch_no)
            base = self._lr_init * min(
                step / self._end_warm, math.sqrt(self._end_warm / step)
            )
            self.lr = base * self._score_mult
            if step > self._end_warm:
                # floor applies only after warm-up: the ramp intentionally
                # starts below lr_min
                self.lr = max(self.lr, self._lr_min)
        elif batch_no is not None:
            if (
                self._end_warm is not None
                and self._end_warm <= batch_no <= self._start_decay
            ):
                self.lr = self._lr_init
            if batch_no > self._start_decay and self._end_decay is not None:
                if self._decay_mode == "cosine":
                    import math

                    frac = min(
                        1.0,
                        (batch_no - self._start_decay)
                        / float(self._end_decay - self._start_decay),
                    )
                    self.lr = self._lr_min + 0.5 * (self._lr_init - self._lr_min) * (
                        1.0 + math.cos(math.pi * frac)
                    )
                else:
                    self.lr *= self._exp_decay

        if self._decay_rate is not None and score is not None and self._score is not None:
            if score <= self._score:
                self.lr *= self._decay_rate
                self._score_mult *= self._decay_rate
                self._n_no_improvement += 1
            else:
                self._n_no_improvement = 0

        if score is not None:
            self._score = score

        if not (self._decay_mode == "noam" and (batch_no or 0) <= self._end_warm):
            self.lr = max(self.lr, self._lr_min)


class SpikeGuard:
    """Loss-spike lr cooldown — a reactive GRU stabilizer, measured and
    REFUTED (design.md §16.8; RESULTS.md "GRU stability" sections).

    The r4 clip A/B refuted gradient clipping (Adam's g/√v̂ step is
    scale-invariant once v̂ adapts); this guard was the follow-up
    hypothesis — once training has converged (a sampled loss below
    ``converged``), a sampled loss above ``threshold`` scales the lr by
    ``cooldown_mult`` for the next ``cooldown_steps`` train steps.
    The same-seed A/B on the worst-spiker phase refuted it too: cutting
    lr AFTER ignition stalls re-grounding (recovery needs the full lr),
    so the guard arm spent its entire budget stuck at the LM floor,
    re-triggering at every cooldown expiry (test EM 8.0 vs the
    unguarded control's 61.0). Kept for A/B reproducibility; the
    mechanism-consistent stabilizer is ``ConvergenceGate`` below, which
    acts on the onset side instead.

    Host-side and sampling-tolerant by design: the trainer only reads the
    loss scalar every 10 steps (a per-step device sync would serialize
    dispatch), and a spike lasting hundreds of steps is caught within one
    sampling stride. The lr stays a dynamic scalar argument, so the guard
    never triggers a recompile.
    """

    def __init__(
        self,
        threshold: float = 3.0,
        converged: float = 1.0,
        cooldown_mult: float = 0.1,
        cooldown_steps: int = 300,
    ):
        assert threshold > converged > 0.0, (threshold, converged)
        assert 0.0 < cooldown_mult <= 1.0, cooldown_mult
        self._threshold = float(threshold)
        self._converged = float(converged)
        self._cooldown_mult = float(cooldown_mult)
        self._cooldown_steps = int(cooldown_steps)
        self._armed = False
        self._cooldown_until = -1
        self.n_triggers = 0

    def observe(self, step: int, loss: float):
        """Feed a sampled (step, train loss) pair.

        Returns a human-readable event string when the guard triggers,
        else None (the trainer logs it).
        """
        if loss < self._converged:
            self._armed = True
        elif self._armed and loss > self._threshold and step >= self._cooldown_until:
            self._cooldown_until = step + self._cooldown_steps
            self.n_triggers += 1
            return (
                f"spike guard: loss {loss:.3f} at step {step} — "
                f"lr x{self._cooldown_mult:g} for {self._cooldown_steps} steps"
            )
        return None

    def scale(self, step: int) -> float:
        """Multiplier to apply to the schedule's lr at this step."""
        return self._cooldown_mult if step < self._cooldown_until else 1.0

    def apply(self, step: int, lr: float) -> float:
        """The schedule lr after this guard's intervention."""
        return lr * self.scale(step)

    def state_dict(self) -> dict:
        return {
            "armed": self._armed,
            "cooldown_until": self._cooldown_until,
            "n_triggers": self.n_triggers,
        }

    def load_state_dict(self, sd: dict) -> None:
        self._armed = bool(sd["armed"])
        self._cooldown_until = int(sd["cooldown_until"])
        self.n_triggers = int(sd["n_triggers"])


class ConvergenceGate:
    """Convergence-gated lr cap — the onset-side GRU stabilizer,
    measured and REFUTED (design.md §16.8; RESULTS.md "GRU stabilizer
    A/Bs (r4)").

    Design rationale: the clip and ``SpikeGuard`` censuses suggested
    prevention and recovery want OPPOSITE lr regimes — spikes seemed to
    ignite only from the converged state at lr ≥ 5e-4 (zero spikes at
    ≤ 2e-4 in every polish phase), while re-grounding is fast at full
    lr. So the gate passes the schedule's lr through while the sampled
    loss is above ``converged`` (grounding/recovery), caps it at
    ``cap`` once converged, and releases the cap above ``release``.

    The same-seed A/B on the worst-spiker phase refuted the premise:
    all 57 cap engagements ignited UNDER the 2e-4 cap (56 releases),
    and the capped lr slowed the between-spike climb 2.5× (test EM
    41.2 vs the unguarded control's 61.0). The polish phases'
    zero-spike record at 2e-4 is a property of fully-trained models on
    the polish data mix, not of the lr alone — ignition is data/state-
    driven. Kept for A/B reproducibility; the shipped configuration is
    the unguarded control (constant lr, clip 5.0, keep-best
    absorption). Same host-side 10-step loss sampling and
    dynamic-scalar lr as ``SpikeGuard`` (never recompiles).
    """

    def __init__(
        self,
        cap: float = 2e-4,
        converged: float = 1.0,
        release: float = 3.0,
    ):
        assert release > converged > 0.0, (release, converged)
        assert cap > 0.0, cap
        self._cap = float(cap)
        self._converged = float(converged)
        self._release = float(release)
        self._engaged = False
        self.n_triggers = 0  # cap releases: spikes that ignited anyway

    def observe(self, step: int, loss: float):
        """Feed a sampled (step, train loss) pair; returns an event
        string on an engage/release transition, else None."""
        if not self._engaged and loss < self._converged:
            self._engaged = True
            return (
                f"convergence gate: loss {loss:.3f} at step {step} — "
                f"lr capped at {self._cap:g}"
            )
        if self._engaged and loss > self._release:
            self._engaged = False
            self.n_triggers += 1
            return (
                f"convergence gate: loss {loss:.3f} at step {step} — "
                f"cap released for full-lr recovery"
            )
        return None

    def apply(self, step: int, lr: float) -> float:
        """The schedule lr after this gate's intervention."""
        return min(lr, self._cap) if self._engaged else lr

    def state_dict(self) -> dict:
        return {"engaged": self._engaged, "n_triggers": self.n_triggers}

    def load_state_dict(self, sd: dict) -> None:
        self._engaged = bool(sd["engaged"])
        self.n_triggers = int(sd["n_triggers"])
