"""Checkpointing: best-by-score params + opt state + epoch, auto-resume.

Reproduces the reference lifecycle (model/base.py:33-69,126-129): one
retained checkpoint, written when the validation score improves; on
startup the latest checkpoint auto-restores and training resumes from the
stored epoch. Uses orbax-checkpoint for async-capable, sharding-aware
saves.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

_ABSL_MUTE_LOCK = threading.Lock()


class CheckpointManager:
    def __init__(self, dir_model: str, max_to_keep: int = 1):
        self.dir_model = os.path.abspath(dir_model)
        os.makedirs(self.dir_model, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir_model,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, epoch: int, params: Dict, opt_state: Any, extra: Optional[Dict] = None,
             raw_params: Optional[Dict] = None) -> None:
        """``params`` is the published model — what eval/predict/serving
        restore. With EMA weight averaging on, the trainer passes the
        averaged weights as ``params`` (eval selected on them) and the
        raw training weights as ``raw_params`` so exact resume continues
        the true optimizer trajectory. Without EMA the schema is
        unchanged (no ``raw_params`` item)."""
        state = {"params": params, "opt_state": opt_state, "extra": extra or {}}
        if raw_params is not None:
            state["raw_params"] = raw_params
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def save_async(self, step: int, params: Dict, opt_state: Any,
                   extra: Optional[Dict] = None,
                   raw_params: Optional[Dict] = None) -> None:
        """Non-blocking save for the step-granular save-latest stream.

        The caller's training loop keeps running while orbax writes in the
        background. The trees are copied to host numpy FIRST: train_step
        donates its params/opt_state buffers, so an async writer holding
        device references would read freed memory one step later.

        Idempotent per step: latest_epoch() only reports COMMITTED steps,
        so a caller guard like `latest_epoch() != step` races an in-flight
        async save of the same step (e.g. an epoch boundary landing on a
        save_every_steps multiple) — orbax would wait for the in-flight
        commit and then raise StepAlreadyExistsError, killing the run. A
        duplicate request for a step this manager already saved (in-flight
        or committed) is therefore a silent no-op: both resume points
        replay the same deterministic work.
        """
        import numpy as np

        if step == getattr(self, "_last_async_step", None):
            return
        if step in (self._mgr.all_steps() or ()):
            return

        def host(tree):
            return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)

        state = {
            "params": host(params),
            "opt_state": host(opt_state),
            "extra": extra or {},
        }
        if raw_params is not None:
            state["raw_params"] = host(raw_params)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._last_async_step = step

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, params_like: Dict, opt_state_like: Any, extra_like: Optional[Dict] = None,
        raw_like: Optional[Dict] = None,
    ) -> Optional[Tuple[Dict, Any, Dict, int, Optional[Dict]]]:
        """Restore the latest checkpoint shaped like the given pytrees.

        ``extra_like`` is a template for the host-state dict saved via
        ``save(extra=...)`` (e.g. best_score + LRSchedule counters); if the
        stored checkpoint's extra tree doesn't match (older format), the
        tensors are still restored and extra comes back empty. ``raw_like``
        is a template for the optional ``raw_params`` item (EMA runs);
        a checkpoint without one (EMA enabled mid-run, or pre-EMA format)
        restores with raw_params None.

        Returns (params, opt_state, extra, epoch, raw_params_or_None) or
        None if no checkpoint.
        """
        step = self._mgr.latest_step()
        if step is None:
            return None
        # target preference order: with raw_params first when the caller
        # wants it, but ALWAYS also try the with-raw shape using
        # params_like as the template — a checkpoint written by an EMA run
        # must restore when the resume has ema_decay off (the raw tree is
        # simply discarded by the caller), not crash on an orbax structure
        # mismatch. Within each shape: full extra template, then empty.
        shapes = [raw_like, None] if raw_like is not None else [None, params_like]
        attempts = [
            (raw_tmpl, extra_target)
            for raw_tmpl in shapes
            for extra_target in ((extra_like or {}), {})
        ]
        first_err: Optional[Exception] = None
        for i, (raw_tmpl, extra_target) in enumerate(attempts):
            target = {
                "params": params_like,
                "opt_state": opt_state_like,
                "extra": extra_target,
            }
            if raw_tmpl is not None:
                target["raw_params"] = raw_tmpl
            try:
                restored = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(target)
                )
            except Exception as e:
                # surface the FIRST attempt's error when everything fails:
                # it targeted the most likely structure, so its message
                # names the real mismatch (a genuinely corrupted or
                # wrong-model checkpoint otherwise reports the error from
                # the least-likely shape — raw template + empty extra)
                if first_err is None:
                    first_err = e
                if i == len(attempts) - 1:
                    raise first_err
                continue
            return (
                restored["params"],
                restored["opt_state"],
                restored.get("extra", {}) or {},
                step,
                restored.get("raw_params") if raw_like is not None else None,
            )
        return None  # unreachable: the last attempt either returns or raises

    def restore_params(
        self, params_like: Optional[Dict] = None, required: bool = False
    ) -> Optional[Dict]:
        """Restore only the parameters (for eval/predict builds).

        Restores the raw saved tree (no structural target needed) and
        returns its ``params`` subtree; ``params_like`` is only used to
        cast leaves back onto the expected dtypes/devices when given.
        ``required=True`` raises instead of returning None when no
        checkpoint exists — warm-start callers must use it, otherwise a
        missing donor silently trains from random init.
        """
        step = self._mgr.latest_step()
        if step is None:
            if required:
                raise FileNotFoundError(
                    f"no checkpoint under {self.dir_model} (required=True)"
                )
            return None
        import logging

        # restoring without a structural target is exactly what we want
        # here (params-only consumers don't know the opt_state topology);
        # absl's UNSAFE/handler-registry warnings for this call are noise
        # (restore verified: every leaf comes back trained), so mute them.
        # The module lock keeps concurrent restores from clobbering each
        # other's saved logger level.
        absl_logger = logging.getLogger("absl")
        with _ABSL_MUTE_LOCK:
            prev_level = absl_logger.level
            absl_logger.setLevel(logging.ERROR)
            try:
                try:
                    restored = self._mgr.restore(step)
                except ValueError as e:
                    # the saved shardings name devices this process doesn't
                    # have (e.g. a TPU-written checkpoint restored on a CPU
                    # host for eval/oracle work) — re-read every leaf as a
                    # plain numpy array instead; params_like casting below
                    # puts them on the local default device. Trigger is
                    # narrowed to device/sharding wording so an unrelated
                    # ValueError (e.g. structure mismatch) surfaces instead
                    # of taking this path.
                    msg = str(e).lower()
                    if not any(s in msg for s in
                               ("device", "sharding", "platform", "mesh")):
                        raise
                    restored = self._restore_as_numpy(step)
            finally:
                absl_logger.setLevel(prev_level)
        params = restored["params"]
        if params_like is not None:
            # fail with the actual story on shape drift (e.g. a donor
            # checkpoint saved for a different vocab size) instead of a
            # confusing trace-time error downstream
            def _cast(like, x):
                if tuple(like.shape) != tuple(x.shape):
                    raise ValueError(
                        f"checkpoint under {self.dir_model!r} holds shape "
                        f"{tuple(x.shape)} where the model expects "
                        f"{tuple(like.shape)} — different model/vocab "
                        "config; pick a compatible donor or rebuild"
                    )
                return jax.numpy.asarray(x, dtype=like.dtype)

            params = jax.tree.map(_cast, params_like, params)
        return params

    def _restore_as_numpy(self, step: int) -> Dict:
        """Device-free restore: every leaf comes back as np.ndarray.

        Used when the checkpoint's saved shardings reference devices this
        process doesn't have (cross-platform restore, e.g. TPU-written →
        CPU eval host)."""
        import numpy as np

        path = os.path.join(self.dir_model, str(step), "default")
        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.metadata(path).item_metadata.tree
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
        )
        return ckptr.restore(path, args=ocp.args.PyTreeRestore(restore_args=restore_args))

    def close(self) -> None:
        self._mgr.close()
