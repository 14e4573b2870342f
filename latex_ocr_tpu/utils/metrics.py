"""Run observability: JSONL scalar metrics + TensorBoard + XLA traces.

Capability match for the reference's TensorBoard summaries
(reference model/base.py:85-93, img2seq.py:77-83: loss/lr/dropout/ce
scalars flushed every 10 steps): scalars stream to ``metrics.jsonl`` in
the run dir (one JSON object per line, trivially plottable) and — when a
TensorBoard backend is importable — are mirrored as real event files
under ``<run>/tb/`` so ``tensorboard --logdir`` works exactly as the
reference's README describes. `jax.profiler` traces can be captured for
a step window and viewed with TensorBoard / Perfetto.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(
        self, dir_output: str, filename: str = "metrics.jsonl", tensorboard: bool = True
    ):
        os.makedirs(dir_output, exist_ok=True)
        self.path = os.path.join(dir_output, filename)
        self._f = open(self.path, "a", buffering=1)
        self._t0 = time.time()
        self._tb = None
        # lazy: importing torch (the TF-free event writer lives there) costs
        # seconds and hundreds of MB RSS on the 1-CPU build host — pay it on
        # the first scalar write of a real training run, not at construction.
        # LATEX_OCR_NO_TB=1 (set by the test conftest) disables it outright.
        if os.environ.get("LATEX_OCR_NO_TB"):
            tensorboard = False
        self._tb_dir = os.path.join(dir_output, "tb") if tensorboard else None

    def _tb_writer(self):
        if self._tb_dir is not None and self._tb is None:
            try:  # torch ships a TF-free event writer in this image
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(self._tb_dir)
            except Exception:  # no backend available -> JSONL only
                pass
            self._tb_dir = None
        return self._tb

    def write(self, step: int, scalars: Dict[str, float], **tags) -> None:
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in scalars.items()})
        rec.update(tags)
        self._f.write(json.dumps(rec) + "\n")
        tb = self._tb_writer()
        if tb is not None:
            for k, v in scalars.items():
                tb.add_scalar(k, float(v), int(step))

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepProfiler:
    """Capture an XLA trace for steps [start, stop) into <run>/profile/."""

    def __init__(self, dir_output: str, start_step: int, stop_step: int):
        self.dir = os.path.join(dir_output, "profile")
        self.start_step = start_step
        self.stop_step = stop_step
        self._active = False

    def maybe_start(self, step: int) -> None:
        if not self._active and step == self.start_step:
            import jax

            os.makedirs(self.dir, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.stop_step:
            import jax

            jax.profiler.stop_trace()
            self._active = False

    @classmethod
    def from_config(cls, config, dir_output: str) -> Optional["StepProfiler"]:
        window = getattr(config, "profile_steps", None)
        if not window:
            return None
        start, stop = int(window[0]), int(window[1])
        return cls(dir_output, start, stop)
