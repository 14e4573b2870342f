"""General host-side helpers: logging, dirs, subprocess-with-timeout, progress.

Mirrors the behavioral contract of reference model/utils/general.py (logger to
file+console, kill-timer subprocess runner used by the LaTeX render pool,
Keras-style progress bar with running averages) without copying its code.
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys
import time
from threading import Timer
from typing import Iterable, Iterator, List, Tuple


def minibatches(data_generator: Iterable, minibatch_size: int) -> Iterator[Tuple[list, list]]:
    """Group an (x, y) generator into lists of up to ``minibatch_size``.

    The final partial batch is yielded too (reference general.py:15-35); the
    device pipeline later pads it to a static shape.
    """
    xs: List = []
    ys: List = []
    for x, y in data_generator:
        if len(xs) == minibatch_size:
            yield xs, ys
            xs, ys = [], []
        xs.append(x)
        ys.append(y)
    if xs:
        yield xs, ys


def run(cmd: str, timeout_sec: float) -> int:
    """Run a shell command, hard-killing it after ``timeout_sec`` seconds.

    Used by the LaTeX -> PNG render pool (pdflatex / magick can hang on
    malformed formulas). Returns the process return code (-9 on kill).
    """
    proc = subprocess.Popen(cmd, shell=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    timer = Timer(timeout_sec, proc.kill)
    try:
        timer.start()
        proc.communicate()
    finally:
        timer.cancel()
    return proc.returncode


def get_logger(filename: str) -> logging.Logger:
    """File + console logger for a run directory (`model.log`)."""
    logger = logging.getLogger(filename)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if not logger.handlers:
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.INFO)
        fh.setFormatter(logging.Formatter("%(asctime)s:%(levelname)s: %(message)s"))
        logger.addHandler(fh)
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(sh)
    return logger


def init_dir(dir_name: str | None) -> None:
    if dir_name:
        os.makedirs(dir_name, exist_ok=True)


def init_file(path_file: str, mode: str = "a") -> None:
    with open(path_file, mode):
        pass


def get_files(dir_name: str) -> List[str]:
    return [f for f in os.listdir(dir_name) if os.path.isfile(os.path.join(dir_name, f))]


def delete_file(path_file: str) -> None:
    try:
        os.remove(path_file)
    except OSError:
        pass


class Progbar:
    """Terminal progress bar with running averages and ETA."""

    def __init__(self, max_step: int, width: int = 30):
        self.max_step = max(1, int(max_step))
        self.width = width
        self.sums: dict[str, list[float]] = {}
        self.start = time.time()
        self.last_step = 0
        self.info = ""
        self._last_len = 0

    def update(self, curr_step: int, values: Iterable[Tuple[str, float]] = ()) -> None:
        delta = curr_step - self.last_step
        for name, v in values:
            acc = self.sums.setdefault(name, [0.0, 0.0])
            acc[0] += float(v) * delta
            acc[1] += delta
        self.last_step = curr_step

        frac = min(1.0, curr_step / self.max_step)
        filled = int(self.width * frac)
        bar = "=" * max(0, filled - 1) + (">" if curr_step < self.max_step else "=") * (filled > 0)
        bar = f"{curr_step}/{self.max_step} [{bar}{'.' * (self.width - filled)}]"

        elapsed = time.time() - self.start
        if curr_step and curr_step < self.max_step:
            eta = elapsed / curr_step * (self.max_step - curr_step)
            timing = f" - ETA: {eta:.0f}s"
        else:
            timing = f" - {elapsed:.0f}s"
        stats = "".join(
            f" - {k}: {s / max(1.0, n):.6f}" for k, (s, n) in self.sums.items()
        )
        self.info = timing + stats

        line = bar + self.info
        pad = " " * max(0, self._last_len - len(line))
        end = "\n" if curr_step >= self.max_step else ""
        sys.stdout.write("\r" + line + pad + end)
        sys.stdout.flush()
        self._last_len = len(line)
