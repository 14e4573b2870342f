"""Process-level JAX setup: persistent compilation cache, platform pinning.

The TPU in this environment sits behind a tunnel whose compile latency is
high-variance; a persistent compilation cache makes every program after
the first run of a given shape load in milliseconds. Call
``setup_jax()`` once at CLI entry, before any jax computation.
"""

from __future__ import annotations

import os


def setup_jax(
    cache_dir: str | None = None,
    platform: str | None = None,
    debug_nans: bool = False,
) -> None:
    import jax

    # explicit arg > LATEX_OCR_PLATFORM env > JAX_PLATFORMS env > backend
    # default. The env forms let any CLI run on CPU while the (shared) TPU
    # is busy, and let tests drive the real CLIs in subprocesses without
    # touching a device. JAX_PLATFORMS must be re-applied here because the
    # axon plugin registers itself regardless of it — without the explicit
    # config update the standard JAX env var is silently ignored.
    platform = (platform or os.environ.get("LATEX_OCR_PLATFORM")
                or os.environ.get("JAX_PLATFORMS"))
    if platform:
        jax.config.update("jax_platforms", platform)
    if debug_nans or os.environ.get("LATEX_OCR_DEBUG_NANS"):
        # debug config: fail fast on NaN/Inf in any jitted program
        # (SURVEY.md §5 sanitizers row)
        jax.config.update("jax_debug_nans", True)
    if cache_dir is None:
        cache_dir = os.environ.get(
            "LATEX_OCR_JAX_CACHE", os.path.expanduser("~/.cache/latex_ocr_tpu/jax")
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
