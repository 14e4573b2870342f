"""Test configuration: force an 8-device CPU platform so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU unconditionally: the session environment pins JAX_PLATFORMS to
# the real (tunneled) TPU, and eager test dispatch over the tunnel is both
# slow and single-device.
os.environ["JAX_PLATFORMS"] = "cpu"
# skip TensorBoard event writing in tests: the torch import behind it costs
# seconds + high RSS on the 1-CPU build host (utils/metrics.py honors this)
os.environ.setdefault("LATEX_OCR_NO_TB", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone does not dislodge the session's axon TPU plugin; the
# config update must happen before the backend initializes.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated suite runs (and repeated
# parametrizations within one run) reload compiled programs instead of
# recompiling — a large win on the 1-CPU build host. Degrade gracefully
# (lose the speedup, keep the suite) when the cache dir isn't writable.
try:
    from latex_ocr_tpu.utils.jax_setup import setup_jax  # noqa: E402

    setup_jax()
except OSError:
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_dataset(tmp_path_factory):
    """A synthetic rendered dataset shared across tests."""
    from latex_ocr_tpu.data.synthetic import make_synthetic_dataset

    out_dir = str(tmp_path_factory.mktemp("smalldata"))
    buckets = [[240, 100], [320, 80], [400, 100], [480, 100], [560, 100], [720, 120]]
    paths = make_synthetic_dataset(
        out_dir, n_train=40, n_val=12, n_test=12, seed=0, buckets=buckets, n_threads=2
    )
    paths["buckets"] = buckets
    return paths


@pytest.fixture(scope="session")
def mini_dataset(tmp_path_factory):
    """A 2-bucket synthetic dataset for the trainer-loop tests.

    Every distinct (image bucket, length bucket) shape costs a separate
    XLA compile on the single-CPU build host; the full-bucket-table
    coverage lives in `small_dataset`-based tests, while the trainer
    lifecycle tests (resume, cached pipeline, DP mesh) only need *some*
    shape diversity — two buckets keeps them honest at a third of the
    compile bill."""
    from latex_ocr_tpu.data.synthetic import make_synthetic_dataset

    out_dir = str(tmp_path_factory.mktemp("minidata"))
    buckets = [[240, 100], [320, 80]]
    paths = make_synthetic_dataset(
        out_dir, n_train=24, n_val=8, n_test=8, seed=1, buckets=buckets, n_threads=2
    )
    paths["buckets"] = buckets
    return paths
