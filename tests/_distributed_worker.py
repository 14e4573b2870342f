"""Worker for the multi-process multi-host test (run via subprocess).

Each process plays one "host" of a 2-host cluster: 2 local CPU devices per
process (4 global), `jax.distributed.initialize` over a local coordinator,
host-local batch assembly through
`parallel.distributed.global_batch_from_host_local`, and ONE real
data-parallel train step on the tiny flagship model. Prints the loss so
the parent test can assert all hosts agree (gradients all-reduced over the
gloo CPU backend standing in for ICI/DCN).

Usage: python tests/_distributed_worker.py <coordinator_port> <process_id> <num_processes>
"""

import os
import sys


def main() -> None:
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    # The env var alone is not enough here: the axon TPU plugin registers
    # itself regardless, so pin the platform through the config too.
    jax.config.update("jax_platforms", "cpu")

    # Persistent compile cache: the worker's train-step compile dominates
    # the parent test's wall-clock; warm runs load it in milliseconds.
    from latex_ocr_tpu.utils.jax_setup import setup_jax

    try:
        setup_jax()
    except OSError:
        pass

    from latex_ocr_tpu.parallel.distributed import (
        global_batch_from_host_local,
        initialize_distributed,
    )

    assert initialize_distributed(f"localhost:{port}", nproc, pid)
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from latex_ocr_tpu.models.img2seq import Img2SeqModel
    from latex_ocr_tpu.parallel.mesh import make_mesh, replicate
    from latex_ocr_tpu.utils import Config

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2
    assert len(jax.devices()) == 2 * nproc

    mesh = make_mesh()

    config = Config(dict(ge.REFERENCE_MODEL, max_length_formula=7))
    config.attn_cell_config = {
        "cell_type": "lstm", "num_units": 16, "dim_e": 8, "dim_o": 16,
        "dim_embeddings": 8,
    }
    vocab = ge._make_vocab(20)
    model = Img2SeqModel(config, vocab, compute_dtype=jnp.bfloat16)
    params = replicate(model.init_params(jax.random.PRNGKey(0)), mesh)
    opt_state = replicate(model.init_optimizer(params, "adam", clip=5.0), mesh)

    # Deterministic GLOBAL batch; this host contributes only its local rows.
    global_batch = ge._make_batch(2 * nproc, 24, 40, 8, vocab.n_tok, vocab.id_end)
    local = {k: v[2 * pid : 2 * (pid + 1)] for k, v in global_batch.items()}
    batch = global_batch_from_host_local(local, mesh)
    for v in batch.values():
        assert v.shape[0] == 2 * nproc, v.shape

    params, opt_state, metrics = model.train_step(
        params, opt_state, batch, jnp.float32(1e-3), jax.random.PRNGKey(1), 1.0
    )
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"HOST {pid} LOSS {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
