"""Multi-host runtime: initialization + per-host data sharding helpers.

The reference is strictly single-process (SURVEY.md §2.3). For pod-slice
and multi-slice runs this module wraps `jax.distributed`: every host
calls `initialize_distributed()` before any backend use; collectives
inside pjit programs then ride ICI within a slice and DCN across slices
without further code changes. Host-local batches become global arrays via
`jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

import os
from typing import Dict, Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host runtime when configured; False otherwise.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are not given (standard cluster-launcher contract). Safe no-op on
    single-host runs.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    kwargs = {"coordinator_address": coordinator_address}
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    return True


def global_batch_from_host_local(batch: Dict, mesh) -> Dict:
    """Assemble per-host local batches into globally-sharded arrays.

    Each host feeds its local shard of the batch; the returned arrays are
    addressable across the whole mesh with the batch axis sharded on
    'data'.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        sharding = data if np.ndim(v) else repl
        out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
    return out
