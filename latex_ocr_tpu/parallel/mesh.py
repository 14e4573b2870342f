"""Device mesh + sharding helpers: data parallelism over ICI.

The reference is single-device (one tf.Session, SURVEY.md §2.3); scaling
here is first-class: a 1-D ``data`` mesh shards the batch axis across
chips, parameters and optimizer state are replicated, and XLA inserts the
gradient all-reduce (psum over ICI) automatically from the sharding
annotations — the scaling-book recipe: pick a mesh, annotate shardings,
let the compiler place collectives.

The model is ~10M params, so tensor/pipeline parallelism buys nothing
(SURVEY.md §2.3 marks them non-goals); the win is batch scale-out plus
per-host sharded input pipelines.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def auto_mesh(devices: str = "auto", axis_name: str = "data") -> Optional[Mesh]:
    """Mesh policy for the CLI/script surface: DP on by default.

    ``devices``:
        "auto" — a 1-D data mesh over ALL visible devices when there is
                 more than one (a v5e-8 user running ``python train.py``
                 gets all 8 chips); None on a single device (the plain
                 jit path, no mesh overhead);
        "1"    — opt out: always single-device, no mesh;
        "N"    — mesh over the first N devices (N <= jax.device_count()).
    """
    spec = str(devices).strip().lower()
    if spec in ("1", "none", "off"):
        return None
    avail = jax.devices()
    if spec == "auto":
        return make_mesh(avail, axis_name) if len(avail) > 1 else None
    n = int(spec)
    if n <= 1:
        return None
    if n > len(avail):
        raise ValueError(f"--devices {n} requested but only {len(avail)} visible")
    return make_mesh(avail[:n], axis_name)


def round_batch_to_mesh(batch_size: int, mesh: Optional[Mesh]) -> int:
    """Round a global batch size up to a multiple of the mesh size so the
    sharded batch axis divides evenly across chips."""
    if mesh is None:
        return batch_size
    n = mesh.devices.size
    return ((batch_size + n - 1) // n) * n


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host batch onto the mesh, batch axis sharded."""
    data = batch_sharding(mesh, axis_name)
    out = {}
    for k, v in batch.items():
        out[k] = jax.device_put(v, data if np.ndim(v) else replicated_sharding(mesh))
    return out
