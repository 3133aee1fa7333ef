"""Device-mesh construction and sharding helpers.

The reference scales with DDP only (SURVEY §2.4: torch.distributed + NCCL,
``tools/dist_train.sh``). The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis: batches are sharded over it,
parameters are replicated, and XLA inserts the gradient all-reduces over
ICI. The mesh keeps a (currently size-1) ``model`` axis so tensor-parallel
shardings can be added without changing the step signature.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh()``;
``jax.devices()`` then spans the pod and the same code path applies.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
    axis_names=("data", "model"),
) -> Mesh:
    """Build an (n_data, n_model) mesh; defaults to all devices on data."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, have {len(devices)}"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, sharded over 'data'.

    Single-process: a plain sharded ``device_put`` of the full batch.
    Multi-host (``jax.process_count() > 1``): each process holds only its
    local shard of the global batch (the loader's DistributedSampler-style
    partition), so the global array is assembled with
    ``jax.make_array_from_process_local_data`` — per-process data lands on
    that process's addressable devices, no cross-host copy of inputs
    (reference equivalent: per-rank DataLoader + DDP, ``dist_train.sh``).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
