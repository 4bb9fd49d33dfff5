"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DDP/NCCL stack (`utils.py:541-616`, `train.py:222-225`).

Parallelism model: a 1-D `dp` mesh over all chips. Batches are sharded on
their leading axis; parameters and optimizer state are replicated. Under
`jit`, XLA GSPMD turns the global in-batch InfoNCE logits (`features_img @
features_txt.T` with both operands batch-sharded) into an all-gather over
ICI — the realized version of the reference's unused gradient-preserving
`gather_tensors` (`utils.py:192-206`) — and gradient reduction comes out as
`psum` instead of DDP bucket all-reduce.

Multi-host: call `initialize_distributed()` (a thin wrapper over
`jax.distributed.initialize`) before `make_mesh()`; TPU pod runtimes
auto-detect coordinator/process ids from the environment, mirroring what the
reference's `MPIAdapter` did for Azure clusters.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host rendezvous. No-op when single-process or already set up."""
    if jax.process_count() > 1:
        return
    explicit = coordinator_address is not None
    env_driven = "JAX_COORDINATOR_ADDRESS" in os.environ or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
    if explicit or env_driven:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over (the first `num_devices`) devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put every array in the batch, sharded on its leading axis.

    Arrays whose leading axis doesn't divide the mesh (e.g. the static
    `index_pos` table) are replicated instead.

    Single-device meshes device_put WITHOUT a sharding: committing inputs to
    a 1-device NamedSharding forces the SPMD-partitioner compilation pipeline,
    measured 1.4× slower on bare matmuls and 2.4× on the full train step on
    this backend (PERFORMANCE.md "GSPMD single-device overhead").
    """
    if mesh.devices.size == 1:
        return {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    # leading axis divides the DATA axis, not the whole mesh — on a 2-D
    # (dp × tp) mesh the batch is sharded over dp and replicated over tp
    n = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        DATA_AXIS, mesh.devices.size
    )
    sharded = batch_sharding(mesh)
    replicated = replicated_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        target = sharded if x.ndim >= 1 and x.shape[0] % n == 0 else replicated
        return jax.device_put(x, target)

    return {k: put(v) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh.

    Single-device meshes skip the sharding commitment (see `shard_batch`)."""
    if mesh.devices.size == 1:
        return jax.device_put(tree)
    return jax.device_put(tree, replicated_sharding(mesh))
