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
# Outer data-parallel axis for multi-slice deployments: slices of a TPU pod
# are joined by DCN (data-center network), which is orders of magnitude
# slower than the ICI links inside a slice. Putting the slice dimension on
# its own OUTER mesh axis makes GSPMD decompose the gradient reduction
# hierarchically — reduce-scatter/all-gather over ICI within each slice,
# and only the per-slice partial sums cross DCN — instead of ring-reducing
# the full gradient over the slow links. (The reference's NCCL/DDP world has
# no counterpart; this is the jax-native multi-pod scaling recipe.)
DCN_AXIS = "dcn"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host rendezvous. No-op when single-process or already set up.

    Without explicit arguments, delegates to the cluster adapter
    (`parallel.cluster.detect_cluster`): jax-native envs
    (JAX_COORDINATOR_ADDRESS / MEGASCALE_*, which TPU pod runtimes resolve
    themselves), then OpenMPI (OMPI_COMM_WORLD_*), then SLURM — the same
    detection ladder as the reference's `init_distributed_mode` +
    `MPIAdapter` (`utils.py:541-616`, `utils_MPIAdapter.py:12-144`). This is
    the path `train.py` and every eval CLI take, so an `mpirun`/`srun`
    launch rendezvouses with no extra flags."""
    # already-initialized guard WITHOUT touching the XLA backend:
    # jax.process_count() would initialize it, and jax.distributed must run
    # before any backend use (it raises otherwise)
    from jax._src import distributed as _jax_distributed

    state = _jax_distributed.global_state
    if getattr(state, "client", None) is not None or getattr(
        state, "coordinator_address", None
    ):
        return
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    from clip_event_tpu.parallel.cluster import initialize_from_cluster

    initialize_from_cluster()


def make_mesh(num_devices: Optional[int] = None, dcn: int = 1) -> Mesh:
    """Data-parallel mesh over (the first `num_devices`) devices.

    `dcn=1` (default): a 1-D `dp` mesh. `dcn>1`: a 2-D `(dcn, dp)` mesh for
    multi-slice pods — the outer axis spans slices (DCN links), the inner
    axis the chips within a slice (ICI). On real multi-slice TPU hardware the
    device order comes from `mesh_utils.create_hybrid_device_mesh` (which
    groups by slice and optimizes the intra-slice torus order); everywhere
    else (CPU virtual meshes, single-slice) the flat device list is reshaped
    slice-major, which has the same axis semantics.
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    dcn = int(dcn)
    if dcn <= 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    if len(devices) % dcn:
        raise ValueError(
            f"dcn={dcn} does not divide device count {len(devices)}"
        )
    ici = len(devices) // dcn
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    if len(slice_ids) > 1:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(ici,), dcn_mesh_shape=(dcn,), devices=devices
        ).reshape(dcn, ici)
    else:
        dev_array = np.asarray(devices).reshape(dcn, ici)
    return Mesh(dev_array, (DCN_AXIS, DATA_AXIS))


def data_axes(mesh: Mesh):
    """The mesh axes a batch's leading dim shards over, outermost first."""
    if DCN_AXIS in mesh.axis_names:
        return (DCN_AXIS, DATA_AXIS)
    return (DATA_AXIS,)


def data_size(mesh: Mesh) -> int:
    """Total data-parallel degree (product of the data axes' sizes)."""
    shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    n = 1
    for ax in data_axes(mesh):
        n *= shape.get(ax, 1)
    return n


def data_process_group(model_degree: int):
    """(data_rank, data_world) for the batch loader on THIS process.

    Model-parallel mesh axes (tp / pp) are innermost over the flat,
    process-contiguous device order (`make_mesh_2d` / `make_mesh_pp`), so
    when the model degree exceeds the per-process device count one model
    group spans G = model_degree // local_device_count CONSECUTIVE
    processes. Those processes hold the same data shard (the batch
    replicates over the model axes) and must load IDENTICAL rows — the
    loader/label rank must collapse to the group. With the model group
    inside one process (the common TPU-host case) this is just
    (process_index, process_count)."""
    import jax

    local = max(jax.local_device_count(), 1)
    g = max(1, int(model_degree) // local)
    if jax.process_count() % g:
        raise ValueError(
            f"model degree {model_degree} over {local}-device processes "
            f"needs process groups of {g}, which does not divide "
            f"process_count={jax.process_count()}"
        )
    return jax.process_index() // g, jax.process_count() // g


def data_process_world(mesh: Mesh) -> int:
    """Number of DISTINCT process groups along the data axes — the factor
    between one process's local batch rows and the global batch when model
    axes (tp/pp) span processes (those processes contribute duplicate rows,
    not new ones)."""
    import jax

    if jax.process_count() <= 1:
        return 1
    shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    model_degree = 1
    for ax, n in shape.items():
        if ax not in data_axes(mesh):
            model_degree *= n
    # model axes are innermost in the flat order: device flat-index // model
    # = its data coordinate. Group processes by the data coords they cover.
    coords_by_proc: dict = {}
    for i, d in enumerate(mesh.devices.flat):
        coords_by_proc.setdefault(d.process_index, set()).add(i // model_degree)
    groups = {frozenset(v) for v in coords_by_proc.values()}
    return len(groups)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    axes = data_axes(mesh)
    return NamedSharding(mesh, P(axes if len(axes) > 1 else axes[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Batch fields that are global constants (identical on every process), not
# per-rank data rows — under multi-process assembly they replicate instead
# of contributing local shards. `index_pos` is the global positive-row gather
# table (data/labels.py).
_REPLICATED_FIELDS = frozenset({"index_pos"})


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put every array in the batch, sharded on its leading axis.

    Arrays whose leading axis doesn't divide the mesh (e.g. the static
    `index_pos` table) are replicated instead.

    Multi-process (`jax.process_count() > 1`): each process's batch holds its
    OWN rows of the global batch, so sharded fields go through
    `jax.make_array_from_process_local_data` (the global array whose rank-p
    block is process p's local data) — a bare `device_put` would demand the
    identical global value on every process. Requires the loader's
    rank-striding AND rank-offset label layouts (`data/labels.py`); the
    process-major row order is asserted in `make_mesh`-built meshes because
    `jax.devices()` sorts devices process-contiguously.

    Single-device meshes device_put WITHOUT a sharding: committing inputs to
    a 1-device NamedSharding forces the SPMD-partitioner compilation pipeline,
    measured 1.4× slower on bare matmuls and 2.4× on the full train step on
    this backend (PERFORMANCE.md "GSPMD single-device overhead").
    """
    if mesh.devices.size == 1:
        return {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    # leading axis divides the DATA axes (dcn × dp), not the whole mesh — on
    # a (dp × tp) mesh the batch is sharded over dp and replicated over tp
    n = data_size(mesh)
    if DATA_AXIS not in mesh.axis_names:
        n = mesh.devices.size
    sharded = batch_sharding(mesh)
    replicated = replicated_sharding(mesh)
    world = jax.process_count()
    if world > 1:
        procs = [d.process_index for d in mesh.devices.flat]
        if procs != sorted(procs):
            raise ValueError(
                "multi-process shard_batch needs a process-contiguous device "
                "order (rank p's loader rows land in global row block p)"
            )
        # model axes (tp/pp) spanning processes: those processes hold
        # DUPLICATE rows, so the global batch is local × #data-groups, not
        # local × #processes
        world = data_process_world(mesh)

    def put(k, x):
        x = np.asarray(x)
        if x.ndim < 1 or k in _REPLICATED_FIELDS:
            return jax.device_put(x, replicated)
        if world > 1:
            if (x.shape[0] * world) % n:
                return jax.device_put(x, replicated)
            return jax.make_array_from_process_local_data(
                sharded, x, global_shape=(x.shape[0] * world,) + x.shape[1:]
            )
        if x.shape[0] % n:
            return jax.device_put(x, replicated)
        return jax.device_put(x, sharded)

    return {k: put(k, v) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh.

    Single-device meshes skip the sharding commitment (see `shard_batch`)."""
    if mesh.devices.size == 1:
        return jax.device_put(tree)
    return jax.device_put(tree, replicated_sharding(mesh))
