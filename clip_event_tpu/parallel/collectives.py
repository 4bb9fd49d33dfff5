"""Thin comm layer mirroring the reference's collective helpers
(`utils.py:94-206, 459-512`) on JAX primitives.

Under pjit, gradient reduction and global-batch losses come out of GSPMD for
free, so most reference collectives have no hot-path equivalent here. These
helpers cover the remaining uses:

  * `comm` — world/rank/main-process introspection + barrier (the reference
    `comm` singleton, `utils.py:459-512`),
  * `reduce_dict` — average a metrics dict across processes (`utils.py:136`),
  * `all_gather_objects` — gather picklable objects (the reference's broken
    pickle `all_gather`, `utils.py:94-134`, fixed),
  * `gather_features` — the gradient-correct cross-shard feature gather for
    sharded in-batch InfoNCE inside `shard_map` (the realized
    `gather_tensors`, `utils.py:192-206`: jax.lax.all_gather with
    `tiled=True` differentiates to `psum_scatter`, which restores exactly
    the local shard's gradient).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from clip_event_tpu.parallel.mesh import DATA_AXIS


class _Comm:
    @property
    def world_size(self) -> int:
        return jax.process_count()

    @property
    def rank(self) -> int:
        return jax.process_index()

    @property
    def local_rank(self) -> int:
        return jax.process_index()

    @property
    def is_main_process(self) -> bool:
        return jax.process_index() == 0

    @property
    def head(self) -> str:
        return f"Rank[{self.rank}/{self.world_size}]"

    def synchronize(self) -> None:
        """Cross-process barrier (reference `comm.synchronize`)."""
        if jax.process_count() > 1:
            # a tiny global psum acts as a barrier over all devices/hosts
            jax.block_until_ready(
                jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
                    np.zeros(jax.local_device_count(), np.float32)
                )
            )


comm = _Comm()


def reduce_dict(metrics: Dict[str, float], average: bool = True) -> Dict[str, float]:
    """Average (or sum) a scalar dict across processes. With pjit the loss is
    already global, so this is only needed for host-side quantities."""
    if jax.process_count() <= 1:
        return dict(metrics)
    keys = sorted(metrics)
    values = np.asarray([float(metrics[k]) for k in keys], np.float32)
    tiled = np.tile(values, (jax.local_device_count(), 1))
    summed = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(tiled)
    total = np.asarray(summed)[0] / jax.local_device_count()
    if average:
        total = total / jax.process_count()
    return dict(zip(keys, total.tolist()))


def all_gather_objects(obj):
    """Gather arbitrary picklable objects from every process (fixed version
    of the reference's `all_gather`, which forgot to import pickle).

    Pickles to a uint8 buffer, all-gathers sizes then max-padded payloads
    (the reference's padded-tensor protocol, `utils.py:110-127`) —
    `process_allgather` alone gathers pytree *leaves*, not objects."""
    if jax.process_count() <= 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(np.asarray([data.size], np.int32))
    sizes = np.asarray(sizes).reshape(-1)
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[: data.size] = data
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(jax.process_count())
    ]


def gather_features(features: jnp.ndarray, axis_name: str = DATA_AXIS) -> jnp.ndarray:
    """Inside shard_map: [b, E] local shard → [B, E] global, differentiable.

    The VJP of tiled all_gather is psum_scatter, i.e. each shard's gradient
    contribution flows back only to its own rows — the semantics the
    reference hand-built by splicing the local tensor into the gathered list
    (`utils.py:192-206`).
    """
    return jax.lax.all_gather(features, axis_name, axis=0, tiled=True)
