"""Shared zero-shot eval machinery.

All evals reduce to: encode every image and every candidate text with the
jitted normalized encoders (fixed batch shapes — the last partial batch is
padded, never a recompile), then score cosine logits on the host. The
reference documents these entry points but ships none (`README.md:212-229`).

Multi-process runs shard the dataset across processes (the TPU analogue of
the reference's `gather_tensors`/`all_gather` merging, `utils.py:94-206`):
each rank encodes its rank-strided slice, per-rank results are all-gathered
and re-interleaved into global order, so every process computes identical
metrics over the full set at 1/world_size of the encode cost.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from clip_event_tpu.engine.train_step import make_eval_encoders
from clip_event_tpu.models.clip import CLIPConfig


def resolve_shard(rank: Optional[int], world_size: Optional[int]) -> Tuple[int, int]:
    """Default the eval shard to this process's position in the job: under
    multi-process training every rank evaluates its own slice; standalone
    CLIs see (0, 1)."""
    if rank is None or world_size is None:
        import jax

        return jax.process_index(), jax.process_count()
    return rank, world_size


def eval_loader(dataset, batch_size: int, num_workers: int = 8,
                rank: int = 0, world_size: int = 1):
    """The canonical eval DataLoader: deterministic order, no dropped tail,
    rank-strided sharding."""
    from clip_event_tpu.data.common import DataLoader

    return DataLoader(
        dataset, batch_size=min(batch_size, len(dataset)), shuffle=False,
        drop_last=False, num_workers=num_workers, rank=rank,
        world_size=world_size,
    )


def merge_across_ranks(n: int, world_size: int, *parts):
    """All-gather per-rank strided results and weave them back into global
    dataset order.

    Each rank's loader yields indices `padded[rank::world_size]` where
    `padded` wraps the first examples to equalize counts
    (`data.common.DataLoader._indices`); re-interleaving the gathered slices
    and trimming to `n` drops exactly that wrap-around padding. Accepts
    numpy arrays (stacked along axis 0) and lists (e.g. metas)."""
    if world_size <= 1:
        return parts if len(parts) > 1 else parts[0]
    from clip_event_tpu.parallel.collectives import all_gather_objects

    gathered = all_gather_objects(parts)
    per_rank = -(-n // world_size)
    total = per_rank * world_size
    outs = []
    for j in range(len(parts)):
        ranks_j = [g[j] for g in gathered]
        if isinstance(ranks_j[0], np.ndarray):
            out = np.empty((total,) + ranks_j[0].shape[1:], ranks_j[0].dtype)
            for r, p in enumerate(ranks_j):
                out[r::world_size] = p
            outs.append(out[:n])
        else:
            out: List = [None] * total
            for r, p in enumerate(ranks_j):
                out[r::world_size] = p
            outs.append(out[:n])
    return tuple(outs) if len(outs) > 1 else outs[0]


# Device mesh for single-process multi-chip evals. `set_eval_mesh` (called
# by the eval CLI's tp path) overrides; otherwise Encoders auto-builds a dp
# mesh over this process's LOCAL devices so eval/embed batches shard across
# all chips instead of running on chip 0 only. Local devices (not global):
# under multi-process runs the DATA is already sharded per rank, so each
# rank's encodes stay local — no cross-process collectives.
_EVAL_MESH = None
_AUTO = object()


def set_eval_mesh(mesh) -> None:
    global _EVAL_MESH
    _EVAL_MESH = mesh


def _to_local(x):
    """Make a training-mesh-committed array consumable by the per-process
    eval mesh. Arrays spanning other processes' devices cannot be
    device_put across meshes (no cross-host transfers); a fully-replicated
    one has its complete value in the local shard, so read that. Hit by
    in-train validation under multi-host meshes (train.py validate_every)."""
    if getattr(x, "is_fully_addressable", True):
        return x
    if getattr(x, "is_fully_replicated", False):
        return np.asarray(x.addressable_data(0))
    raise ValueError(
        "eval received params sharded ACROSS processes (FSDP/ZeRO-style); "
        "gather them first (engine.checkpoint gathers on save) or run the "
        "eval from a replicated checkpoint"
    )


def _resolve_eval_mesh(batch_size: int):
    import jax

    if _EVAL_MESH is not None:
        return _EVAL_MESH
    local = jax.local_devices()
    if len(local) > 1 and batch_size % len(local) == 0:
        from jax.sharding import Mesh

        from clip_event_tpu.parallel.mesh import DATA_AXIS

        return Mesh(np.asarray(local), (DATA_AXIS,))
    # single device: stay OFF the SPMD-partitioner pipeline (measured
    # 1.4-2.4x overhead, PERFORMANCE.md "GSPMD single-device overhead");
    # non-dividing batch sizes just replicate-free on the default device
    return None


class Encoders:
    """Padded-batch wrappers around the jitted encoders.

    On a multi-chip host (single process) batches are sharded over a dp
    mesh across the local devices — `mesh` defaults to the CLI-set mesh
    (`set_eval_mesh`, e.g. the tp mesh) or an auto-built local dp mesh;
    pass `mesh=None` to force single-device."""

    def __init__(self, params, cfg: CLIPConfig, batch_size: int = 64,
                 compute_dtype=None, mesh=_AUTO):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from clip_event_tpu.parallel.mesh import DATA_AXIS

        dtype = compute_dtype or jnp.float32
        self._image_fn, self._text_fn = make_eval_encoders(cfg, compute_dtype=dtype)
        self._mesh = _resolve_eval_mesh(batch_size) if mesh is _AUTO else mesh
        self._batch_sharding = None
        if self._mesh is not None and self._mesh.devices.size > 1:
            if batch_size % dict(zip(
                self._mesh.axis_names, self._mesh.devices.shape
            )).get(DATA_AXIS, 1) == 0:
                self._batch_sharding = NamedSharding(self._mesh, P(DATA_AXIS))
            # params already committed to this mesh (tp path) stay put;
            # otherwise replicate them onto it
            leaf = jax.tree.leaves(params)[0]
            s = getattr(leaf, "sharding", None)
            if not (isinstance(s, NamedSharding) and s.mesh == self._mesh):
                params = jax.device_put(
                    jax.tree.map(_to_local, params),
                    NamedSharding(self._mesh, P()),
                )
        else:
            # single-device eval on a multi-host run: params committed to the
            # global training mesh would drag the eval jit onto it (and mix
            # with per-process local batches) — localize them first
            leaves = jax.tree.leaves(params)
            if leaves and not getattr(leaves[0], "is_fully_addressable", True):
                params = jax.tree.map(_to_local, params)
        self.params = params
        self.batch_size = batch_size

    def _batched(self, fn, items: np.ndarray) -> np.ndarray:
        import jax

        n = items.shape[0]
        out: List[np.ndarray] = []
        B = self.batch_size
        for start in range(0, n, B):
            chunk = items[start : start + B]
            pad = B - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
            if self._batch_sharding is not None:
                chunk = jax.device_put(chunk, self._batch_sharding)
            feats = np.asarray(fn(self.params, chunk))
            out.append(feats[: B - pad])
        return np.concatenate(out) if out else np.zeros((0,))

    def images(self, images: np.ndarray) -> np.ndarray:
        return self._batched(self._image_fn, images)

    def texts(self, tokens: np.ndarray) -> np.ndarray:
        return self._batched(self._text_fn, tokens)


def collect(loader, fields: Tuple[str, ...]):
    """Drain a DataLoader, concatenating the given tensor fields + metas.

    Fixture-scale only: this materializes every decoded image in host RAM.
    Production evals stream through `collect_encoded` instead."""
    tensors = {f: [] for f in fields}
    metas = []
    for batch, meta in loader:
        for f in fields:
            tensors[f].append(batch[f])
        metas.extend(meta)
    out = {f: np.concatenate(v) for f, v in tensors.items() if v}
    return out, metas


def collect_encoded(loader, enc: "Encoders", encode: dict, keep: Tuple[str, ...] = ()):
    """One streaming pass over the loader: heavy fields are encoded
    batch-by-batch into [N, E] feature matrices (decoded images never
    accumulate on the host — full-SWiG-scale evals fit in ~100 MB instead of
    ~15 GB), small fields and metas are concatenated as-is.

    `encode` maps field name → 'image' | 'text'. Returns (features dict,
    kept-tensors dict, metas list)."""
    feats = {f: [] for f in encode}
    kept = {f: [] for f in keep}
    metas = []
    for batch, meta in loader:
        for f, kind in encode.items():
            fn = enc.images if kind == "image" else enc.texts
            x = np.asarray(batch[f])
            feats[f].append(fn(x.reshape(-1, x.shape[-1]) if kind == "text" and x.ndim > 2 else x))
        for f in keep:
            kept[f].append(np.asarray(batch[f]))
        metas.extend(meta)
    out_f = {f: (np.concatenate(v) if v else np.zeros((0,), np.float32)) for f, v in feats.items()}
    out_k = {f: (np.concatenate(v) if v else np.zeros((0,), np.float32)) for f, v in kept.items()}
    return out_f, out_k, metas


def recall_at_k(ranks: np.ndarray, ks=(1, 5, 10)) -> dict:
    return {f"R@{k}": float((ranks < k).mean()) for k in ks}


def macro_prf(gold: np.ndarray, pred: np.ndarray, num_classes: int) -> dict:
    """Macro precision/recall/F1 over classes present in gold."""
    ps, rs, fs = [], [], []
    for c in range(num_classes):
        tp = int(((pred == c) & (gold == c)).sum())
        fp = int(((pred == c) & (gold != c)).sum())
        fn = int(((pred != c) & (gold == c)).sum())
        if tp + fn == 0:
            continue  # class absent from gold
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn)
        f = 2 * p * r / (p + r) if p + r else 0.0
        ps.append(p)
        rs.append(r)
        fs.append(f)
    return {
        "macro_precision": float(np.mean(ps)) if ps else 0.0,
        "macro_recall": float(np.mean(rs)) if rs else 0.0,
        "macro_f1": float(np.mean(fs)) if fs else 0.0,
    }
