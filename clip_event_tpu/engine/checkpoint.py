"""Checkpoint save/resume (reference `save_model_on_master`,
`engine.py:202-218`, and the resume path `train.py:108-124`).

Layout parity: one checkpoint per epoch under `<ckpt_dir>/<task>/` carrying
{epoch, model: task, state_dict → params, perf, optimizer → opt_state}.
Storage is orbax (async-safe, pytree-native); interop with the torch world
goes through the OpenAI-format converter:

  * `import_initial_checkpoint` reads an OpenAI JIT archive / torch .pth /
    reference training checkpoint into (params, CLIPConfig),
  * `export_torch_checkpoint` writes a reference-loadable .pth.

Under `jax.distributed`, save and restore are COLLECTIVE calls: every
process enters together (orbax barriers internally; the ZeRO moment gather
is an allgather), orbax writes the data once, and only process 0 gets the
path back (the reference rank-0-save contract, engine.py:202-207).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

from clip_event_tpu.models.clip import CLIPConfig
from clip_event_tpu.models.convert import (
    load_torch_checkpoint,
    params_from_state_dict,
    state_dict_from_params,
)

log = logging.getLogger(__name__)


def _ckpt_path(ckpt_dir: str, task: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), task, f"{task}_{epoch}")


_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until any in-flight async checkpoint write has committed.

    Call before process exit (train.py does) and before reading back a
    checkpoint this process may have just written asynchronously. A no-op
    when no async save was ever issued.
    """
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    ckpt_dir: str,
    task: str,
    epoch: int,
    params: Any,
    opt_state: Any,
    perf: float = 0.0,
    step: int = 0,
    mid_epoch: bool = False,
    async_save: bool = False,
) -> Optional[str]:
    """Save the state; errors are logged, not raised (engine.py:215-218).

    Every process must call this together (the gathers and the orbax save
    are collective); data is written once (orbax primary host) and the path
    is returned on process 0 only — the reference's rank-0-save contract.

    `mid_epoch=True` marks a step-granular save (config `save_steps` /
    `max_steps`): the checkpoint path is the SAME as the epoch's final save
    (a rolling overwrite — the latest state is what crash recovery wants),
    and resume re-enters epoch `epoch` at batch offset derived from `step`
    instead of starting at `epoch + 1`.

    `async_save=True` returns as soon as the state is snapshotted to host
    memory and hands the disk write to orbax's async committer — the train
    loop overlaps the multi-second write of a large checkpoint with the next
    steps. The device→host snapshot itself stays synchronous (the caller may
    donate the state buffers into the very next step), so there is no
    torn-read hazard. `wait_for_saves()` blocks on the commit; issuing
    another save first also waits. Orbax commits atomically (tmp dir +
    rename), so a crash mid-write never leaves a path `latest_checkpoint`
    would pick up.
    """
    def _start_transfer(x):
        # enqueue ALL device→host copies before materializing any: the
        # per-leaf np.asarray below then reads already-arrived buffers
        # instead of serializing one transfer per leaf
        if getattr(x, "is_fully_addressable", True) and hasattr(
            x, "copy_to_host_async"
        ):
            x.copy_to_host_async()
        return x

    def _to_host(x):
        # ZeRO-1 moments can be sharded ACROSS processes (train.py "zero");
        # gather those before the rank-0 numpy save. Fully-addressable
        # arrays (replicated, or sharded within this host) copy directly.
        if getattr(x, "is_fully_addressable", True):
            return np.asarray(x)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    # the cross-process gather must run on EVERY process (it's a collective),
    # and so must the orbax save below: its handler runs multihost barriers
    # internally, so a rank-0-gated call deadlocks rank 0 against ranks that
    # never entered (caught by test_two_process_zero_checkpoint_gather).
    # Orbax's own primary-host logic writes the data exactly once.
    jax.tree.map(_start_transfer, (params, opt_state))
    host_params = jax.tree.map(_to_host, params)
    host_opt_state = jax.tree.map(_to_host, opt_state)
    import orbax.checkpoint as ocp

    path = _ckpt_path(ckpt_dir, task, epoch)
    try:
        tree = {
            "params": host_params,
            "opt_state": host_opt_state,
            "step": np.asarray(int(step), np.int32),
        }
        if async_save:
            ckptr = _async_checkpointer()
            ckptr.save(path, tree, force=True)
        else:
            with ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(path, tree, force=True)
        if jax.process_index() != 0:
            return None
        meta = {
            "epoch": epoch,
            "model": task,
            "perf": float(perf),
            "step": int(step),
            "mid_epoch": bool(mid_epoch),
        }
        with open(path + ".meta.json", "w") as fh:
            json.dump(meta, fh)
        log.info("=> %s checkpoint to %s",
                 "scheduled async save of" if async_save else "saved", path)
        return path
    except Exception:
        log.exception("=> error when saving checkpoint!")
        return None


def load_meta(path: str) -> dict:
    """Checkpoint sidecar metadata {epoch, model, perf, step} — readable
    before the optimizer/template needed for a typed restore exist."""
    meta = {"epoch": 0, "model": "", "perf": 0.0, "step": 0, "mid_epoch": False}
    if os.path.exists(path + ".meta.json"):
        meta.update(json.load(open(path + ".meta.json")))
    return meta


def restore_checkpoint(
    path: str,
    params_template: Any = None,
    optimizer: Any = None,
) -> Tuple[Any, Any, dict]:
    """Returns (params, opt_state, meta{epoch, model, perf, step}).

    When `params_template` (a pytree of arrays or ShapeDtypeStructs) and the
    `optimizer` (optax transform) are given, the restore is TYPED: orbax
    restores into the structure of `optimizer.init(params_template)`, so
    optax NamedTuples (ScaleByAdamState, ...) come back as real NamedTuples
    that `optimizer.update` accepts — not the raw lists/dicts a
    template-free restore produces. Always pass them when the opt_state will
    be used to continue training (reference resume: train.py:108-124).

    Under `jax.distributed` this is a COLLECTIVE, like `save_checkpoint`:
    orbax runs multihost barriers inside restore, so every process must call
    it together (which is also what resume semantics want — all ranks load
    the same state). A rank-gated call deadlocks.
    """
    import orbax.checkpoint as ocp

    wait_for_saves()  # the path may be an async save this process issued
    meta = load_meta(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        template = None
        if params_template is not None and optimizer is not None:
            # old checkpoints were saved without the 'step' leaf
            saved_keys = set(ckptr.metadata(path).item_metadata.keys())

            def build(p):
                tree = {"params": p, "opt_state": optimizer.init(p)}
                if "step" in saved_keys:
                    tree["step"] = jax.numpy.zeros((), jax.numpy.int32)
                return tree

            template = jax.eval_shape(build, params_template)
        tree = ckptr.restore(path, item=template) if template is not None else ckptr.restore(path)
    if "step" in tree:
        meta["step"] = int(tree["step"])
    return tree["params"], tree["opt_state"], meta


def latest_checkpoint(ckpt_dir: str, task: str) -> Optional[str]:
    base = os.path.join(os.path.abspath(ckpt_dir), task)
    if not os.path.isdir(base):
        return None
    best = None
    for name in os.listdir(base):
        if name.startswith(task + "_") and not name.endswith(".meta.json"):
            try:
                epoch = int(name.rsplit("_", 1)[1])
            except ValueError:
                continue
            if best is None or epoch > best[0]:
                best = (epoch, os.path.join(base, name))
    return best[1] if best else None


def import_initial_checkpoint(path: str) -> Tuple[Any, CLIPConfig]:
    """Torch-world weights (OpenAI JIT archive / state_dict .pth / reference
    training ckpt) → (params pytree, inferred CLIPConfig)."""
    sd = load_torch_checkpoint(path)
    return params_from_state_dict(sd)


def export_torch_checkpoint(
    path: str, params: Any, cfg: CLIPConfig, epoch: int, task: str, perf: float = 0.0,
    opt_state: Any = None,
) -> None:
    """Write a reference-format .pth so reference tooling can consume our
    checkpoints (requires torch on the host)."""
    import torch

    sd = state_dict_from_params(jax.tree.map(np.asarray, params), cfg)
    torch.save(
        {
            "epoch": epoch,
            "model": task,
            "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            "perf": perf,
            "optimizer": {},
        },
        path,
    )
