"""Optimizer + LR schedule builders (reference `engine.py:129-175`,
`utils.py:312-416`).

Torch-semantics notes preserved here:
  * `adam` is torch `Adam` with L2-style weight decay (decay added to the
    gradient before the moment updates — not AdamW).
  * `sgd` is torch SGD with classic momentum.
  * The reference constructs epoch-parameterized schedulers but calls
    `.step()` every *batch* (`engine.py:94`). Schedules here are functions of
    the optax step count; `steps_per_epoch=1` reproduces the reference's
    per-step behaviour exactly, a real value gives the documented
    epoch-granular intent.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
import optax


def build_schedule(
    name: str,
    base_lr: float,
    max_epoch: int,
    begin_epoch: int = 0,
    steps_per_epoch: int = 1,
    lr_steps: Optional[Sequence[int]] = None,
    lr_gamma: float = 0.1,
    warmup_epochs: int = 5,
    warmup_factor: float = 0.001,
):
    """Returns an optax-style schedule fn: step → lr (jnp-traceable — the
    step count is a tracer inside the jitted update)."""
    milestones = jnp.asarray(sorted(lr_steps or []) or [np.iinfo(np.int32).max], jnp.float32)

    def epoch_of(step):
        return jnp.asarray(step, jnp.float32) // steps_per_epoch

    def warmup_at(e):
        alpha = e / warmup_epochs
        linear = warmup_factor * (1.0 - alpha) + alpha
        return jnp.where(e < warmup_epochs, linear, 1.0)

    def decay_at(e):
        return lr_gamma ** jnp.sum(milestones <= e).astype(jnp.float32)

    if name == "none":
        return lambda step: base_lr

    if name == "multisteplr":
        return lambda step: base_lr * decay_at(epoch_of(step))

    if name == "cosineannealinglr":
        t_max = max(max_epoch - begin_epoch, 1)
        return lambda step: base_lr * 0.5 * (
            1.0 + jnp.cos(math.pi * jnp.minimum(epoch_of(step), t_max) / t_max)
        )

    if name == "warmup":  # detectron2-style WarmupCosineLR (utils.py:348-386)
        def sched(step):
            e = epoch_of(step) + begin_epoch
            return base_lr * warmup_at(e) * 0.5 * (1.0 + jnp.cos(math.pi * e / max_epoch))

        return sched

    if name == "warmupmultisteplr":  # WarmupMultiStepLR (utils.py:310-345)
        def sched(step):
            e = epoch_of(step) + begin_epoch
            return base_lr * warmup_at(e) * decay_at(e)

        return sched

    raise ValueError(f"invalid lr scheduler {name!r}")


def build_optimizer(
    name: str,
    schedule,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    grad_clip_norm: Optional[float] = 1.0,
    moment_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """Adam/SGD with global-norm clipping (reference clips at 1.0,
    `engine.py:89`). `schedule` may be a float or a step→lr fn.

    `moment_dtype` (TPU-native addition, no reference counterpart): store
    Adam's FIRST moment / SGD's momentum buffer in a reduced dtype
    (`"bfloat16"`), cutting optimizer-state HBM by 25% (Adam) or 50% (SGD).
    Adam's second moment stays f32 — `rsqrt(nu)` amplifies low-order-bit
    loss, and nu's dynamic range (squared grads) is exactly where bf16's
    8-bit mantissa hurts; mu is a smoothed gradient, robust to bf16
    (the update math still runs in f32 — optax casts mu in/out).
    """
    parts = []
    if grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    mu_dtype = jnp.dtype(moment_dtype) if moment_dtype else None

    if name == "adam":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, mu_dtype=mu_dtype))
    elif name == "sgd":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=False,
                                     accumulator_dtype=mu_dtype))
    else:
        raise ValueError(f"invalid optimizer {name!r}")

    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
