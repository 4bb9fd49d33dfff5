"""The pjit-compiled training step (reference hot loop, `engine.py:16-112`).

One fused XLA program per step: forward (image + text towers), contrastive
loss, optional OT alignment branch (object/entity re-encode + IPOT), backward,
global-norm clip, optimizer update. Under a `dp` mesh with batch-sharded
inputs and replicated params, GSPMD inserts the ICI collectives (feature
all-gather for over-batch InfoNCE, gradient psum) automatically — there is no
DDP wrapper, no `cuda.synchronize`, no per-step host sync.

The NaN abort (`engine.py:79-82`) becomes a `finite` flag in the returned
metrics that the host loop checks without forcing extra device syncs.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from clip_event_tpu.engine.losses import contrastive_loss
from clip_event_tpu.models import clip as clip_model
from clip_event_tpu.models.clip import CLIPConfig
from clip_event_tpu.ops.ot import alignment_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def create_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def loss_fn(
    params,
    batch: Dict[str, jnp.ndarray],
    cfg: CLIPConfig,
    loss_type: str,
    overbatch: bool,
    alignment: bool,
    use_pallas_ot: bool,
    compute_dtype,
    remat: bool = False,
    multiattention: Optional[str] = None,
    multiattention_pooling: str = "mean",
    alignment_chunks: int = 1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    logits_per_image, logits_per_text = clip_model.forward(
        params,
        cfg,
        batch["image"],
        batch["text"],
        overbatch=overbatch,
        compute_dtype=compute_dtype,
        remat=remat,
    )
    loss_dict = contrastive_loss(
        logits_per_image,
        logits_per_text,
        batch["labels_per_image"],
        batch["labels_per_text"],
        batch["index_pos"],
        loss_type=loss_type,
    )
    if alignment:
        object_feats, entity_feats = clip_model.sim_entity(
            params, cfg, batch["object_image"], batch["entity_text"],
            compute_dtype=compute_dtype, remat=remat,
            chunks=alignment_chunks,
        )
        loss_dict["loss_ot"] = alignment_loss(
            entity_feats,
            object_feats,
            batch["entity_mask"],
            batch["object_mask"],
            use_pallas=use_pallas_ot,
        )
    if multiattention:
        from clip_event_tpu.models.local_attention import local_attention_loss

        loss_dict.update(
            local_attention_loss(
                params,
                cfg,
                batch["image"],
                batch["bbox"],
                batch["bbox_mask"],
                batch["bbox_desc_text"],
                label_tokens=batch.get("bbox_label_text"),
                train_arg=multiattention,
                pooling=multiattention_pooling,
                compute_dtype=compute_dtype,
                remat=remat,
            )
        )
    total = sum(loss_dict.values())
    return total, loss_dict


def _build_step_fn(
    cfg: CLIPConfig,
    optimizer: optax.GradientTransformation,
    loss_type: str = "ce",
    overbatch: bool = True,
    alignment: bool = False,
    use_pallas_ot: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = True,
    multiattention: Optional[str] = None,
    multiattention_pooling: str = "mean",
    alignment_chunks: int = 1,
):
    """The ONE step function both dispatch modes share: the K-steps-fused
    path must carry the identical loss surface (alignment, multiattention)
    and metrics dict as single-step dispatch."""

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        (total, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, cfg, loss_type, overbatch, alignment,
            use_pallas_ot, compute_dtype, remat, multiattention,
            multiattention_pooling, alignment_chunks,
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        finite = jnp.isfinite(total)
        # freeze the update if the loss went non-finite so the host can abort
        # from an intact state (reference exits the process, engine.py:79-82)
        new_params, new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            (new_params, new_opt_state),
            (state.params, state.opt_state),
        )
        metrics = {"loss": total, "finite": finite, **loss_dict}
        return TrainState(new_params, new_opt_state, state.step + 1), metrics

    return step_fn


def make_train_step(
    cfg: CLIPConfig,
    optimizer: optax.GradientTransformation,
    donate: bool = True,
    **step_kwargs,
):
    """Returns jitted `train_step(state, batch) -> (state, metrics)`."""
    step_fn = _build_step_fn(cfg, optimizer, **step_kwargs)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_multi_step(
    cfg: CLIPConfig,
    optimizer: optax.GradientTransformation,
    num_steps: int,
    **step_kwargs,
):
    """K training steps fused into ONE device dispatch via lax.scan.

    Used for benchmarking (amortizes host→device dispatch latency away) and
    for high-throughput training on prefetched batch stacks: `batches` is a
    pytree whose leaves have a leading [K, ...] axis. Runs the same step
    function as `make_train_step` (full loss surface, full metrics dict —
    each metric comes back stacked [K]).
    """
    donate = step_kwargs.pop("donate", True)
    step_fn = _build_step_fn(cfg, optimizer, **step_kwargs)

    def many(state: TrainState, batches):
        if batches is None:
            raise ValueError("pass a [K, ...] batch stack or a single batch")
        stacked = jax.tree.leaves(batches)[0].shape[0] == num_steps

        def body(s, xs):
            b = xs if stacked else batches
            return step_fn(s, b)

        xs = batches if stacked else None
        return jax.lax.scan(body, state, xs, length=num_steps)

    def many_fixed_batch(state: TrainState, batch):
        def body(s, _):
            return step_fn(s, batch)

        return jax.lax.scan(body, state, None, length=num_steps)

    return (
        jax.jit(many, donate_argnums=(0,) if donate else ()),
        jax.jit(many_fixed_batch, donate_argnums=(0,) if donate else ()),
    )


def make_eval_encoders(cfg: CLIPConfig, compute_dtype=jnp.float32):
    """Jitted normalized encoders for zero-shot eval / retrieval."""

    @jax.jit
    def image_features(params, images):
        return clip_model.l2_normalize(
            clip_model.encode_image(params, cfg, images, compute_dtype=compute_dtype)
        )

    @jax.jit
    def text_features(params, tokens):
        return clip_model.l2_normalize(
            clip_model.encode_text(params, cfg, tokens, compute_dtype=compute_dtype)
        )

    return image_features, text_features
