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
    if "text_unique" in batch:
        # dedupe-encode: the loader emitted the batch's unique token rows
        # (static cap, zero-padded) + the inverse index (data/dedupe.py).
        # Encoding uniques and gathering back is exact — same features, same
        # loss, same parameter gradients (the gather VJP scatter-adds the
        # duplicates' cotangents) — at encode cost ∝ unique count.
        image_features = clip_model.l2_normalize(
            clip_model.encode_image(
                params, cfg, batch["image"], compute_dtype=compute_dtype, remat=remat
            )
        )
        text_features = clip_model.l2_normalize(
            clip_model.encode_text(
                params, cfg, batch["text_unique"], compute_dtype=compute_dtype,
                remat=remat,
            )
        )[batch["text_inverse"]]
        logits_per_image, logits_per_text = clip_model.contrastive_logits(
            params, image_features, text_features, overbatch
        )
    else:
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
                batch.get("bbox_desc_text"),
                label_tokens=batch.get("bbox_label_text"),
                train_arg=multiattention,
                pooling=multiattention_pooling,
                compute_dtype=compute_dtype,
                remat=remat,
                # dedupe-encode channel (role texts draw from a tiny label
                # vocabulary — the biggest win of the dedupe path)
                desc_unique=batch.get("bbox_desc_unique"),
                desc_inverse=batch.get("bbox_desc_inverse"),
                label_unique=batch.get("bbox_label_unique"),
                label_inverse=batch.get("bbox_label_inverse"),
            )
        )
    total = sum(loss_dict.values())
    return total, loss_dict


def _apply_update(
    state: TrainState,
    grads,
    total: jnp.ndarray,
    loss_dict: Dict[str, jnp.ndarray],
    optimizer: optax.GradientTransformation,
    state_shardings: Optional[TrainState] = None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer update + the non-finite freeze, shared by every step
    variant (single, K-fused, gradient-accumulated).

    `state_shardings` (a TrainState of NamedSharding pytrees) pins the output
    state's layout to the input's. Needed under ZeRO-1 moment sharding:
    without the constraint GSPMD is free to resolve the replicated-params +
    dp-sharded-updates sum either way, and dp-sharded *params* out of one
    step would silently re-layout every subsequent step's forward.
    """
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
    if state_shardings is not None:
        new_params = jax.lax.with_sharding_constraint(
            new_params, state_shardings.params
        )
        new_opt_state = jax.lax.with_sharding_constraint(
            new_opt_state, state_shardings.opt_state
        )
    # pre-clip global gradient norm — the standard training-health signal
    # (the reference clips at 1.0 but never logs the norm, engine.py:89);
    # one fused reduction over the grads, <0.2% of the step
    metrics = {
        "loss": total,
        "finite": finite,
        "grad_norm": optax.global_norm(grads),
        **loss_dict,
    }
    return TrainState(new_params, new_opt_state, state.step + 1), metrics


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
    state_shardings: Optional[TrainState] = None,
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
        return _apply_update(
            state, grads, total, loss_dict, optimizer,
            state_shardings=state_shardings,
        )

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
    state_shardings = step_kwargs.get("state_shardings")
    step_fn = _build_step_fn(cfg, optimizer, **step_kwargs)

    def _pin(state: TrainState) -> TrainState:
        # GSPMD does not reliably honor the per-step constraint inside a
        # while-loop body: without pinning the carry at the scan boundary it
        # re-lays-out the whole state (measured: replicated params came back
        # dp-sharded), which churns layouts and recompiles the next dispatch.
        if state_shardings is None:
            return state
        # only params/opt_state: `step` is a scalar whose sharding template
        # may be single-device (same split _apply_update makes)
        return state._replace(
            params=jax.lax.with_sharding_constraint(
                state.params, state_shardings.params
            ),
            opt_state=jax.lax.with_sharding_constraint(
                state.opt_state, state_shardings.opt_state
            ),
        )

    def many(state: TrainState, batches):
        if batches is None:
            raise ValueError("pass a [K, ...] batch stack or a single batch")
        stacked = jax.tree.leaves(batches)[0].shape[0] == num_steps

        def body(s, xs):
            b = xs if stacked else batches
            return step_fn(s, b)

        xs = batches if stacked else None
        final, ys = jax.lax.scan(body, _pin(state), xs, length=num_steps)
        return _pin(final), ys

    def many_fixed_batch(state: TrainState, batch):
        def body(s, _):
            return step_fn(s, batch)

        final, ys = jax.lax.scan(body, _pin(state), None, length=num_steps)
        return _pin(final), ys

    return (
        jax.jit(many, donate_argnums=(0,) if donate else ()),
        jax.jit(many_fixed_batch, donate_argnums=(0,) if donate else ()),
    )


def make_accum_step(
    cfg: CLIPConfig,
    optimizer: optax.GradientTransformation,
    accum_steps: int,
    loss_type: str = "ce",
    overbatch: bool = True,
    alignment: bool = False,
    use_pallas_ot: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = True,
    multiattention: Optional[str] = None,
    multiattention_pooling: str = "mean",
    alignment_chunks: int = 1,
    donate: bool = True,
    state_shardings: Optional[TrainState] = None,
):
    """ONE optimizer step from K microbatches (gradient accumulation).

    TPU-native addition (the reference has no accumulation path). `batches`
    leaves carry a leading [K, B_micro, ...] axis; each microbatch's
    forward+backward runs inside a `lax.scan` body, so its activations are
    freed before the next begins — peak memory is one microbatch's step plus
    a single gradient pytree. Gradients and loss metrics are K-averaged, then
    ONE `optimizer.update` applies (so clip-by-global-norm and the LR
    schedule see the averaged gradient, exactly as a big-batch step would).

    Semantics note: InfoNCE negatives stay *within* each microbatch — this
    matches big-batch training's optimizer-step granularity and gradient
    noise at small-batch memory, but the contrastive loss itself is not the
    K·B-batch loss (the logit matrix is batch-coupled).
    """

    def grad_fn(params, micro):
        return jax.value_and_grad(loss_fn, has_aux=True)(
            params, micro, cfg, loss_type, overbatch, alignment,
            use_pallas_ot, compute_dtype, remat, multiattention,
            multiattention_pooling, alignment_chunks,
        )

    def accum_step(state: TrainState, batches):
        lead = jax.tree.leaves(batches)[0].shape[0]
        if lead != accum_steps:
            raise ValueError(
                f"batch stack has leading dim {lead}, expected "
                f"accum_steps={accum_steps} (gradients would mis-scale)"
            )
        # seed the carry structure (gradient pytree + the full metrics dict,
        # whichever loss branches are on) from abstract shapes only — peeling
        # a real first microbatch would duplicate the whole fwd+bwd graph in
        # the compiled program
        first = jax.tree.map(lambda x: x[0], batches)
        (total_s, loss_dict_s), grads_s = jax.eval_shape(grad_fn, state.params, first)
        zeros = lambda s: jnp.zeros(s.shape, s.dtype)  # noqa: E731
        gsum0 = jax.tree.map(zeros, grads_s)
        msum0 = {"loss": zeros(total_s), **jax.tree.map(zeros, loss_dict_s)}

        def body(carry, micro):
            gsum, msum = carry
            (total, loss_dict), grads = grad_fn(state.params, micro)
            gsum = jax.tree.map(jnp.add, gsum, grads)
            msum = jax.tree.map(jnp.add, msum, {"loss": total, **loss_dict})
            return (gsum, msum), None

        (gsum, msum), _ = jax.lax.scan(body, (gsum0, msum0), batches)
        inv = 1.0 / accum_steps
        grads = jax.tree.map(lambda g: (g * inv).astype(g.dtype), gsum)
        metrics_avg = {k: v * inv for k, v in msum.items()}
        total = metrics_avg.pop("loss")
        return _apply_update(
            state, grads, total, metrics_avg, optimizer,
            state_shardings=state_shardings,
        )

    return jax.jit(accum_step, donate_argnums=(0,) if donate else ())


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
