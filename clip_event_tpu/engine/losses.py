"""Contrastive criteria (reference `CriterionContrastive`, `model_clip.py:620-662`).

Text-side loss is always cross-entropy over the batch, restricted to the
positive-description rows via a static `index_pos` gather. Image-side loss is
CE / BCE / KL per config. All reductions match torch defaults (CE: mean over
rows; BCEWithLogits: mean over elements).

KL note: the reference's KL branch is latently broken (it feeds raw logits to
`nn.KLDivLoss` and its label constructor never ran, `dataset_voa.py:642`).
Here KL is implemented as proper KL(target ‖ softmax(logits)) with row-
normalized soft targets — the documented capability, not the broken code.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

LOSS_TYPES = ("ce", "bce", "kl")


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE with integer labels (torch `nn.CrossEntropyLoss` semantics)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)
    return -picked.mean()


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean-over-elements binary CE (torch `nn.BCEWithLogitsLoss`)."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    # numerically stable: max(x,0) - x*t + log(1+exp(-|x|))
    return (jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))).mean()


def kl_divergence(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """KL(target ‖ softmax(logits)), batch-mean. Targets are soft labels."""
    t = targets.astype(jnp.float32)
    t = t / jnp.maximum(t.sum(axis=-1, keepdims=True), 1e-8)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_row = jnp.where(t > 0, t * (jnp.log(jnp.maximum(t, 1e-20)) - logp), 0.0).sum(-1)
    return per_row.mean()


def contrastive_loss(
    logits_per_image: jnp.ndarray,
    logits_per_text: jnp.ndarray,
    labels_per_image: jnp.ndarray,
    labels_per_text: jnp.ndarray,
    index_pos: jnp.ndarray,
    loss_type: str = "ce",
) -> Dict[str, jnp.ndarray]:
    """Returns {'loss_i', 'loss_t'} like the reference criterion.

    index_pos: static-shape int array of positive-description row indices
    into the flattened text batch (`index_description_pos`,
    `dataset_voa.py:659-663`).
    """
    if loss_type == "ce":
        loss_i = cross_entropy(logits_per_image, labels_per_image)
    elif loss_type == "bce":
        loss_i = bce_with_logits(logits_per_image, labels_per_image)
    elif loss_type == "kl":
        loss_i = kl_divergence(logits_per_image, labels_per_image)
    else:
        raise ValueError(f"invalid contrastive loss {loss_type!r}")

    pos_logits = jnp.take(logits_per_text, index_pos, axis=0)
    pos_labels = jnp.take(labels_per_text, index_pos, axis=0)
    loss_t = cross_entropy(pos_logits, pos_labels)
    return {"loss_i": loss_i, "loss_t": loss_t}
