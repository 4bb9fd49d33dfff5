"""Event/argument local attention over ViT grid tokens ("multiattention").

The reference plumbs a `multiattention` flag that nothing consumes
(`model_clip.py:343-346`); the closest implemented relative is the
bbox-grid contrastive path in `CLIP.forward(train_arg=...)`
(`model_clip.py:423-488`), which loops in Python over images and boxes,
calls an undefined `self.loss_func`, and is never reached from the trainer.
This module implements the documented capability TPU-first:

  * bbox → patch-window mapping (floor/ceil, `utils_image.py:28-32`) done as
    a broadcasted comparison against the grid — one [B, R, G²] 0/1 tensor,
    no host loops, static shapes;
  * window pooling of grid tokens per box: `mean` (reference semantics,
    `model_clip.py:442`) or `attention` (CLS-token query attends over the
    window — the "local attention head");
  * per-image InfoNCE between box features and role-description features,
    with the `desc` / `desc_type` / `desc_type_text` contrast modes
    (`model_clip.py:447-488`): desc_type adds box↔role-type-label terms,
    desc_type_text adds a description↔label term.

Loss reduction matches the reference: CE averaged over an image's valid
boxes, summed over images.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from clip_event_tpu.models import clip as clip_model
from clip_event_tpu.models.clip import CLIPConfig, l2_normalize

TRAIN_ARGS = ("desc", "desc_type", "desc_type_text")


def bbox_window_weights(bboxes: jnp.ndarray, mask: jnp.ndarray, grid: int) -> jnp.ndarray:
    """Normalized boxes [B, R, 4] (xyxy) + validity mask [B, R] →
    0/1 window membership [B, R, G²] over row-major grid cells."""
    gx = jnp.arange(grid, dtype=jnp.float32)
    # cell (row=gy, col=gx); window: floor(min·G) ≤ idx < ceil(max·G)
    x_lo = jnp.floor(bboxes[..., 0] * grid)[..., None]  # [B, R, 1]
    y_lo = jnp.floor(bboxes[..., 1] * grid)[..., None]
    x_hi = jnp.ceil(bboxes[..., 2] * grid)[..., None]
    y_hi = jnp.ceil(bboxes[..., 3] * grid)[..., None]
    in_x = (gx >= x_lo) & (gx < x_hi)  # [B, R, G]
    in_y = (gx >= y_lo) & (gx < y_hi)
    window = in_y[..., :, None] & in_x[..., None, :]  # [B, R, G(y), G(x)]
    window = window.reshape(window.shape[0], window.shape[1], grid * grid)
    return window.astype(jnp.float32) * mask[..., None].astype(jnp.float32)


def pool_bbox_features(
    grid_feats: jnp.ndarray,  # [B, G², D] (ViT tokens sans CLS)
    bboxes: jnp.ndarray,  # [B, R, 4]
    mask: jnp.ndarray,  # [B, R]
    grid: int,
    mode: str = "mean",
    cls_feats: Optional[jnp.ndarray] = None,  # [B, D] for attention mode
) -> jnp.ndarray:
    """[B, R, D] pooled box features."""
    weights = bbox_window_weights(bboxes, mask, grid)  # [B, R, G²]
    if mode == "mean":
        counts = jnp.maximum(weights.sum(-1, keepdims=True), 1.0)
        return jnp.einsum(
            "brg,bgd->brd", weights / counts, grid_feats,
            preferred_element_type=jnp.float32,
        ).astype(grid_feats.dtype)
    if mode == "attention":
        assert cls_feats is not None, "attention pooling needs the CLS query"
        d = grid_feats.shape[-1]
        logits = jnp.einsum(
            "bd,bgd->bg", cls_feats * d**-0.5, grid_feats,
            preferred_element_type=jnp.float32,
        )[:, None, :]  # [B, 1, G²] shared query scores
        logits = jnp.where(weights > 0, logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = jnp.where(weights > 0, attn, 0.0)  # empty windows → all zeros
        return jnp.einsum(
            "brg,bgd->brd", attn, grid_feats, preferred_element_type=jnp.float32
        ).astype(grid_feats.dtype)
    raise ValueError(f"unknown pooling mode {mode!r}")


def _masked_infonce(
    a: jnp.ndarray,  # [B, R, E] normalized
    b: jnp.ndarray,  # [B, R, E] normalized
    mask: jnp.ndarray,  # [B, R]
    scale: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image diagonal-label CE both directions, row-mean over valid
    rows, summed over images. Returns (loss_a→b, loss_b→a)."""
    logits = scale * jnp.einsum("bre,bse->brs", a, b, preferred_element_type=jnp.float32)
    valid = mask.astype(jnp.float32)
    col_bias = jnp.where(mask[:, None, :] > 0, 0.0, -1e9)
    logits = logits + col_bias

    def ce(lg):
        logp = jax.nn.log_softmax(lg, axis=-1)
        diag = jnp.diagonal(logp, axis1=1, axis2=2)  # [B, R]
        per_image = -(diag * valid).sum(-1) / jnp.maximum(valid.sum(-1), 1.0)
        has_rows = (valid.sum(-1) > 0).astype(jnp.float32)
        return (per_image * has_rows).sum()

    return ce(logits), ce(jnp.swapaxes(logits, 1, 2))


def local_attention_loss(
    params: dict,
    cfg: CLIPConfig,
    images: jnp.ndarray,  # [B, H, W, 3]
    bboxes: jnp.ndarray,  # [B, R, 4] normalized xyxy
    bbox_mask: jnp.ndarray,  # [B, R]
    desc_tokens: Optional[jnp.ndarray] = None,  # [B, R, 77] role descriptions
    label_tokens: Optional[jnp.ndarray] = None,  # [B, R, 77] role-type labels
    train_arg: str = "desc",
    pooling: str = "mean",
    compute_dtype=jnp.float32,
    remat: bool = False,
    # dedupe-encode alternative to desc_tokens/label_tokens (data/dedupe.py):
    # unique token rows [U, 77] + inverse index [B·R]. Role descriptions and
    # especially role-TYPE labels draw from a small label vocabulary, so a
    # B=256·R=8 batch's 2,048 text encodes collapse to U≈the vocab size —
    # exact for loss and gradients (the gather VJP scatter-adds duplicates).
    desc_unique: Optional[jnp.ndarray] = None,
    desc_inverse: Optional[jnp.ndarray] = None,
    label_unique: Optional[jnp.ndarray] = None,
    label_inverse: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Returns {'loss_bbox', 'loss_arg'} (reference `loss_per_bbox`,
    `loss_per_arg`, `model_clip.py:430-488`)."""
    if train_arg not in TRAIN_ARGS:
        raise ValueError(f"train_arg must be one of {TRAIN_ARGS}")
    assert cfg.is_vit, "local attention requires the ViT tower's grid tokens"
    if desc_tokens is None and desc_unique is None:
        raise ValueError("need desc_tokens or desc_unique+desc_inverse")

    B, R = bbox_mask.shape[:2]
    grid = cfg.grid_size
    tokens = clip_model.encode_image(
        params, cfg, images, use_grid=True, compute_dtype=compute_dtype, remat=remat
    )  # [B, G²+1, E]
    cls_feats, grid_feats = tokens[:, 0], tokens[:, 1:]

    bbox_feats = pool_bbox_features(
        grid_feats, bboxes, bbox_mask, grid, mode=pooling, cls_feats=cls_feats
    )
    # masked boxes pool to all-zeros; normalizing them yields NaN *gradients*
    # (d‖x‖ at 0), so swap in a safe vector before the norm and zero after
    # (standard double-where)
    m = bbox_mask[..., None].astype(bool)
    safe = jnp.where(m, bbox_feats, jnp.ones_like(bbox_feats))
    bbox_feats = jnp.where(m, l2_normalize(safe), 0.0)

    def encode_role_texts(tokens, unique, inverse):
        """[B, R, S] (or deduped [U, S] + [B·R]) → normalized [B, R, E]."""
        if unique is not None:
            feats = l2_normalize(
                clip_model.encode_text(
                    params, cfg, unique, compute_dtype=compute_dtype, remat=remat
                )
            )[inverse]
        else:
            feats = l2_normalize(
                clip_model.encode_text(
                    params, cfg, tokens.reshape(B * R, -1),
                    compute_dtype=compute_dtype, remat=remat,
                )
            )
        return feats.reshape(B, R, -1)

    desc_feats = encode_role_texts(desc_tokens, desc_unique, desc_inverse)

    scale = jnp.exp(params["logit_scale"]).astype(jnp.float32)
    loss_bbox, loss_arg = _masked_infonce(bbox_feats, desc_feats, bbox_mask, scale)

    if train_arg.startswith("desc_type"):
        assert label_tokens is not None or label_unique is not None, (
            "desc_type modes need label tokens"
        )
        label_feats = encode_role_texts(label_tokens, label_unique, label_inverse)
        lb, la = _masked_infonce(bbox_feats, label_feats, bbox_mask, scale)
        loss_bbox = loss_bbox + lb
        loss_arg = loss_arg + la
        if train_arg.startswith("desc_type_text"):
            dl, _ = _masked_infonce(desc_feats, label_feats, bbox_mask, scale)
            loss_arg = loss_arg + dl

    return {"loss_bbox": loss_bbox, "loss_arg": loss_arg}
