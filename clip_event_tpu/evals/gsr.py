"""Zero-shot GSR/SWiG: verb classification + argument grounding
(documented entry `eval_gsr.py`, README.md:216-220).

Verb: image embedding vs the candidate-verb text matrix → top-1/top-5.
Grounding: for each annotated role, a similarity heat-map between the role
description embedding and the ViT grid-token embeddings picks the best
patch window; correct when IoU with the gold box ≥ 0.5
(`utils_image.py:65-73`). This realizes the paper's argument-localization
capability with the grid features the reference exposes via
`encode_image(use_grid=True)` (`model_clip.py:253-256`).

Streaming + device-batched: one pass over the loader; per batch, ONE grid
encode, ONE role-text encode ([b·R, 77]), and fully vectorized heat-map /
IoU scoring — no per-image, per-role host loops, no image accumulation.
Full SWiG (~25k images) holds only [N, E] features in host RAM.
"""

from __future__ import annotations

import jax
import numpy as np

from clip_event_tpu.data.sr import GSRDataset
from clip_event_tpu.evals.common import (
    Encoders,
    eval_loader,
    merge_across_ranks,
    resolve_shard,
)
from clip_event_tpu.models import clip as clip_model
from clip_event_tpu.ops.bbox import iou_batch


def _grid_features_fn(cfg, compute_dtype=None):
    import jax.numpy as jnp

    dtype = compute_dtype or jnp.float32

    @jax.jit
    def fn(params, images):
        feats = clip_model.encode_image(params, cfg, images, use_grid=True, compute_dtype=dtype)
        return clip_model.l2_normalize(feats)

    return fn


def window_boxes(heat: np.ndarray, grid: int, topk: int = 1) -> np.ndarray:
    """Vectorized: [..., G²] heat maps → [..., 4] union bbox of the top-k
    grid cells, in normalized coords."""
    k = min(topk, heat.shape[-1])
    top = np.argpartition(-heat, k - 1, axis=-1)[..., :k]
    rows, cols = top // grid, top % grid
    return np.stack(
        [
            cols.min(axis=-1) / grid,
            rows.min(axis=-1) / grid,
            (cols.max(axis=-1) + 1) / grid,
            (rows.max(axis=-1) + 1) / grid,
        ],
        axis=-1,
    ).astype(np.float32)


def patch_window_bbox(heat: np.ndarray, grid: int, topk: int = 1) -> list:
    """Single-heat-map convenience wrapper around `window_boxes`."""
    return list(window_boxes(heat.reshape(-1), grid, topk))


def _pad_object_boxes(metas_b, b):
    """Per-image detected boxes (ragged) → padded [b, K, 4] + mask."""
    boxes_list = [m.get("object_bboxes", []) or [] for m in metas_b]
    K = max((len(x) for x in boxes_list), default=0)
    if K == 0:
        return None, None
    box_arr = np.zeros((b, K, 4), np.float32)
    box_mask = np.zeros((b, K), np.int32)
    for i, bl in enumerate(boxes_list):
        if bl:
            box_arr[i, : len(bl)] = np.asarray(bl, np.float32)
            box_mask[i, : len(bl)] = 1
    return box_arr, box_mask


def evaluate_gsr(
    params,
    cfg,
    dataset: GSRDataset,
    batch_size: int = 32,
    ground_topk: int = 4,
    iou_threshold: float = 0.5,
    ground_via: str = "grid",
    value_metrics: bool = True,
    rank=None,
    world_size=None,
) -> dict:
    """ground_via: 'grid' predicts a top-k patch-window box from the role→
    grid-token heat map; 'objects' ranks the *detected object boxes* by the
    similarity between the role description and each box's window-pooled
    grid feature (requires `dataset.load_object`) — the reference's
    detected-object channel realized as an eval.

    With `value_metrics` (requires a ViT tower), also reports the standard
    situation-recognition noun metrics — imSitu (Yatskar et al., CVPR 2016)
    defines value / value-all, SWiG (Pratt et al., ECCV 2020) the grounded
    variants:
      * value: fraction of annotated roles whose predicted noun matches the
        gold (majority annotator gloss);
      * value_all: fraction of frames with EVERY annotated role's noun
        correct;
      * grounded_value[_all]: additionally the predicted box must overlap
        the gold box at IoU ≥ `iou_threshold` (roles without a gold box
        need only the noun, per SWiG).
    Zero-shot noun prediction: the predicted box's window-pooled grid
    feature is scored against "An image of {noun}." embeddings over the
    noun glosses observed in the dataset's annotations. Roles with no gold
    noun (empty annotations) are excluded from the noun metrics — a
    zero-shot scorer has no calibrated "empty" prediction (documented
    deviation from imSitu, which requires predicting the empty noun)."""
    import jax.numpy as jnp

    from clip_event_tpu.models.clip import l2_normalize
    from clip_event_tpu.models.local_attention import pool_bbox_features

    do_grounding = cfg.is_vit
    if do_grounding and ground_via == "objects" and not dataset.load_object:
        raise ValueError("ground_via='objects' needs dataset.load_object=True")

    rank, world_size = resolve_shard(rank, world_size)
    loader = eval_loader(dataset, batch_size, rank=rank, world_size=world_size)
    B = loader.batch_size
    enc = Encoders(params, cfg, batch_size=batch_size)
    grid = cfg.grid_size
    grid_fn = _grid_features_fn(cfg) if do_grounding else None

    do_value = value_metrics and do_grounding
    noun_feats = noun_index = None
    if do_value:
        from clip_event_tpu.tokenizer import tokenize

        vocab = sorted(
            {n for inst in dataset.data for n in inst["noun_types"] if n}
        )
        if vocab:
            noun_index = {n: i for i, n in enumerate(vocab)}
            noun_feats = enc.texts(
                tokenize([f"An image of {n}." for n in vocab])
            )  # [V, E]
        else:
            do_value = False

    image_feats, gold_verbs = [], []
    hits, total = 0, 0
    v_hits = v_total = va_hits = va_total = gv_hits = gva_hits = 0
    offset = 0  # local example index, for the wrap-around-padding mask
    for batch, metas_b in loader:
        images = np.asarray(batch["image"])
        b = images.shape[0]
        # examples whose global strided position falls past len(dataset) are
        # the loader's count-equalizing duplicates — exclude them from the
        # streamed grounding counts (per-example arrays are deduped by
        # merge_across_ranks instead)
        genuine = (
            rank + (offset + np.arange(b)) * world_size < len(dataset)
        )  # [b]
        offset += b
        image_feats.append(enc.images(images))
        gold_verbs.append(np.asarray(batch["verb_idx"]))
        if not do_grounding:
            continue

        pad = B - b
        chunk = (
            np.concatenate([images, np.repeat(images[-1:], pad, axis=0)])
            if pad else images
        )
        gfeat = np.asarray(grid_fn(params, chunk))[:b]  # [b, G²+1, E]
        grid_feats = gfeat[:, 1:]  # drop CLS

        role_text = np.asarray(batch["role_text"])  # [b, R, 77]
        R = role_text.shape[1]
        role_feats = enc.texts(role_text.reshape(b * R, -1)).reshape(b, R, -1)
        role_mask = np.asarray(batch["role_mask"]).astype(bool)  # [b, R]
        role_bbox = np.asarray(batch["role_bbox"], np.float32)  # [b, R, 4]
        valid = role_mask & (role_bbox[..., 0] >= 0) & genuine[:, None]

        if ground_via == "objects":
            box_arr, box_mask = _pad_object_boxes(metas_b, b)
            if box_arr is None:
                continue
            box_feats = np.asarray(
                l2_normalize(
                    pool_bbox_features(
                        jnp.asarray(grid_feats), jnp.asarray(box_arr),
                        jnp.asarray(box_mask), grid,
                    ),
                    eps=1e-8,
                )
            )  # [b, K, E]
            scores = np.einsum("bre,bke->brk", role_feats, box_feats)
            scores = np.where(box_mask[:, None, :] > 0, scores, -np.inf)
            pred_boxes = box_arr[np.arange(b)[:, None], scores.argmax(-1)]  # [b, R, 4]
            valid &= box_mask.any(-1)[:, None]
        else:
            heat = np.einsum("bre,bge->brg", role_feats, grid_feats)  # [b, R, G²]
            pred_boxes = window_boxes(heat, grid, ground_topk)  # [b, R, 4]

        ious = iou_batch(pred_boxes, role_bbox)
        hits += int(((ious >= iou_threshold) & valid).sum())
        total += int(valid.sum())

        if do_value:
            # noun prediction from the predicted box's window-pooled grid
            # feature, classified over the observed-noun vocabulary
            pooled = np.asarray(
                l2_normalize(
                    pool_bbox_features(
                        jnp.asarray(grid_feats),
                        jnp.asarray(np.clip(pred_boxes, 0.0, 1.0)),
                        jnp.asarray(role_mask.astype(np.int32)), grid,
                    ),
                    eps=1e-8,
                )
            )  # [b, R, E]
            noun_pred = (pooled @ noun_feats.T).argmax(-1)  # [b, R]
            for i in range(b):
                if not genuine[i]:
                    continue
                nouns = metas_b[i]["noun_types"][:R]
                annotated = [
                    j for j, n in enumerate(nouns) if n and role_mask[i, j]
                ]
                if not annotated:
                    continue
                va_total += 1
                all_ok = all_gok = True
                for j in annotated:
                    ok = bool(noun_pred[i, j] == noun_index[nouns[j]])
                    # grounded: the box must also hit (roles without a gold
                    # box need only the noun, per SWiG)
                    has_box = role_bbox[i, j, 0] >= 0
                    gok = ok and (not has_box or ious[i, j] >= iou_threshold)
                    v_total += 1
                    v_hits += ok
                    gv_hits += gok
                    all_ok &= ok
                    all_gok &= gok
                va_hits += all_ok
                gva_hits += all_gok

    image_feats, gold = merge_across_ranks(
        len(dataset), world_size,
        np.concatenate(image_feats), np.concatenate(gold_verbs),
    )
    if world_size > 1:
        from clip_event_tpu.parallel.collectives import all_gather_objects

        counts = all_gather_objects(
            (hits, total, v_hits, v_total, va_hits, va_total, gv_hits,
             gva_hits)
        )
        (hits, total, v_hits, v_total, va_hits, va_total, gv_hits,
         gva_hits) = tuple(sum(c[k] for c in counts) for k in range(8))
    cand_feats = enc.texts(dataset.candidate_tokens)
    logits = image_feats @ cand_feats.T
    order = np.argsort(-logits, axis=1)
    metrics = {
        "verb_top1": float((order[:, 0] == gold).mean()),
        "verb_top5": float((order[:, :5] == gold[:, None]).any(axis=1).mean()),
        "num_images": int(len(gold)),
    }
    if do_grounding:
        metrics["grounding_acc"] = hits / total if total else 0.0
        metrics["grounded_args"] = total
        metrics["ground_via"] = ground_via
    if do_value:
        metrics["value"] = v_hits / v_total if v_total else 0.0
        metrics["value_all"] = va_hits / va_total if va_total else 0.0
        metrics["grounded_value"] = gv_hits / v_total if v_total else 0.0
        metrics["grounded_value_all"] = (
            gva_hits / va_total if va_total else 0.0
        )
        metrics["value_roles"] = int(v_total)
        metrics["value_frames"] = int(va_total)
    return metrics
