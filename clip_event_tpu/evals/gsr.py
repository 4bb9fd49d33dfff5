"""Zero-shot GSR/SWiG: verb classification + argument grounding
(documented entry `eval_gsr.py`, README.md:216-220).

Verb: image embedding vs the candidate-verb text matrix → top-1/top-5.
Grounding: for each annotated role, a similarity heat-map between the role
description embedding and the ViT grid-token embeddings picks the best
patch window; correct when IoU with the gold box ≥ 0.5
(`utils_image.py:65-73`). This realizes the paper's argument-localization
capability with the grid features the reference exposes via
`encode_image(use_grid=True)` (`model_clip.py:253-256`).
"""

from __future__ import annotations

import jax
import numpy as np

from clip_event_tpu.data.common import DataLoader
from clip_event_tpu.data.sr import GSRDataset
from clip_event_tpu.evals.common import Encoders, collect
from clip_event_tpu.models import clip as clip_model
from clip_event_tpu.ops.bbox import grounding_correct


def _grid_features_fn(cfg, compute_dtype=None):
    import jax.numpy as jnp

    dtype = compute_dtype or jnp.float32

    @jax.jit
    def fn(params, images):
        feats = clip_model.encode_image(params, cfg, images, use_grid=True, compute_dtype=dtype)
        return clip_model.l2_normalize(feats)

    return fn


def patch_window_bbox(heat: np.ndarray, grid: int, topk: int = 1) -> list:
    """Top-k grid cells → union bbox in normalized coords."""
    flat = heat.reshape(-1)
    top = np.argsort(flat)[::-1][:topk]
    rows, cols = top // grid, top % grid
    x0, x1 = cols.min() / grid, (cols.max() + 1) / grid
    y0, y1 = rows.min() / grid, (rows.max() + 1) / grid
    return [x0, y0, x1, y1]


def evaluate_gsr(
    params,
    cfg,
    dataset: GSRDataset,
    batch_size: int = 32,
    ground_topk: int = 4,
    iou_threshold: float = 0.5,
    ground_via: str = "grid",
) -> dict:
    """ground_via: 'grid' predicts a top-k patch-window box from the role→
    grid-token heat map; 'objects' ranks the *detected object boxes* by the
    similarity between the role description and each box's window-pooled
    grid feature (requires `dataset.load_object`) — the reference's
    detected-object channel realized as an eval."""
    loader = DataLoader(
        dataset, batch_size=min(batch_size, len(dataset)), shuffle=False,
        drop_last=False, num_workers=8,
    )
    enc = Encoders(params, cfg, batch_size=batch_size)
    tensors, metas = collect(loader, ("image", "verb_idx", "role_text", "role_mask", "role_bbox"))

    # ---- verb classification
    image_feats = enc.images(tensors["image"])
    cand_feats = enc.texts(dataset.candidate_tokens)
    logits = image_feats @ cand_feats.T
    order = np.argsort(-logits, axis=1)
    gold = tensors["verb_idx"]
    top1 = float((order[:, 0] == gold).mean())
    top5 = float((order[:, :5] == gold[:, None]).any(axis=1).mean())

    metrics = {
        "verb_top1": top1,
        "verb_top5": top5,
        "num_images": int(len(gold)),
    }

    # ---- argument grounding via grid-token similarity
    if cfg.is_vit:
        if ground_via == "objects" and not dataset.load_object:
            raise ValueError("ground_via='objects' needs dataset.load_object=True")
        grid = cfg.grid_size
        grid_fn = _grid_features_fn(cfg)
        hits, total = 0, 0
        B = batch_size
        images = tensors["image"]
        for start in range(0, images.shape[0], B):
            chunk = images[start : start + B]
            pad = B - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
            gfeat = np.asarray(grid_fn(params, chunk))[: B - pad]  # [b, G²+1, E]
            for i in range(gfeat.shape[0]):
                idx = start + i
                mask = tensors["role_mask"][idx]
                n = int(mask.sum())
                if n == 0:
                    continue
                role_feats = enc.texts(tensors["role_text"][idx][:n])  # [n, E]

                if ground_via == "objects":
                    boxes = metas[idx].get("object_bboxes", [])
                    if not boxes:
                        continue
                    import jax.numpy as jnp

                    from clip_event_tpu.models.clip import l2_normalize
                    from clip_event_tpu.models.local_attention import pool_bbox_features

                    box_arr = np.asarray(boxes, np.float32)[None]  # [1, K, 4]
                    box_feats = np.asarray(
                        l2_normalize(
                            pool_bbox_features(
                                jnp.asarray(gfeat[i : i + 1, 1:]),
                                jnp.asarray(box_arr),
                                jnp.ones((1, box_arr.shape[1]), jnp.int32),
                                grid,
                            ),
                            eps=1e-8,
                        )
                    )[0]  # [K, E]
                    scores = role_feats @ box_feats.T  # [n, K]
                    for r in range(n):
                        gold_box = tensors["role_bbox"][idx][r]
                        if gold_box[0] < 0:
                            continue
                        pred_box = boxes[int(scores[r].argmax())]
                        ok, _ = grounding_correct([gold_box], [pred_box], iou_threshold)
                        hits += ok
                        total += 1
                else:
                    heat = role_feats @ gfeat[i, 1:].T  # [n, G²]
                    for r in range(n):
                        gold_box = tensors["role_bbox"][idx][r]
                        if gold_box[0] < 0:
                            continue
                        pred_box = patch_window_bbox(heat[r].reshape(grid, grid), grid, ground_topk)
                        ok, _ = grounding_correct([gold_box], [pred_box], iou_threshold)
                        hits += ok
                        total += 1
        metrics["grounding_acc"] = hits / total if total else 0.0
        metrics["grounded_args"] = total
        metrics["ground_via"] = ground_via
    return metrics
