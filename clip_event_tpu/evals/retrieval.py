"""Image↔text retrieval eval for COCO / Flickr30k (reference exercised
these via `dataset_coco.py` / `dataset_flicker.py`). Standard protocol:
C captions per image; text→image rank of the paired image; image→text best
rank over the C paired captions. Reports R@1/5/10 both directions."""

from __future__ import annotations

import numpy as np

from clip_event_tpu.data.common import DataLoader
from clip_event_tpu.evals.common import Encoders, collect_encoded, recall_at_k


def evaluate_retrieval(params, cfg, dataset, batch_size: int = 32) -> dict:
    C = dataset.captions_per_image
    loader = DataLoader(
        dataset, batch_size=min(batch_size, len(dataset)), shuffle=False,
        drop_last=False, num_workers=8,
    )
    enc = Encoders(params, cfg, batch_size=batch_size)
    feats, _, _ = collect_encoded(
        loader, enc, {"image": "image", "text": "text"}
    )
    image_feats = feats["image"]  # [N, E]
    text_feats = feats["text"]  # [N·C, E]
    N = image_feats.shape[0]
    sims = text_feats @ image_feats.T  # [N·C, N]

    # text → image
    t2i_order = np.argsort(-sims, axis=1)
    gold_image = np.repeat(np.arange(N), C)
    t2i_ranks = np.argmax(t2i_order == gold_image[:, None], axis=1)

    # image → text: best rank among the C paired captions
    i2t_order = np.argsort(-sims.T, axis=1)  # [N, N·C]
    i2t_ranks = np.empty(N, np.int64)
    for i in range(N):
        paired = set(range(i * C, i * C + C))
        i2t_ranks[i] = next(r for r, t in enumerate(i2t_order[i]) if t in paired)

    out = {f"t2i_{k}": v for k, v in recall_at_k(t2i_ranks).items()}
    out.update({f"i2t_{k}": v for k, v in recall_at_k(i2t_ranks).items()})
    out["num_images"] = int(N)
    return out
