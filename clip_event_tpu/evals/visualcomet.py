"""Zero-shot VisualCOMET inference ranking (documented entry
`eval_visualcomet.py`, README.md:225-229). For each image, rank the pool of
inference texts; the gold rank is the best-ranked gold inference. Reports
R@1/5/10 and mean rank."""

from __future__ import annotations

import numpy as np

from clip_event_tpu.data.common import DataLoader
from clip_event_tpu.data.visualcomet import VisualCOMETDataset
from clip_event_tpu.evals.common import Encoders, collect_encoded, recall_at_k


def evaluate_visualcomet(params, cfg, dataset: VisualCOMETDataset, batch_size: int = 32) -> dict:
    loader = DataLoader(
        dataset, batch_size=min(batch_size, len(dataset)), shuffle=False,
        drop_last=False, num_workers=8,
    )
    enc = Encoders(params, cfg, batch_size=batch_size)
    feats, _, metas = collect_encoded(loader, enc, {"image": "image"})
    image_feats = feats["image"]
    cand_feats = enc.texts(dataset.candidate_tokens)
    logits = image_feats @ cand_feats.T  # [N, C]
    order = np.argsort(-logits, axis=1)

    ranks = []
    for i, meta in enumerate(metas):
        gold = set(meta["gold_ids"])
        rank = next(r for r, c in enumerate(order[i]) if c in gold)
        ranks.append(rank)
    ranks = np.asarray(ranks)
    out = recall_at_k(ranks)
    out["mean_rank"] = float(ranks.mean() + 1)
    out["num_images"] = int(len(ranks))
    out["num_candidates"] = int(len(dataset.candidates))
    return out
