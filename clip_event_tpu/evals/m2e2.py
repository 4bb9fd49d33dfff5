"""Zero-shot M2E2 event classification (documented entry `eval_m2e2.py`,
reference README.md:212-215; implementation absent from the snapshot).

Prediction: argmax over cosine similarity between each image embedding and
the per-event-type template embeddings. Reports accuracy + macro P/R/F1.
"""

from __future__ import annotations


from clip_event_tpu.data.common import DataLoader
from clip_event_tpu.data.m2e2 import M2E2Dataset
from clip_event_tpu.evals.common import Encoders, collect_encoded, macro_prf


def evaluate_m2e2(params, cfg, dataset: M2E2Dataset, batch_size: int = 32) -> dict:
    loader = DataLoader(
        dataset, batch_size=min(batch_size, len(dataset)), shuffle=False,
        drop_last=False, num_workers=8,
    )
    enc = Encoders(params, cfg, batch_size=batch_size)
    feats, kept, _ = collect_encoded(
        loader, enc, {"image": "image"}, keep=("event_type_idx",)
    )
    image_feats = feats["image"]  # [N, E]
    cand_feats = enc.texts(dataset.candidate_tokens)  # [T, E]
    logits = image_feats @ cand_feats.T
    pred = logits.argmax(axis=1)
    gold = kept["event_type_idx"]

    metrics = {"accuracy": float((pred == gold).mean()), "num_images": int(len(gold))}
    metrics.update(macro_prf(gold, pred, len(dataset.event_types)))
    return metrics
