"""Zero-shot M2E2 event classification (documented entry `eval_m2e2.py`,
reference README.md:212-215; implementation absent from the snapshot).

Prediction: argmax over cosine similarity between each image embedding and
the per-event-type template embeddings. Reports accuracy + macro P/R/F1.
"""

from __future__ import annotations


from clip_event_tpu.data.m2e2 import M2E2Dataset
from clip_event_tpu.evals.common import (
    Encoders,
    collect_encoded,
    eval_loader,
    macro_prf,
    merge_across_ranks,
    resolve_shard,
)


def evaluate_m2e2(params, cfg, dataset: M2E2Dataset, batch_size: int = 32,
                  rank=None, world_size=None) -> dict:
    rank, world_size = resolve_shard(rank, world_size)
    loader = eval_loader(dataset, batch_size, rank=rank, world_size=world_size)
    enc = Encoders(params, cfg, batch_size=batch_size)
    feats, kept, _ = collect_encoded(
        loader, enc, {"image": "image"}, keep=("event_type_idx",)
    )
    image_feats, kept["event_type_idx"] = merge_across_ranks(
        len(dataset), world_size, feats["image"], kept["event_type_idx"]
    )  # [N, E]
    cand_feats = enc.texts(dataset.candidate_tokens)  # [T, E]
    logits = image_feats @ cand_feats.T
    pred = logits.argmax(axis=1)
    gold = kept["event_type_idx"]

    metrics = {"accuracy": float((pred == gold).mean()), "num_images": int(len(gold))}
    metrics.update(macro_prf(gold, pred, len(dataset.event_types)))
    return metrics
