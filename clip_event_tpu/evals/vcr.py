"""Zero-shot VCR: 4-choice answer/rationale selection (documented entry
`eval_vcr.py`, README.md:221-224). Prediction = argmax over the 4 choice
similarities per image (`dataset_vcr.py:148-152`)."""

from __future__ import annotations

import numpy as np

from clip_event_tpu.data.common import DataLoader
from clip_event_tpu.data.vcr import NUM_CHOICES, VCRDataset
from clip_event_tpu.evals.common import Encoders, collect_encoded


def evaluate_vcr(params, cfg, dataset: VCRDataset, batch_size: int = 32) -> dict:
    loader = DataLoader(
        dataset, batch_size=min(batch_size, len(dataset)), shuffle=False,
        drop_last=False, num_workers=8,
    )
    enc = Encoders(params, cfg, batch_size=batch_size)
    feats, kept, _ = collect_encoded(
        loader, enc, {"image": "image", "text": "text"}, keep=("label",)
    )
    image_feats = feats["image"]  # [N, E]
    text_feats = feats["text"].reshape(image_feats.shape[0], NUM_CHOICES, -1)
    logits = np.einsum("ne,nce->nc", image_feats, text_feats)
    pred = logits.argmax(axis=1)
    gold = kept["label"]
    return {"accuracy": float((pred == gold).mean()), "num_questions": int(len(gold))}
