"""Tokenize-only dataset (reference `dataset_text.py`): strings → [N, 77]."""

from __future__ import annotations

from typing import Sequence

from clip_event_tpu.data.common import ExampleDataset
from clip_event_tpu.tokenizer import tokenize


class TextDataset(ExampleDataset):
    def __init__(self, texts: Sequence[str]):
        self.texts = list(texts)

    def __len__(self):
        return len(self.texts)

    def __getitem__(self, idx: int):
        return {"text": tokenize(self.texts[idx])[0]}, {"text": self.texts[idx]}
