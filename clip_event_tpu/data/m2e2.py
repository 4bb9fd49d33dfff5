"""M2E2 multimedia event extraction — zero-shot eval dataset.

The reference's `dataset_m2e2.py` is incomplete/broken in the snapshot
(undefined `template_choice`/`candidates_vec`, `dataset_m2e2.py:109,149`);
this implements the documented capability (README.md:212-215): each image
has one gold event type; candidates are one template description per
ontology event type, tokenized once as a fixed [T, 77] matrix; zero-shot
prediction is the argmax over image–candidate similarities.

Artifact contracts:
  * image_anno json: {image_id: {"event_type": str, ...}}
  * ie_ontology json: {event_type: template_description}
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

from clip_event_tpu.data.common import ExampleDataset, load_image_file
from clip_event_tpu.tokenizer import tokenize

log = logging.getLogger(__name__)


class M2E2Dataset(ExampleDataset):
    def __init__(
        self,
        image_anno: str,
        image_dir: str,
        ie_ontology_json: str,
        image_suffix: str = ".jpg",
        image_size: int = 224,
    ):
        self.image_dir = image_dir
        self.image_suffix = image_suffix
        self.image_size = image_size

        with open(ie_ontology_json) as fh:
            ontology = json.load(fh)
        self.event_types = list(ontology.keys())
        self.event_type_to_idx = {t: i for i, t in enumerate(self.event_types)}
        self.templates = [ontology[t] for t in self.event_types]
        self.candidate_tokens = tokenize(self.templates)  # [T, 77]

        with open(image_anno) as fh:
            anno = json.load(fh)
        self.data = []
        for image_id, inst in anno.items():
            event_type = inst["event_type"]
            if event_type not in self.event_type_to_idx:
                log.warning("unknown event type %s for %s", event_type, image_id)
                continue
            self.data.append(
                {
                    "image_id": image_id,
                    "event_type": event_type,
                    "event_type_idx": self.event_type_to_idx[event_type],
                    "arguments": inst.get("role", {}),
                }
            )
        log.info("Loaded %d instances, %d event types", len(self.data), len(self.event_types))

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int):
        inst = self.data[idx]
        path = os.path.join(self.image_dir, inst["image_id"] + self.image_suffix)
        tensors = {
            "image": load_image_file(path, self.image_size),
            "event_type_idx": np.int32(inst["event_type_idx"]),
        }
        return tensors, {"image_id": inst["image_id"], "arguments": inst["arguments"]}
