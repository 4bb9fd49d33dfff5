"""VOA news image–caption datasets (reference `dataset_voa.py`).

`VOACaptionDataset` — plain image–caption pairs for zero-shot matching
(reference `VOADataset`, `dataset_voa.py:61-159`).

`VOADescriptionDataset` — the contrastive fine-tuning workload
(`dataset_voa.py:371-688`): positives + hard-negative event/argument
descriptions per image, optional object-detection crops channel, optional
text-IE (entity/event mention) channel. All ragged axes are padded to fixed
caps with presence masks (the reference padded to the per-batch max, which
is a different dynamic shape every step — an XLA recompile per batch).

Data artifacts consumed (same contracts as the reference):
  * image_caption_mapping.json: {doc_id: {idx: {url, cap}}}
  * descriptions_<pos>_<neg>.json: {image_id: {pos, neg_event, neg_argument}}
  * object detection .pkl: {image_id: [{label, bbox, score}, ...]}
  * class-descriptions-boxable.csv ontology, merged.cs / event_rewrite.cs
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional, Sequence

import numpy as np

from clip_event_tpu.data.coldstart import (
    IEIndex,
    doc_entity_names,
    doc_event_names,
    load_ie_index,
)
from clip_event_tpu.data.common import (
    ExampleDataset,
    load_image_file,
    load_object_crops,
    load_object_label_map,
    load_detection_pickles,
    pad_stack,
    shorten_context,
)
from clip_event_tpu.data.labels import build_label_layout
from clip_event_tpu.tokenizer import CONTEXT_LENGTH, tokenize

log = logging.getLogger(__name__)


def clean_image_id(image_id: str) -> str:
    return image_id.replace(".", "_")


def load_image_caption_pairs(
    image_caption_jsons: Sequence[str], image_dirs: Sequence[str]
) -> List[dict]:
    """Flatten {doc: {idx: {url, cap}}} files into per-image records."""
    records = []
    for mapping_json, image_dir in zip(image_caption_jsons, image_dirs):
        with open(mapping_json) as fh:
            data = json.load(fh)
        for doc_id in data:
            for image_idx in data[doc_id]:
                records.append(
                    {
                        "image_id": clean_image_id(f"{doc_id}_{image_idx}"),
                        "image_dir": image_dir,
                        "url": data[doc_id][image_idx].get("url", ""),
                        "caption": shorten_context(
                            data[doc_id][image_idx]["cap"], limit=10**9
                        ),
                    }
                )
    return records


class VOACaptionDataset(ExampleDataset):
    """Image–caption pairs; identity contrastive labels."""

    def __init__(
        self,
        image_caption_jsons: Sequence[str],
        image_dirs: Sequence[str],
        image_size: int = 224,
    ):
        self.image_size = image_size
        self.data = load_image_caption_pairs(image_caption_jsons, image_dirs)
        log.info("Loaded %d instances from %s", len(self.data), image_caption_jsons)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int):
        inst = self.data[idx]
        path = os.path.join(inst["image_dir"], inst["image_id"] + ".jpg")
        tensors = {
            "image": load_image_file(path, self.image_size),
            "text": tokenize(inst["caption"])[0],
        }
        return tensors, {"image_id": inst["image_id"], "caption": inst["caption"]}

    def batch_extras(self, batch_size: int):
        eye = np.arange(batch_size, dtype=np.int32)
        return {
            "labels_per_image": eye,
            "labels_per_text": eye,
            "index_pos": eye,
        }


class VOADescriptionDataset(ExampleDataset):
    """Contrastive fine-tune batches with hard negatives (+objects, +IE)."""

    def __init__(
        self,
        posneg_descriptions_json: str,
        image_caption_jsons: Sequence[str],
        image_dirs: Sequence[str],
        # object channel
        load_object: bool = False,
        object_pickles: Optional[Sequence[str]] = None,
        object_ontology_file: Optional[str] = None,
        object_detection_threshold: float = 0.2,
        object_topk: int = 50,
        max_objects: Optional[int] = None,  # cap incl. whole-image slot 0
        # IE channel
        load_ie: bool = False,
        input_entities: Optional[Sequence[str]] = None,
        input_events: Optional[Sequence[str]] = None,
        max_entities: int = 16,
        max_events: int = 8,
        # SR/bbox channel for the local-attention loss (the reference's
        # `load_sr` hook, never implemented there): normalized detection
        # boxes + label-based role descriptions, padded to max_bboxes
        load_sr: bool = False,
        max_bboxes: int = 8,
        # loss layout
        contrastive_loss: str = "ce",
        overbatch: bool = True,
        image_size: int = 224,
        # static text-sequence cap (config "context_cap"): tokenize every
        # text channel to this width instead of 77 — exact for texts that
        # fit (causal transformer + EOT pooling), truncate-keep-EOT beyond.
        context_cap: int = 0,
        # dedupe-encode (data/dedupe.py): GLOBAL static caps on the unique
        # token rows per batch; 0 = off. `dedupe_texts` covers the flattened
        # description batch ([B·D] rows → [cap] uniques + inverse index);
        # `dedupe_sr_texts` the bbox role-description and role-type-label
        # channels. Exact for loss and gradients; encode cost ∝ uniques.
        # `dedupe_strict`: error on a cap overflow instead of falling back to
        # the undeduped layout (required whenever batch shapes must agree
        # beyond one batch: multi-host assembly, stacked-K dispatch).
        dedupe_texts: int = 0,
        dedupe_sr_texts: int = 0,
        dedupe_strict: bool = False,
        # multi-host: this process's rank in the global batch assembly — the
        # in-batch InfoNCE is GLOBAL under GSPMD, so label layouts must
        # index the global rows while this process emits only its block
        # (data/labels.py; train.py passes jax.process_index()/count()).
        dist_rank: int = 0,
        dist_world: int = 1,
        # ship PRE-normalize uint8 images; the model normalizes on device
        # (4× less host→device traffic, loader reads become bare memcpys on
        # cache hits — `load_image_file(raw=True)`). Exact: device fp32
        # normalize is the same IEEE ops as the host pass. Applies to the
        # main image channel (the object-crop channel keeps float32).
        uint8_images: bool = False,
    ):
        self.image_size = image_size
        self.uint8_images = bool(uint8_images)
        self.contrastive_loss = contrastive_loss
        self.overbatch = overbatch
        self.load_sr = load_sr
        self.max_bboxes = max_bboxes
        self.context = int(context_cap) or CONTEXT_LENGTH
        self.dist_rank = int(dist_rank)
        self.dist_world = int(dist_world)
        self.dedupe_texts = int(dedupe_texts)
        self.dedupe_sr_texts = int(dedupe_sr_texts)
        # overflow fallback changes the batch shape, which multi-host
        # assembly cannot represent (rank blocks must agree) — force strict
        self.dedupe_strict = bool(dedupe_strict) or self.dist_world > 1
        for cap in (self.dedupe_texts, self.dedupe_sr_texts):
            if cap and cap % self.dist_world:
                raise ValueError(
                    f"dedupe cap {cap} must divide by world size {self.dist_world}"
                )

        self._descriptions_json = posneg_descriptions_json
        with open(posneg_descriptions_json) as fh:
            descriptions = json.load(fh)

        self.data = []
        for rec in load_image_caption_pairs(image_caption_jsons, image_dirs):
            desc = descriptions.get(rec["image_id"])
            if desc is None:
                continue
            rec["pos"] = desc["pos"]
            rec["neg_event"] = desc["neg_event"]
            rec["neg_argument"] = desc.get("neg_argument", desc["neg_event"])
            self.data.append(rec)
        if not self.data:
            raise ValueError("no images matched the descriptions json")

        first = self.data[0]
        self.num_pos = len(first["pos"])
        self.num_neg = len(first["neg_event"]) + len(first["neg_argument"])
        self.num_desc = self.num_pos + self.num_neg
        log.info(
            "Loaded %d instances (%d descriptions each) from %s",
            len(self.data), self.num_desc, image_caption_jsons,
        )
        if self.context < CONTEXT_LENGTH:
            # make the truncation cost of the cap visible: the fraction of
            # UNIFORMLY sampled descriptions whose full-width EOT lands past
            # the cap (a head sample under-reports on corpora whose length
            # distribution drifts through the file)
            pick = np.random.default_rng(0).choice(
                len(self.data), size=min(512, len(self.data)), replace=False
            )
            sample = [
                t
                for i in pick
                for t in list(self.data[i]["pos"])
                + list(self.data[i]["neg_event"])
                + list(self.data[i]["neg_argument"])
            ]
            eot = np.argmax(tokenize(sample), axis=-1)
            frac = float(np.mean(eot >= self.context))
            msg = (
                "context_cap=%d: %.1f%% of %d uniformly sampled descriptions "
                "exceed the cap (truncate-keep-EOT applies to those)"
            )
            (log.warning if frac > 0.05 else log.info)(
                msg, self.context, 100.0 * frac, len(sample)
            )

        self.load_object = load_object
        if load_object or load_sr:
            self.object_threshold = object_detection_threshold
            self.object_topk = object_topk
            self.max_objects = max_objects or (object_topk + 1)
            self.object_labels = load_object_label_map(object_ontology_file)
            self.object_results = load_detection_pickles(object_pickles or [])

        self.load_ie = load_ie
        if load_ie:
            self.max_entities = max_entities
            self.max_events = max_events
            self.ie: IEIndex = load_ie_index(input_entities, input_events)

    def __len__(self):
        return len(self.data)

    def _widths_sidecar(self) -> str:
        return f"{self._descriptions_json}.widths{self.context}.npz"

    def instance_widths(self, num_workers: int = 0) -> np.ndarray:
        """Per-instance minimal text width: max EOT index + 1 over the
        instance's descriptions (config "length_buckets" — the loader groups
        instances whose descriptions fit a narrower static width into
        narrower batches; exact by the same causal+EOT argument as
        `context_cap`).

        The BPE pass is O(corpus), so it (a) persists to a sidecar
        `<descriptions_json>.widths<context>.npz` keyed on the json's
        mtime+size (re-runs are a file read), (b) memoizes per unique
        description string, and (c) splits across `num_workers` threads —
        the tokenizer's regex core releases the GIL, measured 1.24× on even
        a single core (PERFORMANCE.md)."""
        cached = getattr(self, "_instance_widths", None)
        if cached is not None:
            return cached

        try:
            stat = os.stat(self._descriptions_json)
            key = (int(stat.st_mtime_ns), int(stat.st_size), self.context)
        except OSError:
            key = None

        sidecar = self._widths_sidecar()
        if key is not None and os.path.exists(sidecar):
            try:
                blob = np.load(sidecar, allow_pickle=False)
                if tuple(int(x) for x in blob["key"]) == key:
                    by_id = dict(
                        zip(blob["image_ids"].tolist(), blob["widths"].tolist())
                    )
                    widths = [by_id.get(rec["image_id"]) for rec in self.data]
                    if all(w is not None for w in widths):
                        self._instance_widths = np.asarray(widths, np.int32)
                        log.info("instance widths: sidecar hit (%s)", sidecar)
                        return self._instance_widths
            except Exception:
                log.warning("unreadable widths sidecar %s — recomputing", sidecar)

        memo: dict = {}  # unique description string → token width

        def width_of(texts):
            missing = [t for t in texts if t not in memo]
            if missing:
                tok = tokenize(missing, self.context)
                for t, w in zip(missing, np.argmax(tok, axis=-1) + 1):
                    memo[t] = int(w)
            return max(memo[t] for t in texts)

        def compute(indices):
            out = np.empty(len(indices), np.int32)
            for j, i in enumerate(indices):
                rec = self.data[i]
                out[j] = width_of(
                    list(rec["pos"]) + list(rec["neg_event"])
                    + list(rec["neg_argument"])
                )
            return out

        cached = np.empty(len(self.data), np.int32)
        if num_workers and num_workers > 1 and len(self.data) > 2 * num_workers:
            # strided split: each thread sees a representative slice, and the
            # per-string memo is shared (dict get/set are atomic under the GIL)
            from concurrent.futures import ThreadPoolExecutor

            strides = [
                list(range(w, len(self.data), num_workers))
                for w in range(num_workers)
            ]
            with ThreadPoolExecutor(num_workers) as pool:
                for idxs, out in zip(strides, pool.map(compute, strides)):
                    cached[idxs] = out
        else:
            cached = compute(range(len(self.data)))
        self._instance_widths = cached

        if key is not None:
            try:
                np.savez(
                    sidecar,
                    key=np.asarray(key, np.int64),
                    image_ids=np.asarray(
                        [rec["image_id"] for rec in self.data]
                    ),
                    widths=cached,
                )
            except OSError:
                log.info("widths sidecar not writable (%s) — skipping", sidecar)
        return cached

    def apply_bucket(self, tensors: dict, width: int) -> dict:
        """Slice the description channel to the batch's bucket width. Every
        instance in the batch has EOT < width (loader invariant), so the
        narrower layout encodes identically. Dedupe commutes with the slice
        (rows past every EOT are zero on both sides of a duplicate pair), so
        the unique array slices the same way."""
        for key in ("text", "text_unique"):
            if key in tensors:
                tensors[key] = np.ascontiguousarray(tensors[key][..., :width])
        return tensors

    def __getitem__(self, idx: int):
        inst = self.data[idx]
        image_id = inst["image_id"]
        path = os.path.join(inst["image_dir"], image_id + ".jpg")

        texts = list(inst["pos"]) + list(inst["neg_event"]) + list(inst["neg_argument"])
        tensors = {"text": tokenize(texts, self.context)}
        meta = {"image_id": image_id, "descriptions": texts}

        if self.load_object:
            crops, obj_ids, obj_labels = load_object_crops(
                path,
                self.object_results.get(image_id, []),
                self.object_labels,
                threshold=self.object_threshold,
                topk=min(self.object_topk, self.max_objects - 1),
                size=self.image_size,
            )
            tensors["image"] = crops[0]
            n = min(len(crops), self.max_objects)
            tensors["object_image"] = pad_stack(list(crops), self.max_objects)
            mask = np.zeros(self.max_objects, np.int32)
            mask[:n] = 1
            tensors["object_mask"] = mask
            meta["object_ids"] = obj_ids[: self.max_objects]
            meta["object_labels"] = obj_labels[: self.max_objects]
        else:
            tensors["image"] = load_image_file(
                path, self.image_size, raw=self.uint8_images
            )

        if self.load_sr:
            tensors.update(self._sr_channel(path, image_id))

        if self.load_ie:
            ent_names = doc_entity_names(self.ie, image_id)[: self.max_entities]
            evt_names = doc_event_names(self.ie, image_id)[: self.max_events]
            C = self.context
            ent_tok = tokenize(ent_names, C) if ent_names else np.zeros((0, C), np.int32)
            evt_tok = tokenize(evt_names, C) if evt_names else np.zeros((0, C), np.int32)
            tensors["entity_text"] = pad_stack(list(ent_tok), self.max_entities,
                                               pad_shape=(C,)).astype(np.int32)
            tensors["event_text"] = pad_stack(list(evt_tok), self.max_events,
                                              pad_shape=(C,)).astype(np.int32)
            ent_mask = np.zeros(self.max_entities, np.int32)
            ent_mask[: len(ent_names)] = 1
            evt_mask = np.zeros(self.max_events, np.int32)
            evt_mask[: len(evt_names)] = 1
            tensors["entity_mask"] = ent_mask
            tensors["event_mask"] = evt_mask
            meta["entity_names"] = ent_names
            meta["event_names"] = evt_names

        return tensors, meta

    def _sr_channel(self, path: str, image_id: str) -> dict:
        """Normalized detection boxes + label texts for local attention."""
        from operator import itemgetter

        from clip_event_tpu.ops.bbox import normalize_bbox

        R = self.max_bboxes
        bboxes = np.zeros((R, 4), np.float32)
        mask = np.zeros(R, np.int32)
        desc_tok = np.zeros((R, self.context), np.int32)
        label_tok = np.zeros((R, self.context), np.int32)

        dets = [
            d for d in sorted(
                self.object_results.get(image_id, []), key=itemgetter("score"),
                reverse=True,
            )
            if d["label"] in self.object_labels and d["score"] >= self.object_threshold
        ][:R]
        if dets:
            if "bbox_normalized" in dets[0]:
                boxes = [list(d["bbox_normalized"]) for d in dets]
            else:
                from PIL import Image

                with Image.open(path) as img:
                    width, height = img.size
                boxes = [list(normalize_bbox(d["bbox"], width, height)) for d in dets]
            labels = [self.object_labels[d["label"]] for d in dets]
            bboxes[: len(dets)] = np.asarray(boxes, np.float32)
            mask[: len(dets)] = 1
            desc_tok[: len(dets)] = tokenize(
                [f"An image of {l.lower()}." for l in labels], self.context
            )
            label_tok[: len(dets)] = tokenize([l.lower() for l in labels], self.context)
        return {
            "bbox": bboxes,
            "bbox_mask": mask,
            "bbox_desc_text": desc_tok,
            "bbox_label_text": label_tok,
        }

    def batch_extras(self, batch_size: int):
        layout = build_label_layout(
            batch_size, self.num_pos, self.num_neg,
            self.contrastive_loss, self.overbatch,
            rank=self.dist_rank, world_size=self.dist_world,
        )
        return {
            "labels_per_image": layout.labels_per_image,
            "labels_per_text": layout.labels_per_text,
            "index_pos": layout.index_pos,
        }

    def finalize_batch(self, tensors):
        # flatten descriptions: [B, D, 77] → [B·D, 77] (dataset_voa.py:605-612)
        tensors["text"] = tensors["text"].reshape(-1, tensors["text"].shape[-1])
        if self.dedupe_texts:
            self._dedupe_field(tensors, "text", "text", self.dedupe_texts)
        if self.dedupe_sr_texts and self.load_sr:
            self._dedupe_field(
                tensors, "bbox_desc_text", "bbox_desc", self.dedupe_sr_texts
            )
            if "bbox_label_text" in tensors:
                self._dedupe_field(
                    tensors, "bbox_label_text", "bbox_label", self.dedupe_sr_texts
                )
        return tensors

    def _dedupe_field(self, tensors: dict, field: str, prefix: str, cap: int):
        """Replace `field` with `{prefix}_unique` + `{prefix}_inverse`."""
        from clip_event_tpu.data.dedupe import dedupe_rows, identity_layout

        rows = tensors[field].reshape(-1, tensors[field].shape[-1])
        out = dedupe_rows(
            rows, cap, rank=self.dist_rank, world=self.dist_world,
            strict=self.dedupe_strict, tag=field,
        )
        if out is None:  # non-strict overflow: undeduped layout, new shape
            out = identity_layout(rows, rank=self.dist_rank)
        tensors[f"{prefix}_unique"], tensors[f"{prefix}_inverse"] = out
        del tensors[field]
