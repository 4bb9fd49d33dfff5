"""Batch embedding export — the serving/indexing surface.

Streams a corpus (image files and/or text lines) through the jitted
normalized encoders and writes sharded `.npz` files of unit-norm float32
features plus their ids. This is the production counterpart of the
reference's ad-hoc inline CLIP scoring during preprocessing
(`preprocess_description_contrastive.py:116-144` caches per-doc CLIP logits;
here the embeddings themselves are the artifact, so any number of
downstream rankers/indexes can reuse one encode pass).

Throughput path: the threaded prefetching DataLoader decodes/resizes on the
host (native C++ pipeline when available) while the TPU encodes the previous
batch; fixed batch shapes mean exactly one compilation.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Sequence

import numpy as np

from clip_event_tpu.data.common import DataLoader, ExampleDataset, load_image_file

log = logging.getLogger(__name__)

_IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ImageFilesDataset(ExampleDataset):
    """Every image file under the given dirs (or an explicit list).

    Ids are the filename stems when those are unique across the corpus;
    otherwise the full path is used, so two `photo_001.jpg` in different
    dirs never collide in the exported index."""

    def __init__(self, image_dirs: Sequence[str] = (), image_files: Sequence[str] = (),
                 image_size: int = 224):
        files: List[str] = list(image_files)
        for d in image_dirs:
            for name in sorted(os.listdir(d)):
                if name.lower().endswith(_IMAGE_EXTS):
                    files.append(os.path.join(d, name))
        if not files:
            raise ValueError("no image files found")
        self.files = files
        stems = [os.path.splitext(os.path.basename(p))[0] for p in files]
        self.ids = stems if len(set(stems)) == len(stems) else files
        self.image_size = image_size

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int):
        path = self.files[idx]
        image = load_image_file(path, self.image_size)
        return {"image": image}, {"id": self.ids[idx], "path": path}


def _write_shard(out_dir: str, kind: str, tag: str, shard_idx: int,
                 ids: List[str], feats: List[np.ndarray]) -> str:
    path = os.path.join(out_dir, f"{kind}-{tag}{shard_idx:05d}.npz")
    np.savez_compressed(
        path,
        ids=np.asarray(ids),
        features=np.concatenate(feats).astype(np.float32),
    )
    return path


def embed_stream(dataset, enc, field: str, kind: str, out_dir: str,
                 shard_size: int, batch_size: int, num_workers: int = 8,
                 id_key: str = "id", rank: int = 0, world_size: int = 1) -> Dict:
    """Encode `dataset` and write `<kind>-NNNNN.npz` shards of (ids, features).

    Constant host memory: at most one shard of features is resident.
    Under multi-process runs each rank encodes its rank-strided slice and
    writes rank-tagged shards (`<kind>-rNN-NNNNN.npz`) — export is
    embarrassingly parallel, so there is no gather; the loader's
    count-equalizing wrap-around duplicates are dropped in-stream."""
    os.makedirs(out_dir, exist_ok=True)
    loader = DataLoader(
        dataset, batch_size=min(batch_size, len(dataset)), shuffle=False,
        drop_last=False, num_workers=num_workers,
        rank=rank, world_size=world_size,
    )
    tag = f"r{rank:02d}-" if world_size > 1 else ""
    encode = enc.images if kind == "image" else enc.texts
    ids: List[str] = []
    feats: List[np.ndarray] = []
    shards: List[str] = []
    count = 0
    dim = None
    offset = 0
    for batch, metas in loader:
        x = np.asarray(batch[field])
        f = encode(x)
        dim = f.shape[-1]
        b = f.shape[0]
        genuine = rank + (offset + np.arange(b)) * world_size < len(dataset)
        offset += b
        f = f[genuine]
        metas = [m for m, g in zip(metas, genuine) if g]
        feats.append(f)
        ids.extend(str(m[id_key]) for m in metas)
        count += f.shape[0]
        while len(ids) >= shard_size:
            buf = np.concatenate(feats)
            shards.append(
                _write_shard(out_dir, kind, tag, len(shards), ids[:shard_size],
                             [buf[:shard_size]])
            )
            rest = buf[shard_size:]
            ids, feats = ids[shard_size:], ([rest] if rest.size else [])
    if ids:
        shards.append(_write_shard(out_dir, kind, tag, len(shards), ids, feats))
    manifest = {
        "kind": kind, "count": count, "dim": int(dim or 0),
        "shards": [os.path.basename(s) for s in shards],
        "normalized": True, "dtype": "float32",
    }
    return manifest


def run_embed(cfg: dict, params, mcfg) -> dict:
    """Config contract (embed.py CLI):

      output_dir            where shards + manifest.json land (required)
      image_dir / image_files   images to embed (either/both, optional)
      text_file             one text per line (optional)
      texts                 inline list of strings (optional)
      batch_size (64), shard_size (50000), num_workers (8)
      length_buckets        e.g. [32, 48]: encode each text at the
                            narrowest listed static width that fits its
                            EOT (lossless; shards are width-tagged
                            text-wNN-*.npz; ~1.5-1.8x text encode at 48/32)
    """
    from clip_event_tpu.data.text import TextDataset
    from clip_event_tpu.evals.common import Encoders, resolve_shard

    out_dir = cfg["output_dir"]
    batch = cfg.get("batch_size", 64)
    shard = cfg.get("shard_size", 50000)
    workers = cfg.get("num_workers", 8)
    rank, world_size = resolve_shard(cfg.get("rank"), cfg.get("world_size"))
    enc = Encoders(params, mcfg, batch_size=batch)

    manifests = {}
    image_dirs = cfg.get("image_dir", [])
    if isinstance(image_dirs, str):
        image_dirs = [image_dirs]
    image_files = cfg.get("image_files", [])
    if isinstance(image_files, str):
        image_files = [image_files]
    if image_dirs or image_files:
        ds = ImageFilesDataset(image_dirs, image_files, mcfg.image_resolution)
        log.info("embedding %d images", len(ds))
        manifests["images"] = embed_stream(
            ds, enc, "image", "image", out_dir, shard, batch, workers,
            rank=rank, world_size=world_size,
        )

    texts = list(cfg.get("texts", []))
    if cfg.get("text_file"):
        with open(cfg["text_file"]) as fh:
            texts += [line.rstrip("\n") for line in fh if line.strip()]
    if texts:
        buckets = sorted({int(w) for w in cfg.get("length_buckets", [])})
        groups = [(texts, 0)]
        if buckets:
            # lossless length bucketing (same idea as training's
            # "length_buckets"): encode each text at the narrowest listed
            # static width that fits its EOT — short texts run the tower at
            # a fraction of 77 tokens, never truncated (over-long → the
            # implicit full-width group). Output order is irrelevant here
            # (ids travel with features), so a plain partition suffices.
            from clip_event_tpu.tokenizer import CONTEXT_LENGTH, tokenize

            widths = np.argmax(tokenize(texts), axis=-1) + 1
            caps = [w for w in buckets if w < CONTEXT_LENGTH] + [CONTEXT_LENGTH]
            assign = np.searchsorted(caps, widths)
            groups = [
                ([t for t, a in zip(texts, assign) if a == bi], cap)
                for bi, cap in enumerate(caps)
            ]
            groups = [(g, cap) for g, cap in groups if g]
            log.info(
                "length_buckets %s: group sizes %s",
                caps, [len(g) for g, _ in groups],
            )
        merged = None
        for group_texts, cap in groups:
            ds = TextDataset(group_texts, context=cap)
            log.info("embedding %d texts (width %s)", len(ds), cap or "full")
            m = embed_stream(
                ds, enc, "text", f"text-w{cap}" if cap else "text",
                out_dir, shard, batch, workers,
                id_key="text", rank=rank, world_size=world_size,
            )
            if merged is None:
                merged = m
            else:
                merged["count"] += m["count"]
                merged["shards"] += m["shards"]
        merged["kind"] = "text"
        manifests["texts"] = merged

    if not manifests:
        raise ValueError("nothing to embed: give image_dir/image_files, "
                         "text_file, or texts")
    if world_size > 1:
        # merge the per-rank manifests so every rank writes the same global
        # manifest (shard files themselves never needed a gather)
        from clip_event_tpu.parallel.collectives import all_gather_objects

        gathered = all_gather_objects(manifests)
        merged: Dict[str, Dict] = {}
        for rank_manifests in gathered:
            for k, m in rank_manifests.items():
                if k not in merged:
                    merged[k] = dict(m, count=0, shards=[])
                merged[k]["count"] += m["count"]
                merged[k]["shards"] += m["shards"]
        manifests = merged
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifests, fh, indent=2)
    return {k: {"count": m["count"], "shards": len(m["shards"]), "dim": m["dim"]}
            for k, m in manifests.items()}
