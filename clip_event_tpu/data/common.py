"""Shared data-layer infrastructure.

Design (replaces the reference's collate-does-everything pattern,
`dataset_voa.py:478-688`, which decoded JPEGs and ran BPE *inside the train
loop on the training process*): every dataset here returns per-example
numpy dicts with **static shapes** (ragged axes padded to config caps + 0/1
masks), so batching is a trivial `np.stack`, examples are prepared by a pool
of host workers, and batches are double-buffered onto the device while the
previous step runs. XLA never sees a dynamic shape.
"""

from __future__ import annotations

import csv
import os
import pickle
import queue
import threading
from operator import itemgetter
from typing import Callable, Dict, Iterator, List, Sequence

import numpy as np

from clip_event_tpu.data.transform import preprocess_image


def load_image_file(path: str, size: int = 224, raw: bool = False) -> np.ndarray:
    """Decode + CLIP-preprocess one image file → float32 [size, size, 3].

    Checks the offline preprocessed cache first (`data.cache`, bit-exact
    uint8 rows, activated explicitly or via CLIP_EVENT_IMAGE_CACHE); on a
    miss uses the native C++ path (libjpeg + fixed-point bicubic, GIL-free)
    when built; falls back to PIL + the pure-Python bit-exact transform.
    Disable the native path with CLIP_EVENT_NATIVE=0.

    `raw=True` returns the PRE-normalize uint8 [size, size, 3] stage (the
    exact PIL intermediate the cache stores): the model normalizes uint8
    inputs on device (`models/clip.py::encode_image`), so raw mode ships 4×
    fewer bytes to the chip and skips the loader's float pass — on a cache
    hit the read is a bare memcpy. Cache misses in raw mode take the
    pure-Python u8 path (exact, slower) so a batch never mixes dtypes.
    """
    from clip_event_tpu.data import cache as image_cache

    cached = image_cache.active_cache()
    if cached is not None:
        hit = cached.get_u8(path, size) if raw else cached.get(path, size)
        if hit is not None:
            return hit

    if raw:
        from clip_event_tpu.data.transform import preprocess_image_u8

        from PIL import Image, ImageFile

        ImageFile.LOAD_TRUNCATED_IMAGES = True
        Image.MAX_IMAGE_PIXELS = 933120000
        with Image.open(path) as img:
            return preprocess_image_u8(img, size)

    if os.environ.get("CLIP_EVENT_NATIVE", "1") != "0" and path.lower().endswith(
        (".jpg", ".jpeg")
    ):
        from clip_event_tpu.data import native

        out = native.preprocess_jpeg_file(path, size)
        if out is not None:
            return out

    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    Image.MAX_IMAGE_PIXELS = 933120000
    with Image.open(path) as img:
        return preprocess_image(img, size)


def load_object_crops(
    path: str,
    detections: Sequence[dict],
    allowed_labels: Dict[str, str],
    threshold: float = 0.2,
    topk: int = 50,
    size: int = 224,
):
    """Whole image at slot 0 + CLIP-preprocessed crops of detections.

    Mirrors `load_img_object` (`dataset_voa.py:181-248`): detections are
    score-sorted ascending, filtered to the allowed-label ontology and the
    score threshold, capped at `topk`. Returns (crops [n, size, size, 3],
    ids, label names) with n ≤ topk + 1.
    """
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    Image.MAX_IMAGE_PIXELS = 933120000

    with Image.open(path) as img:
        img = img.convert("RGB")
        crops = [preprocess_image(img, size)]
        ids = ["0_0_0_0"]
        labels = ["UNKNOWN"]
        count = 1
        for det in sorted(detections, key=itemgetter("score")):
            if count > topk:
                break
            if det["label"] not in allowed_labels or det["score"] < threshold:
                continue
            bbox = det["bbox"]
            try:
                patch = img.crop(bbox)
                crops.append(preprocess_image(patch, size))
            except Exception:
                continue
            ids.append("%d_%d_%d_%d" % tuple(int(v) for v in bbox))
            labels.append(allowed_labels[det["label"]])
            count += 1
    return np.stack(crops), ids, labels


def load_object_label_map(class_map_csv: str) -> Dict[str, str]:
    """Open-Images class map: rows `label_id,name,is_arg_type` — keep rows
    flagged '1' (reference `get_object_labels`, `dataset_voa.py:168-179`)."""
    out = {}
    with open(class_map_csv, newline="") as fh:
        for row in csv.reader(fh):
            if len(row) >= 3 and row[2] == "1":
                out[row[0]] = row[1]
    return out


def load_detection_pickles(paths: Sequence[str]) -> dict:
    results: dict = {}
    for p in paths:
        with open(p, "rb") as fh:
            results.update(pickle.load(fh))
    return results


def pad_stack(
    arrays: List[np.ndarray], cap: int, pad_shape=None, dtype=np.float32
) -> np.ndarray:
    """Stack a variable-length list of same-shape items into [cap, ...],
    zero-padding the missing slots. `pad_shape`/`dtype` describe one item
    when the list may be empty."""
    if arrays:
        tail = arrays[0].shape
        dtype = arrays[0].dtype
    else:
        tail = tuple(pad_shape or ())
    out = np.zeros((cap,) + tuple(tail), dtype=dtype)
    for i, a in enumerate(arrays[:cap]):
        out[i] = a
    return out


def shorten_context(text: str, limit: int = 350) -> str:
    """Caption cleanup (reference `dataset_voa.py:88-91`)."""
    return text.replace("FILE - ", "")[:limit]


class DataLoader:
    """Sharded, multi-worker, prefetching loader.

    Replaces `DistributedSampler` + torch `DataLoader(num_workers=0)`
    (`train.py:190-216`): each process sees its `rank`-strided slice of the
    (optionally shuffled) index space, `num_workers` threads run the
    dataset's `__getitem__` (PIL decode + transform release the GIL), and up
    to `prefetch` ready batches are buffered ahead of the consumer.

    Yields (batch_dict, meta_list) where batch_dict maps field → stacked
    numpy array and meta_list carries per-example non-tensor info (ids).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 999,
        drop_last: bool = True,
        num_workers: int = 8,
        prefetch: int = 2,
        rank: int = 0,
        world_size: int = 1,
        epoch: int = 0,
        bucket_widths=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rank = rank
        self.world_size = world_size
        self.epoch = epoch
        # mid-epoch resume support: skip the first `start_batch` batches of
        # the NEXT iteration (the index order for a given epoch is
        # deterministic, so this reproduces the interrupted epoch's tail)
        self.start_batch = 0
        # Lossless length bucketing (config "length_buckets"): group
        # instances by their minimal text width (dataset.instance_widths())
        # into batches of a few STATIC widths, so short-description batches
        # run the text tower at e.g. 32 tokens instead of 77 — exact, never
        # truncating (unlike context_cap, over-long instances simply land in
        # the full-width bucket). The batch plan is computed from the GLOBAL
        # epoch order and every rank strides WITHIN each global batch, so
        # all processes present identically-shaped global batches each step
        # (a GSPMD requirement). One jit recompile per distinct width.
        self.bucket_widths = None
        if bucket_widths:
            full = int(getattr(dataset, "context", 0))
            caps = sorted({int(w) for w in bucket_widths})
            if not full:
                raise ValueError("bucket_widths needs dataset.context")
            if caps and caps[-1] < full:
                caps.append(full)
            if not drop_last:
                raise ValueError("bucket_widths requires drop_last=True")
            self.bucket_widths = caps

    def set_epoch(self, epoch: int, start_batch: int = 0) -> None:
        """Reshuffle per epoch (reference `train_sampler.set_epoch`)."""
        self.epoch = epoch
        self.start_batch = start_batch

    def _global_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        return order

    def _indices(self) -> np.ndarray:
        order = self._global_order()
        # pad so every rank gets the same number of samples, then stride
        per_rank = -(-len(order) // self.world_size)
        padded = np.resize(order, per_rank * self.world_size)
        return padded[self.rank :: self.world_size]

    def _plan(self):
        """This rank's batch plan: a list of (index_chunk, width_or_None),
        deterministic in (seed, epoch) and length-identical on every rank."""
        if self.bucket_widths is None:
            indices = self._indices()
            if self.drop_last:
                nb = len(indices) // self.batch_size
            else:
                nb = -(-len(indices) // self.batch_size)
            return [
                (indices[b * self.batch_size : (b + 1) * self.batch_size], None)
                for b in range(nb)
            ]
        order = self._global_order()
        # sidecar-cached after the first call; threaded over this loader's
        # worker pool on a cold cache (data/voa.py::instance_widths)
        widths = np.asarray(
            self.dataset.instance_widths(num_workers=self.num_workers)
        )
        caps = self.bucket_widths
        G = self.batch_size * self.world_size
        # assign each instance to the narrowest cap that fits it; per cap
        # (ascending) emit full global batches in epoch order and cascade the
        # remainder into the next (wider) cap — conserves every instance, so
        # exactly n mod G are left unbatched at the end (== plain drop_last)
        assign = np.searchsorted(caps, widths[order])
        plan = []
        carry = order[:0]
        for bi, cap in enumerate(caps):
            members = np.concatenate([carry, order[assign == bi]])
            nb = len(members) // G
            for b in range(nb):
                plan.append((members[b * G : (b + 1) * G], cap))
            carry = members[nb * G :]
        # interleave widths across the epoch (bucket-ordered batches would
        # train on all short texts first — a curriculum nobody asked for)
        rng = np.random.default_rng(self.seed + self.epoch + 1)
        rng.shuffle(plan)
        # every rank strides WITHIN the global batch: same plan, same widths,
        # batch_size local rows each
        return [
            (chunk[self.rank :: self.world_size], cap) for chunk, cap in plan
        ]

    def __len__(self) -> int:
        if self.bucket_widths is not None:
            return len(self._plan())
        per_rank = len(self._indices())
        if self.drop_last:
            return per_rank // self.batch_size
        return -(-per_rank // self.batch_size)

    def __iter__(self) -> Iterator:
        plan = self._plan()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def build_batch(chunk, width):
            pool = getattr(self, "_pool", None)
            if pool is None:
                pool = self._pool = _DaemonPool(self.num_workers)
            examples = pool.map(self.dataset.__getitem__, chunk)
            tensors = {
                k: np.stack([ex[0][k] for ex in examples]) for k in examples[0][0]
            }
            meta = [ex[1] for ex in examples]
            tensors.update(self.dataset.batch_extras(len(examples)))
            tensors = self.dataset.finalize_batch(tensors)
            if width is not None and width < getattr(self.dataset, "context", width):
                tensors = self.dataset.apply_bucket(tensors, width)
            return tensors, meta

        def put_with_stop(item) -> bool:
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        first_batch = min(self.start_batch, len(plan))

        def produce():
            try:
                for chunk, width in plan[first_batch:]:
                    if stop.is_set():
                        return
                    item = build_batch(chunk, width)
                    if not put_with_stop(item):
                        return
            finally:
                put_with_stop(sentinel)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            stop.set()


class _DaemonPool:
    """Minimal map-style thread pool whose workers never block interpreter
    exit (ThreadPoolExecutor workers are non-daemon and deadlock teardown if
    a loader iterator is abandoned mid-epoch)."""

    def __init__(self, num_workers: int):
        self._tasks: "queue.Queue" = queue.Queue()
        for _ in range(num_workers):
            threading.Thread(target=self._worker, daemon=True).start()

    def _worker(self):
        while True:
            fn, arg, slot, results, done = self._tasks.get()
            try:
                results[slot] = (True, fn(arg))
            except BaseException as exc:  # propagate to consumer
                results[slot] = (False, exc)
            done.release()

    def map(self, fn: Callable, args) -> list:
        args = list(args)
        results: list = [None] * len(args)
        done = threading.Semaphore(0)
        for slot, arg in enumerate(args):
            self._tasks.put((fn, arg, slot, results, done))
        for _ in args:
            done.acquire()
        out = []
        for ok, value in results:
            if not ok:
                raise value
            out.append(value)
        return out


class ExampleDataset:
    """Base: subclasses implement __len__ and __getitem__ → (tensors, meta)."""

    def batch_extras(self, batch_size: int) -> Dict[str, np.ndarray]:
        """Per-batch constant tensors (e.g. label layouts)."""
        return {}

    def finalize_batch(self, tensors: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Batch-level reshapes (e.g. [B, D, 77] → [B·D, 77])."""
        return tensors
