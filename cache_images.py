#!/usr/bin/env python3
"""Build the offline preprocessed-image cache for a corpus.

Preprocesses every image under --image-dir (JPEG decode + bit-exact CLIP
resize/crop, native C++ path) ONCE into a memory-mapped uint8 cache that the
training/eval loaders read directly — removing decode+resample from every
subsequent epoch. Activate at train/eval time with
`CLIP_EVENT_IMAGE_CACHE=<out dir>` or the `image_cache` config key.

Usage:
  python cache_images.py --image-dir data/voa/rawdata --out cache/voa224
  python cache_images.py --list files.txt --out cache/voa224 --size 224

Prints one JSON stats line. The reference has no counterpart (it re-decoded
every image every epoch inside collate, dataset_voa.py:478-544).
"""

import argparse
import json
import logging
import os
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image-dir", help="directory scanned recursively for images")
    parser.add_argument("--list", dest="list_file", help="file with one image path per line")
    parser.add_argument("--out", required=True, help="cache output directory")
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--workers", type=int, default=os.cpu_count() or 8)
    parser.add_argument(
        "--relative-to",
        help="key images by path relative to this dir (default: basename)",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from clip_event_tpu.data.cache import build_image_cache, scan_image_files

    if bool(args.image_dir) == bool(args.list_file):
        parser.error("exactly one of --image-dir / --list is required")
    if args.image_dir:
        paths = scan_image_files(args.image_dir)
    else:
        with open(args.list_file) as fh:
            paths = [line.strip() for line in fh if line.strip()]

    t0 = time.perf_counter()
    stats = build_image_cache(
        paths, args.out, size=args.size, num_workers=args.workers,
        relative_to=args.relative_to,
    )
    dt = time.perf_counter() - t0
    stats.update(
        {
            "seconds": round(dt, 2),
            "images_per_sec": round(stats["images"] / dt, 1) if dt > 0 else 0.0,
            "out": os.path.abspath(args.out),
        }
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
