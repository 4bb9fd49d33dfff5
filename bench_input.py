"""Host input-pipeline benchmark (not the driver headline — see bench.py).

Measures end-to-end loader throughput (JPEG decode + bit-exact CLIP
preprocessing + batch assembly) on a synthetic 480×640 JPEG corpus, native
C++ path vs pure-Python/PIL, against the training step's consumption rate.

Prints one JSON line with images/s for both paths.
"""

import json
import os
import tempfile
import time

import numpy as np


def main():
    from PIL import Image

    from clip_event_tpu.data.common import DataLoader, ExampleDataset, load_image_file

    tmp = tempfile.mkdtemp(prefix="bench_input_")
    rng = np.random.default_rng(0)
    n_images = 256
    paths = []
    for i in range(n_images):
        arr = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
        p = os.path.join(tmp, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)

    class JpegDataset(ExampleDataset):
        def __len__(self):
            return len(paths)

        def __getitem__(self, idx):
            return {"image": load_image_file(paths[idx], 224)}, {}

    results = {}
    for native_flag, tag in (("1", "native"), ("0", "python_pil")):
        os.environ["CLIP_EVENT_NATIVE"] = native_flag
        loader = DataLoader(
            JpegDataset(), batch_size=32, shuffle=False, num_workers=os.cpu_count() or 8,
            drop_last=False,
        )
        # warm one batch (builds the native lib / caches coefficients)
        next(iter(loader))
        t0 = time.perf_counter()
        seen = 0
        for tensors, _ in loader:
            seen += tensors["image"].shape[0]
        dt = time.perf_counter() - t0
        results[f"{tag}_images_per_sec"] = round(seen / dt, 1)

    os.environ["CLIP_EVENT_NATIVE"] = "1"
    results["speedup"] = round(
        results["native_images_per_sec"] / results["python_pil_images_per_sec"], 2
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
