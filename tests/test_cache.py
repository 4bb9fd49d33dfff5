"""Offline preprocessed-image cache (`data/cache.py`, `cache_images.py`).

The cache stores the bit-exact uint8 resize+crop stage of the reference
transform (`/root/reference/src/clip-event/clip.py:62-69`), so a hit must
reproduce `load_image_file` exactly; misses and size mismatches must fall
through to live decode.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from clip_event_tpu.data import cache as image_cache
from clip_event_tpu.data.cache import (
    ImageCache,
    build_image_cache,
    scan_image_files,
)
from clip_event_tpu.data.common import load_image_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def jpeg_corpus(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(7)
    paths = []
    for i, (h, w) in enumerate([(300, 500), (224, 224), (120, 90), (640, 480)]):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f"img_{i}.jpg"
        Image.fromarray(arr).save(p, quality=90)
        paths.append(str(p))
    return paths


@pytest.fixture(autouse=True)
def _no_global_cache():
    yield
    image_cache.activate(None)


def test_cache_hits_are_bit_exact(jpeg_corpus, tmp_path, monkeypatch):
    cache_dir = str(tmp_path / "cache")
    stats = build_image_cache(jpeg_corpus, cache_dir, size=224, num_workers=2)
    assert stats == {"images": 4, "failed": 0, "size": 224}

    cache = ImageCache(cache_dir)
    assert len(cache) == 4
    for p in jpeg_corpus:
        # vs the native float path: the known ≤1-ulp mul-vs-div difference
        np.testing.assert_allclose(cache.get(p), load_image_file(p, 224), atol=1e-6)
    # vs the reference-semantics float path (numpy division): bitwise equal
    monkeypatch.setenv("CLIP_EVENT_NATIVE", "0")
    for p in jpeg_corpus:
        np.testing.assert_array_equal(cache.get(p), load_image_file(p, 224))


def test_cache_miss_and_size_mismatch_fall_through(jpeg_corpus, tmp_path):
    cache_dir = str(tmp_path / "cache")
    build_image_cache(jpeg_corpus[:2], cache_dir, size=224)
    cache = ImageCache(cache_dir)
    assert cache.get(jpeg_corpus[3]) is None          # not cached
    assert cache.get(jpeg_corpus[0], size=288) is None  # wrong size

    # load_image_file with the cache active still serves the miss live
    image_cache.activate(cache_dir)
    out = load_image_file(jpeg_corpus[3], 224)
    assert out.shape == (224, 224, 3)
    image_cache.activate(None)
    np.testing.assert_array_equal(out, load_image_file(jpeg_corpus[3], 224))


def test_load_image_file_uses_active_cache(jpeg_corpus, tmp_path, monkeypatch):
    cache_dir = str(tmp_path / "cache")
    build_image_cache(jpeg_corpus, cache_dir, size=224)
    image_cache.activate(cache_dir)

    # poison the live path: a cache hit must not touch the file
    missing = str(tmp_path / "moved" / os.path.basename(jpeg_corpus[0]))
    expected = load_image_file(jpeg_corpus[0], 224)
    got = load_image_file(missing, 224)  # basename key resolves the row
    np.testing.assert_array_equal(got, expected)


def test_unreadable_images_are_skipped(jpeg_corpus, tmp_path):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as fh:
        fh.write(b"not a jpeg")
    cache_dir = str(tmp_path / "cache")
    stats = build_image_cache(jpeg_corpus + [bad], cache_dir, size=224)
    assert stats["failed"] == 1
    assert len(ImageCache(cache_dir)) == 4


def test_scan_and_cli_end_to_end(jpeg_corpus, tmp_path):
    found = scan_image_files(os.path.dirname(jpeg_corpus[0]))
    assert sorted(found) == sorted(jpeg_corpus)

    out_dir = str(tmp_path / "cli_cache")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "cache_images.py"),
            "--image-dir", os.path.dirname(jpeg_corpus[0]),
            "--out", out_dir,
            "--workers", "2",
        ],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["images"] == 4 and stats["failed"] == 0
    cache = ImageCache(out_dir)
    np.testing.assert_allclose(
        cache.get(jpeg_corpus[1]), load_image_file(jpeg_corpus[1], 224), atol=1e-6
    )


def test_env_var_activation(jpeg_corpus, tmp_path, monkeypatch):
    cache_dir = str(tmp_path / "cache")
    build_image_cache(jpeg_corpus, cache_dir, size=224)
    monkeypatch.setenv("CLIP_EVENT_IMAGE_CACHE", cache_dir)
    # reset the lazy-env latch so this process re-reads the variable
    image_cache._env_checked = False
    image_cache._active = None
    assert image_cache.active_cache() is not None
    np.testing.assert_array_equal(
        image_cache.active_cache().get(jpeg_corpus[2]),
        load_image_file(jpeg_corpus[2], 224),
    )


def test_python_and_native_u8_paths_agree(jpeg_corpus, monkeypatch, tmp_path):
    from clip_event_tpu.data import native

    if not native.available():
        pytest.skip("native library unavailable")
    native_dir = str(tmp_path / "native_c")
    python_dir = str(tmp_path / "python_c")
    build_image_cache(jpeg_corpus, native_dir, size=224)
    monkeypatch.setenv("CLIP_EVENT_NATIVE", "0")
    build_image_cache(jpeg_corpus, python_dir, size=224)
    a, b = ImageCache(native_dir), ImageCache(python_dir)
    for p in jpeg_corpus:
        np.testing.assert_array_equal(a.get_u8(p), b.get_u8(p))
