"""Embedding export: streaming shards, manifest, id alignment, CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from clip_event_tpu.embed import ImageFilesDataset, run_embed  # noqa: E402
from clip_event_tpu.models import init_params  # noqa: E402
from tests.test_evals import TINY_EVAL  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), TINY_EVAL)


def _make_images(tmp_path, n=7):
    from PIL import Image

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        arr = rng.integers(0, 256, size=(40 + i, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"im_{i:03d}.jpg")
    return str(img_dir)


def test_embed_images_and_texts(tmp_path, params):
    img_dir = _make_images(tmp_path, n=7)
    out_dir = str(tmp_path / "out")
    cfg = {
        "output_dir": out_dir,
        "image_dir": img_dir,
        "texts": [f"caption number {i}" for i in range(5)],
        "batch_size": 4,
        "shard_size": 3,  # force multi-shard rollover
        "num_workers": 2,
    }
    summary = run_embed(cfg, params, TINY_EVAL)
    assert summary["images"]["count"] == 7
    assert summary["images"]["shards"] == 3  # 3+3+1
    assert summary["texts"]["count"] == 5

    manifest = json.load(open(os.path.join(out_dir, "manifest.json")))
    ids, feats = [], []
    for shard in manifest["images"]["shards"]:
        z = np.load(os.path.join(out_dir, shard))
        ids += list(z["ids"])
        feats.append(z["features"])
    feats = np.concatenate(feats)
    assert ids == [f"im_{i:03d}" for i in range(7)]
    assert feats.shape == (7, TINY_EVAL.embed_dim)
    # features are unit-norm (the encoders normalize)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-3)

    # id↔feature alignment: re-encoding one file directly must match its row
    ds = ImageFilesDataset([img_dir], image_size=TINY_EVAL.image_resolution)
    from clip_event_tpu.evals.common import Encoders

    enc = Encoders(params, TINY_EVAL, batch_size=4)
    one = enc.images(ds[2][0]["image"][None])
    np.testing.assert_allclose(one[0], feats[2], atol=1e-4)


def test_embed_cli(tmp_path, params):
    img_dir = _make_images(tmp_path, n=3)
    out_dir = str(tmp_path / "out_cli")
    cfg = {
        "output_dir": out_dir,
        "image_dir": img_dir,
        "model": {
            "embed_dim": 64, "image_resolution": 32, "vision_layers": 2,
            "vision_width": 64, "vision_patch_size": 16, "context_length": 77,
            "vocab_size": 49408, "transformer_width": 64,
            "transformer_heads": 1, "transformer_layers": 2,
        },
        "batch_size": 2,
        "num_workers": 1,
    }
    cfg_path = tmp_path / "embed.json"
    cfg_path.write_text(json.dumps(cfg))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "embed.py"), "--cfg", str(cfg_path)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert out["images"]["count"] == 3
    assert os.path.exists(os.path.join(out_dir, "manifest.json"))


def test_embed_batch_larger_than_shard(tmp_path, params):
    """batch_size > shard_size must still flush every full shard per batch
    (constant resident memory) and keep shards exactly shard_size."""
    img_dir = _make_images(tmp_path, n=9)
    out_dir = str(tmp_path / "out_big_batch")
    cfg = {
        "output_dir": out_dir,
        "image_dir": img_dir,
        "batch_size": 8,
        "shard_size": 2,
        "num_workers": 1,
    }
    summary = run_embed(cfg, params, TINY_EVAL)
    assert summary["images"]["count"] == 9
    assert summary["images"]["shards"] == 5  # 2+2+2+2+1
    manifest = json.load(open(os.path.join(out_dir, "manifest.json")))
    sizes = [
        len(np.load(os.path.join(out_dir, s))["ids"])
        for s in manifest["images"]["shards"]
    ]
    assert sizes == [2, 2, 2, 2, 1]


def test_embed_duplicate_stems_and_string_image_files(tmp_path, params):
    """Same filename in two dirs → full-path ids; a single-string
    image_files config value is treated as one path, not characters."""
    d1 = _make_images(tmp_path / "a", n=2)
    d2 = _make_images(tmp_path / "b", n=2)  # same stems im_000/im_001
    ds = ImageFilesDataset([d1, d2], image_size=TINY_EVAL.image_resolution)
    assert len(set(ds.ids)) == 4  # collisions resolved via full paths
    assert all(os.sep in i for i in ds.ids)

    out_dir = str(tmp_path / "out_str")
    cfg = {
        "output_dir": out_dir,
        "image_files": os.path.join(d1, "im_000.jpg"),  # bare string
        "batch_size": 2,
        "num_workers": 1,
    }
    summary = run_embed(cfg, params, TINY_EVAL)
    assert summary["images"]["count"] == 1


def test_embed_stream_two_rank_shards(tmp_path):
    """Two simulated ranks export disjoint rank-tagged shards whose union is
    the full corpus with no wrap-around-padding duplicates (odd-sized)."""
    from PIL import Image

    from clip_event_tpu.embed import embed_stream
    from clip_event_tpu.evals.common import Encoders

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(
            rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8)
        ).save(img_dir / f"im{i}.jpg")

    params = init_params(jax.random.PRNGKey(0), TINY_EVAL)
    enc = Encoders(params, TINY_EVAL, batch_size=2)
    ds = ImageFilesDataset([str(img_dir)], image_size=TINY_EVAL.image_resolution)
    out = str(tmp_path / "out")
    manifests = [
        embed_stream(ds, enc, "image", "image", out, shard_size=100,
                     batch_size=2, num_workers=2, rank=r, world_size=2)
        for r in range(2)
    ]
    assert sum(m["count"] for m in manifests) == 5
    ids = []
    for m in manifests:
        for s in m["shards"]:
            with np.load(os.path.join(out, s)) as z:
                ids.extend(z["ids"].tolist())
                assert z["features"].shape[1] == TINY_EVAL.embed_dim
    assert sorted(ids) == [f"im{i}" for i in range(5)]
    assert any("r00-" in s for s in manifests[0]["shards"])


def test_embed_texts_length_buckets_lossless(tmp_path, params):
    """`length_buckets` in the embed config encodes each text at the
    narrowest listed width that fits it; features must match the unbucketed
    (77-wide) export exactly, id for id."""
    texts = [
        "a cat.",                      # fits 16
        "a protest in the city.",      # fits 16
        "the quick brown fox jumps over the lazy dog and keeps on "
        "running through the very long meadow toward the distant hills "
        "beyond the river and the woods",  # > 16 tokens → full bucket
    ]

    def export(out, extra):
        cfg = {"output_dir": str(tmp_path / out), "texts": texts,
               "batch_size": 2, **extra}
        summary = run_embed(cfg, params, TINY_EVAL)
        assert summary["texts"]["count"] == len(texts)
        feats = {}
        manifest = json.load(open(tmp_path / out / "manifest.json"))
        for shard in manifest["texts"]["shards"]:
            z = np.load(tmp_path / out / shard, allow_pickle=False)
            for i, f in zip(z["ids"], z["features"]):
                feats[str(i)] = f
        return feats

    plain = export("plain", {})
    bucketed = export("bucketed", {"length_buckets": [16]})
    assert set(plain) == set(bucketed) == set(texts)
    # width-16 shard exists (short texts) alongside the full-width shard
    names = json.load(open(tmp_path / "bucketed" / "manifest.json"))["texts"]["shards"]
    assert any("text-w16" in n for n in names) and any("text-w77" in n for n in names)
    for t in texts:
        np.testing.assert_allclose(bucketed[t], plain[t], atol=1e-5)
