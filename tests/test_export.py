"""AOT serving-bundle export tests (engine/export.py).

The exported StableHLO module must (a) round-trip through serialize →
deserialize, (b) accept ANY batch size via the symbolic batch dim, and
(c) reproduce the live encoders' outputs exactly — including after the
weights take a trip through the flat npz state_dict.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from clip_event_tpu.engine.export import (  # noqa: E402
    load_serving_bundle,
    save_serving_bundle,
)
from clip_event_tpu.models import clip as clip_model  # noqa: E402
from clip_event_tpu.models import init_params  # noqa: E402
from tests.test_model_parity import TINY_VIT  # noqa: E402


def _inputs(cfg, b, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.normal(size=(b, cfg.image_resolution, cfg.image_resolution, 3)).astype(
        np.float32
    )
    tokens = rng.integers(1, cfg.vocab_size - 2, size=(b, cfg.context_length)).astype(
        np.int32
    )
    tokens[:, -1] = cfg.vocab_size - 1
    return images, tokens


def test_bundle_roundtrip_matches_live_encoders(tmp_path):
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(0), cfg)
    out = save_serving_bundle(str(tmp_path / "bundle"), params, cfg)
    for fname in (
        "image_encode.stablehlo",
        "text_encode.stablehlo",
        "params.npz",
        "meta.json",
    ):
        assert os.path.exists(os.path.join(out, fname)), fname

    model = load_serving_bundle(out)
    # symbolic batch: the SAME module serves b=2 and b=5
    for b in (2, 5):
        images, tokens = _inputs(cfg, b, seed=b)
        img_live = np.asarray(
            clip_model.l2_normalize(clip_model.encode_image(params, cfg, images))
        )
        txt_live = np.asarray(
            clip_model.l2_normalize(clip_model.encode_text(params, cfg, tokens))
        )
        np.testing.assert_allclose(model.encode_image(images), img_live, atol=1e-5)
        np.testing.assert_allclose(model.encode_text(tokens), txt_live, atol=1e-5)
        assert model.encode_image(images).shape == (b, cfg.embed_dim)


def test_bundle_meta_records_model_config(tmp_path):
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(1), cfg)
    out = save_serving_bundle(str(tmp_path / "bundle"), params, cfg)
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["model_config"]["embed_dim"] == cfg.embed_dim
    assert meta["context_length"] == cfg.context_length
    assert "cpu" in meta["platforms"]


def test_bundle_capped_context_matches_full(tmp_path):
    """A bundle exported with `context=S` serves [b, S] tokens and, for
    texts whose EOT fits, produces the SAME embeddings as the full-width
    module (the serving analogue of context_cap)."""
    cfg = TINY_VIT  # context_length 16
    params = init_params(jax.random.PRNGKey(2), cfg)
    S = 8
    out = save_serving_bundle(str(tmp_path / "capped"), params, cfg, context=S)
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["context_length"] == S
    assert meta["model_config"]["context_length"] == cfg.context_length

    model = load_serving_bundle(out)
    rng = np.random.default_rng(3)
    tokens = rng.integers(1, cfg.vocab_size - 2, size=(4, cfg.context_length)).astype(
        np.int32
    )
    tokens[:, S - 1 :] = 0
    tokens[:, S - 1] = cfg.vocab_size - 1  # EOT at the cap boundary
    full = np.asarray(
        clip_model.l2_normalize(clip_model.encode_text(params, cfg, tokens))
    )
    np.testing.assert_allclose(model.encode_text(tokens[:, :S]), full, atol=1e-5)

    with pytest.raises(ValueError):
        save_serving_bundle(str(tmp_path / "bad"), params, cfg, context=1)


@pytest.mark.slow
def test_export_cli_end_to_end(tmp_path):
    """python export_serving.py --cfg ... --out ... produces a loadable bundle."""
    cfg = {
        "model": {
            "embed_dim": 64, "image_resolution": 32, "vision_layers": 2,
            "vision_width": 64, "vision_patch_size": 16, "context_length": 77,
            "vocab_size": 512, "transformer_width": 64, "transformer_heads": 2,
            "transformer_layers": 2,
        },
        "seed": 3,
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "export_serving.py", "--cfg", str(cfg_path),
         "--out", str(tmp_path / "bundle")],
        capture_output=True, text=True, timeout=600, cwd=cwd, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    model = load_serving_bundle(str(tmp_path / "bundle"))
    images = np.zeros((3, 32, 32, 3), np.float32)
    feats = model.encode_image(images)
    assert feats.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, rtol=1e-4)
