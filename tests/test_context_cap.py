"""Static text-sequence cap ("context_cap" config key).

The text transformer is causal and pools at EOT, so a caption whose tokens
(SOT + ids + EOT) fit in S < context_length must produce the SAME pooled
embedding when run at width S as at the full width — positions after EOT
can never flow into the EOT row. The reference always runs the full 77
(`clip.py:194-196` only defines the truncation rule); the cap is a
TPU-native compute knob: the text tower's FLOPs drop ~linearly with S.
"""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from clip_event_tpu.config import ConfigError, validate_config
from clip_event_tpu.models import CLIPConfig, encode_text, init_params
from clip_event_tpu.tokenizer import CONTEXT_LENGTH, tokenize
from tests.fixtures import make_voa_fixture

TINY = CLIPConfig(
    embed_dim=64,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=16,
    vocab_size=128,
    transformer_width=64,
    transformer_heads=2,
    transformer_layers=2,
)


def _tokens(rng, batch, width, max_len):
    """[batch, width] rows: SOT-ish ids then EOT (= vocab-1, the argmax) at a
    random position < max_len, zero-padded — the tokenize() layout."""
    out = np.zeros((batch, width), np.int32)
    for i in range(batch):
        n = int(rng.integers(2, max_len + 1))
        out[i, : n - 1] = rng.integers(1, TINY.vocab_size - 1, size=n - 1)
        out[i, n - 1] = TINY.vocab_size - 1
    return out


@pytest.mark.parametrize("remat", [False, True])
def test_encode_text_capped_width_is_exact(remat):
    cap = 8
    rng = np.random.default_rng(0)
    full = _tokens(rng, 4, TINY.context_length, max_len=cap)
    capped = full[:, :cap]
    params = init_params(jax.random.PRNGKey(0), TINY)

    out_full = encode_text(params, TINY, full, remat=remat)
    out_capped = encode_text(params, TINY, capped, remat=remat)
    np.testing.assert_allclose(
        np.asarray(out_capped), np.asarray(out_full), rtol=1e-6, atol=1e-6
    )


def test_tokenize_cap_is_prefix_of_full_width():
    texts = ["a man speaks", "protest in the city square"]
    full = tokenize(texts)
    capped = tokenize(texts, 24)
    assert capped.shape == (2, 24)
    assert int(full.argmax(-1).max()) < 24  # both fit: prefix must be exact
    np.testing.assert_array_equal(capped, full[:, :24])


def test_voa_dataset_context_cap_shrinks_every_text_channel(tmp_path):
    from clip_event_tpu.data.voa import VOADescriptionDataset

    voa = make_voa_fixture(str(tmp_path / "voa"))
    ds = VOADescriptionDataset(
        posneg_descriptions_json=voa["descriptions_json"],
        image_caption_jsons=[voa["mapping_json"]],
        image_dirs=[voa["image_dir"]],
        load_ie=True,
        input_entities=[voa["entity_cs"]],
        input_events=[voa["event_cs"]],
        max_entities=3,
        max_events=2,
        context_cap=24,
    )
    tensors, _ = ds[0]
    assert tensors["text"].shape == (3, 24)
    assert tensors["entity_text"].shape == (3, 24)
    assert tensors["event_text"].shape == (2, 24)

    ds_full = VOADescriptionDataset(
        posneg_descriptions_json=voa["descriptions_json"],
        image_caption_jsons=[voa["mapping_json"]],
        image_dirs=[voa["image_dir"]],
    )
    t_full, _ = ds_full[0]
    assert t_full["text"].shape == (3, CONTEXT_LENGTH)
    # fixture captions fit: the capped channel is the exact prefix
    np.testing.assert_array_equal(tensors["text"], t_full["text"][:, :24])


def test_config_validation():
    base = {"task": "t", "posneg_descriptions_json": "x", "image_caption_json": ["x"],
            "image_dir": ["x"], "ckpt_dir": "x", "constrastive_loss": "ce",
            "batch_size": 2, "lr": 1e-4, "optimizer": "adam", "max_epoch": 1}
    assert validate_config(dict(base))["context_cap"] == 0
    assert validate_config(dict(base, context_cap=32))["context_cap"] == 32
    for bad in (-1, 1, 78, "12"):
        with pytest.raises(ConfigError):
            validate_config(dict(base, context_cap=bad))


def test_train_cli_context_cap(tmp_path):
    """`"context_cap": 24` end-to-end through train.py: runs, checkpoints,
    and the dataset logs the cap."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    voa = make_voa_fixture(str(tmp_path / "voa"))
    cfg = {
        "task": "capsmoke",
        "constrastive_loss": "ce",
        "constrastive_overbatch": True,
        "posneg_descriptions_json": voa["descriptions_json"],
        "image_caption_json": [voa["mapping_json"]],
        "image_dir": [voa["image_dir"]],
        "load_object": False,
        "load_ie": False,
        "ckpt_dir": str(tmp_path / "ckpt"),
        "tb_log_dir": str(tmp_path / "logs"),
        "is_train": True,
        "begin_epoch": 0,
        "max_epoch": 1,
        "batch_size": 2,
        "lr": 1e-4,
        "optimizer": "adam",
        "weight_decay": 0.0,
        "lr_scheduler": "none",
        "compute_dtype": "float32",
        "remat": False,
        "num_workers": 2,
        "validate_every": 0,
        "context_cap": 24,
        "model": {
            "embed_dim": 64, "image_resolution": 32, "vision_layers": 2,
            "vision_width": 64, "vision_patch_size": 16, "context_length": 77,
            "vocab_size": 49408, "transformer_width": 64,
            "transformer_heads": 2, "transformer_layers": 2,
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "train.py", "--cfg", str(cfg_path)],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "context_cap=24" in proc.stderr + proc.stdout
    assert (tmp_path / "ckpt" / "capsmoke" / "capsmoke_0").exists()
