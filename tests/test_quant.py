"""Int8 W8A8 inference quantization (`ops/quant.py`).

Reference has no quantization story; this is the TPU-native serving path
(s8×s8→s32 MXU). Correctness bar: quantized encoders stay within a tight
cosine-similarity budget of the float path and the eval CLI accepts
`"quantize": "int8"`.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_event_tpu.models.clip import (
    CLIPConfig,
    encode_image,
    encode_text,
    forward,
    init_params,
)
from clip_event_tpu.ops.quant import (
    QuantWeight,
    is_quantized,
    quantize_params,
    quantize_weight,
    quantized_linear,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = CLIPConfig(64, 32, 2, 64, 16, 77, 49408, 64, 1, 2)
TINY_RN = CLIPConfig(64, 32, (1, 1, 1, 1), 16, None, 77, 49408, 64, 1, 2)


def _cos(a, b):
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return (a * b).sum(-1)


def _tokens(rng, n):
    toks = np.zeros((n, 77), np.int32)
    toks[:, 0] = 49406
    toks[:, 1:5] = rng.integers(1, 49000, (n, 4))
    toks[:, 5] = 49407
    return jnp.asarray(toks)


def test_quantized_linear_matches_float():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 33, 48)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(48, 96)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(96,)), jnp.float32)
    ref = x @ w + b
    out = quantized_linear(x, quantize_weight(w), b)
    assert out.dtype == x.dtype
    # int8 dynamic quantization: ~1% relative error budget
    rel = np.abs(np.asarray(out - ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.02, rel


def test_quant_weight_roundtrip_error_bounded():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(3, 32, 64)), jnp.float32)  # stacked [L,...]
    qw = quantize_weight(w)
    assert qw.q.dtype == jnp.int8 and qw.q.shape == w.shape
    assert qw.scale.shape == (3, 64)
    deq = np.asarray(qw.q, np.float32) * np.asarray(qw.scale)[:, None, :]
    np.testing.assert_allclose(deq, np.asarray(w), atol=np.abs(w).max() / 127.0)


@pytest.mark.parametrize("cfg", [TINY, TINY_RN], ids=["vit", "resnet"])
def test_quantized_encoders_close_to_float(cfg):
    params = init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params)
    assert is_quantized(qparams) and not is_quantized(params)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    toks = _tokens(rng, 4)

    ref_i = np.asarray(encode_image(params, cfg, imgs))
    ref_t = np.asarray(encode_text(params, cfg, toks))
    q_i = np.asarray(jax.jit(lambda p, x: encode_image(p, cfg, x))(qparams, imgs))
    q_t = np.asarray(jax.jit(lambda p, t: encode_text(p, cfg, t))(qparams, toks))
    assert _cos(ref_i, q_i).min() > 0.995
    assert _cos(ref_t, q_t).min() > 0.995

    # contrastive ranking survives quantization on this batch
    li_ref, _ = forward(params, cfg, imgs, toks)
    li_q, _ = forward(qparams, cfg, imgs, toks)
    assert (
        np.argmax(np.asarray(li_ref), axis=1) == np.argmax(np.asarray(li_q), axis=1)
    ).mean() >= 0.75


def test_resnet_convs_stay_float():
    params = init_params(jax.random.PRNGKey(0), TINY_RN)
    q = quantize_params(params)
    stem = q["visual"]["stem"]
    assert not isinstance(stem["conv1_w"], QuantWeight)
    assert stem["conv1_w"].dtype != jnp.int8
    # but the text tower quantized
    assert isinstance(q["text_transformer"]["attn"]["qkv_w"], QuantWeight)


def test_quantized_params_scan_under_remat():
    """Stacked QuantWeight leaves must survive lax.scan + jax.checkpoint."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    qparams = quantize_params(params)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    out = jax.jit(lambda p, x: encode_image(p, TINY, x, remat=True))(qparams, imgs)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_eval_cli_accepts_quantize(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from fixtures import make_voa_fixture

    voa = make_voa_fixture(str(tmp_path / "voa"))
    cfg = {
        "model": {
            "embed_dim": 64, "image_resolution": 32, "vision_layers": 2,
            "vision_width": 64, "vision_patch_size": 16, "context_length": 77,
            "vocab_size": 49408, "transformer_width": 64, "transformer_heads": 1,
            "transformer_layers": 2,
        },
        "quantize": "int8",
        "image_caption_json": [voa["mapping_json"]],
        "image_dir": [voa["image_dir"]],
        "batch_size": 4,
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    proc = subprocess.run(
        [sys.executable, "eval_matching.py", "--cfg", str(cfg_path)],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert "i2t_top1" in metrics
