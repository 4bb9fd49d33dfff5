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


@pytest.fixture
def pallas_gemm():
    from clip_event_tpu.ops import quant

    quant.set_gemm_impl("pallas")
    try:
        yield
    finally:
        quant.set_gemm_impl("auto")


@pytest.mark.parametrize(
    "m,k,n,bias,dtype",
    [
        (77, 512, 1536, True, jnp.bfloat16),   # text-tower QKV shape
        (200, 768, 512, False, jnp.float32),   # M needs padding to the block
        (33, 384, 128, True, jnp.bfloat16),    # minimum-width output block
    ],
)
def test_quant_pallas_gemm_matches_xla_path(pallas_gemm, m, k, n, bias, dtype):
    """The fused kernel (interpret mode on CPU) tracks the XLA int8
    composition to within quantization noise. Not bit-exact: the in-kernel
    /127 can lower with a 1-ulp different row scale, which is one int8
    rounding step on a handful of elements (module docstring)."""
    from clip_event_tpu.ops import quant
    from clip_event_tpu.ops.quant_pallas import quantized_matmul_supported

    assert quantized_matmul_supported(k, n)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, k)), dtype)
    w = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(n,)), jnp.float32) if bias else None
    qw = quantize_weight(w)

    out = np.asarray(quantized_linear(x, qw, b), np.float32)
    quant.set_gemm_impl("xla")
    ref = np.asarray(quantized_linear(x, qw, b), np.float32)
    assert np.abs(out - ref).max() <= 0.03 * np.abs(ref).max()
    assert _cos(out, ref).min() > 0.9999


def test_quant_pallas_gemm_gate_and_auto():
    """Non-conforming reduction dims (e.g. ViT-L/14's 588-wide patch embed)
    must fall back to the XLA composition even under impl='pallas', and
    `auto` must resolve to the XLA composition (the kernel measured slower —
    module docstring)."""
    from clip_event_tpu.ops import quant
    from clip_event_tpu.ops.quant_pallas import quantized_matmul_supported

    assert not quantized_matmul_supported(588, 1024)
    assert quantized_matmul_supported(512, 1536)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 588)), jnp.float32)
    qw = quantize_weight(jnp.asarray(rng.normal(size=(588, 256)), jnp.float32))
    quant.set_gemm_impl("pallas")
    try:
        out = quantized_linear(x, qw, None)
    finally:
        quant.set_gemm_impl("auto")
    ref = quantized_linear(x, qw, None)  # auto on CPU == xla
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert not quant._pallas_enabled()  # auto == xla composition


def test_quantized_towers_with_pallas_gemm(pallas_gemm):
    """Full encoders at a 128-wide config (so the kernel actually engages)
    stay within the same cosine budget as the XLA int8 path."""
    cfg = CLIPConfig(128, 32, 2, 128, 16, 77, 49408, 128, 2, 2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    toks = _tokens(rng, 4)
    ref_i = np.asarray(encode_image(params, cfg, imgs))
    ref_t = np.asarray(encode_text(params, cfg, toks))
    q_i = np.asarray(jax.jit(lambda p, x: encode_image(p, cfg, x))(qparams, imgs))
    q_t = np.asarray(jax.jit(lambda p, t: encode_text(p, cfg, t))(qparams, toks))
    assert _cos(ref_i, q_i).min() > 0.995
    assert _cos(ref_t, q_t).min() > 0.995


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


def test_transformer_with_act_stats_matches_forward():
    """The calibration forward must be the SAME forward: output identical to
    transformer(impl='xla'), stats shaped [L] per dense site."""
    from clip_event_tpu.models import layers as L

    W, H, LAYERS, S = 64, 2, 3, 16
    tt = L.init_transformer(jax.random.PRNGKey(0), LAYERS, W)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, S, W)), jnp.float32)
    bias = L.causal_mask(S)
    ref = L.transformer(x, tt, H, bias, impl="xla")
    out, stats = L.transformer_with_act_stats(x, tt, H, bias)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    for site in ("attn", "mlp"):
        for k, v in stats[site].items():
            assert v.shape == (LAYERS,), (site, k, v.shape)
            assert (np.asarray(v) > 0).all()


def test_static_quantized_towers_generalize():
    """Static activation scales calibrated on one batch keep the encoders
    within the accuracy budget on a DIFFERENT batch (the serving contract:
    calibrate offline once, run on unseen data)."""
    from clip_event_tpu.ops.quant import calibrate_act_scales

    cfg = CLIPConfig(128, 32, 2, 128, 16, 77, 49408, 128, 2, 2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    cal_imgs = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    cal_toks = _tokens(rng, 8)
    stats = calibrate_act_scales(params, cfg, [cal_imgs], [cal_toks])
    sparams = quantize_params(params, act_stats=stats)
    # stacked transformer weights carry per-layer [L] static scales
    assert sparams["visual"]["transformer"]["attn"]["qkv_w"].act_scale.shape == (2,)
    assert sparams["text_projection"].act_scale.shape == ()

    eval_imgs = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    eval_toks = _tokens(rng, 4)
    ref_i = np.asarray(encode_image(params, cfg, eval_imgs))
    ref_t = np.asarray(encode_text(params, cfg, eval_toks))
    q_i = np.asarray(jax.jit(lambda p, x: encode_image(p, cfg, x))(sparams, eval_imgs))
    q_t = np.asarray(jax.jit(lambda p, t: encode_text(p, cfg, t))(sparams, eval_toks))
    assert _cos(ref_i, q_i).min() > 0.995
    assert _cos(ref_t, q_t).min() > 0.995


def test_eval_cli_accepts_quantize_static(tmp_path):
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
        "quantize": "int8_static",
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
    assert "int8 calibration" in proc.stderr
    metrics = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert "i2t_top1" in metrics


def test_quantize_towers_subset():
    """towers=("visual",) quantizes only the vision tower (the measured
    serving sweet spot: static-int8 vision + bf16 text) and the text path
    stays bit-identical to float."""
    from clip_event_tpu.ops.quant import calibrate_act_scales

    cfg = CLIPConfig(128, 32, 2, 128, 16, 77, 49408, 128, 2, 2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    stats = calibrate_act_scales(
        params, cfg,
        [rng.normal(size=(4, 32, 32, 3)).astype(np.float32)],
        [_tokens(rng, 4)],
    )
    mixed = quantize_params(params, act_stats=stats, towers=("visual",))
    assert isinstance(mixed["visual"]["transformer"]["attn"]["qkv_w"], QuantWeight)
    assert mixed["visual"]["transformer"]["attn"]["qkv_w"].act_scale is not None
    assert not isinstance(mixed["text_transformer"]["attn"]["qkv_w"], QuantWeight)
    assert not isinstance(mixed["text_projection"], QuantWeight)

    toks = _tokens(rng, 4)
    ref_t = encode_text(params, cfg, toks)
    out_t = encode_text(mixed, cfg, toks)
    np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(out_t))

    with pytest.raises(ValueError):
        quantize_params(params, towers=("vision",))
