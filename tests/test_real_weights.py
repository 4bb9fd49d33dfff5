"""Real-weight validation (BASELINE.md parity gate on actual OpenAI CLIP).

This sandbox has ZERO network egress (verified 2026-08-16: DNS resolution
fails for openaipublic.azureedge.net — recorded in PERFORMANCE.md), so the
OpenAI archives cannot be downloaded here. These tests run automatically
wherever weights exist: set CLIP_EVENT_REAL_WEIGHTS to a ViT-B/32 archive
(`ViT-B-32.pt`, JIT or state_dict) or place it in the zoo cache
(`~/.cache/clip_event_tpu`). On a connected host:

    python -c "from clip_event_tpu import zoo; zoo.download('ViT-B/32')"
    pytest tests/test_real_weights.py -v
"""

import io
import os

import numpy as np
import pytest

from tests.conftest import reference_available

jax = pytest.importorskip("jax")


def _find_weights():
    explicit = os.environ.get("CLIP_EVENT_REAL_WEIGHTS")
    if explicit and os.path.exists(explicit):
        return explicit
    cache = os.path.expanduser("~/.cache/clip_event_tpu")
    for name in ("ViT-B-32.pt", "ViT-B-16.pt", "RN50.pt", "ViT-L-14.pt"):
        path = os.path.join(cache, name)
        if os.path.exists(path):
            return path
    return None


WEIGHTS = _find_weights()
needs_weights = pytest.mark.skipif(
    WEIGHTS is None,
    reason="real CLIP weights not available (no egress in this sandbox; "
    "set CLIP_EVENT_REAL_WEIGHTS — see tests/test_real_weights.py docstring)",
)


def _real_jpeg(size=480, seed=0):
    """A JPEG-encoded photo-like image, decoded through the production
    preprocess path (decode → bicubic resize → center crop → normalize)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    # smooth gradients + texture so JPEG/bicubic actually do work
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.stack([x, y, (x + y) / 2], -1) * 200 + rng.normal(0, 12, (size, size, 3))
    buf = io.BytesIO()
    Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(buf, "JPEG", quality=92)
    buf.seek(0)
    return buf


@needs_weights
@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_real_weight_encoder_parity():
    """Our encoders on real OpenAI weights + real JPEG inputs must match the
    reference torch model at atol 1e-4 (BASELINE.md gate; reference load
    path clip.py:77-165)."""
    import torch
    from PIL import Image

    from clip_event_tpu import zoo
    from clip_event_tpu.models import encode_image, encode_text, state_dict_from_params
    from tests.test_model_parity import _reference_model

    params, cfg, preprocess = zoo.load(WEIGHTS)
    sd = state_dict_from_params(jax.tree.map(np.asarray, params), cfg)
    ref = _reference_model(sd)

    images = np.stack([
        preprocess(np.asarray(Image.open(_real_jpeg(seed=s)).convert("RGB")))
        for s in range(3)
    ])
    tokens = np.asarray(zoo.tokenize([
        "a photo of a protest in the city",
        "soldiers marching near a damaged building",
        "a man giving a speech at a podium",
    ]))

    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(tokens.astype(np.int64))).numpy()

    our_img = np.asarray(encode_image(params, cfg, images))
    our_txt = np.asarray(encode_text(params, cfg, tokens))
    np.testing.assert_allclose(our_img, ref_img, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(our_txt, ref_txt, atol=1e-4, rtol=1e-4)


@needs_weights
def test_real_weight_zero_shot_sanity():
    """Real weights must rank the matching caption first on a trivially
    separable probe (a solid red vs solid blue image)."""
    from PIL import Image

    from clip_event_tpu import zoo
    from clip_event_tpu.models import encode_image, encode_text
    from clip_event_tpu.models.clip import l2_normalize

    params, cfg, preprocess = zoo.load(WEIGHTS)
    red = np.zeros((256, 256, 3), np.uint8); red[..., 0] = 220
    blue = np.zeros((256, 256, 3), np.uint8); blue[..., 2] = 220
    images = np.stack([preprocess(red), preprocess(blue)])
    tokens = np.asarray(zoo.tokenize(["a red image", "a blue image"]))

    img = np.asarray(l2_normalize(encode_image(params, cfg, images)))
    txt = np.asarray(l2_normalize(encode_text(params, cfg, tokens)))
    logits = img @ txt.T
    assert logits[0, 0] > logits[0, 1] and logits[1, 1] > logits[1, 0]


@needs_weights
def test_real_weight_static_int8_cosine():
    """Self-arming validation of the static-int8 caveat (`ops/quant.py`):
    real pretrained CLIP activations carry outliers that per-tensor static
    scales handle worse than random init, so when real weights are
    available, calibrate on real photos and assert the quantized encoders
    stay within the cosine budget on held-out inputs. If this fails on real
    weights, ship the dynamic path (`quantize: int8`) instead."""
    from PIL import Image

    from clip_event_tpu import zoo
    from clip_event_tpu.models import encode_image, encode_text
    from clip_event_tpu.ops.quant import calibrate_act_scales, quantize_params

    params, cfg, preprocess = zoo.load(WEIGHTS)
    cal_imgs = np.stack([
        preprocess(np.asarray(Image.open(_real_jpeg(seed=s)).convert("RGB")))
        for s in (10, 11, 12, 13)
    ])
    cal_toks = np.asarray(zoo.tokenize([
        "a photo of a person", "a crowd at a rally",
        "a building on fire", "officials at a meeting",
    ]))
    stats = calibrate_act_scales(params, cfg, [cal_imgs], [cal_toks])
    sparams = quantize_params(params, act_stats=stats)

    images = np.stack([
        preprocess(np.asarray(Image.open(_real_jpeg(seed=s)).convert("RGB")))
        for s in range(3)
    ])
    tokens = np.asarray(zoo.tokenize([
        "a photo of a protest in the city",
        "soldiers marching near a damaged building",
        "a man giving a speech at a podium",
    ]))

    def cos(a, b):
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        return (a * b).sum(-1)

    ref_i = np.asarray(encode_image(params, cfg, images))
    ref_t = np.asarray(encode_text(params, cfg, tokens))
    q_i = np.asarray(jax.jit(lambda p, x: encode_image(p, cfg, x))(sparams, images))
    q_t = np.asarray(jax.jit(lambda p, t: encode_text(p, cfg, t))(sparams, tokens))
    assert cos(ref_i, q_i).min() > 0.99, cos(ref_i, q_i)
    assert cos(ref_t, q_t).min() > 0.99, cos(ref_t, q_t)
