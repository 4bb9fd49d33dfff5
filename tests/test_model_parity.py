"""Encoder parity vs the reference PyTorch implementation.

We initialize our JAX CLIP with random weights, export them to an
OpenAI-format state_dict, build the *reference* torch model from it via its
own shape-inferring `build_model` (`model_clip.py:578`), and require matching
outputs at atol 1e-4 (the BASELINE.md parity gate), on small configs for both
towers.
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, reference_available

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from clip_event_tpu.models import (  # noqa: E402
    CLIPConfig,
    encode_image,
    encode_text,
    forward,
    init_params,
    params_from_state_dict,
    state_dict_from_params,
)

TINY_VIT = CLIPConfig(
    embed_dim=64,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=16,
    vocab_size=128,
    transformer_width=64,
    transformer_heads=1,
    transformer_layers=2,
)
TINY_RN = CLIPConfig(
    embed_dim=32,
    image_resolution=32,
    vision_layers=(1, 1, 1, 1),
    vision_width=16,
    vision_patch_size=None,
    context_length=16,
    vocab_size=128,
    transformer_width=64,
    transformer_heads=1,
    transformer_layers=2,
)


def _reference_model(state_dict):
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from model_clip import build_model
    finally:
        sys.path.remove(REFERENCE_DIR)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in state_dict.items()}
    model = build_model(sd)
    model.eval()
    return model


def _rand_inputs(cfg, batch=3, descriptions=2, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.normal(size=(batch, cfg.image_resolution, cfg.image_resolution, 3)).astype(
        np.float32
    )
    tokens = rng.integers(1, cfg.vocab_size - 2, size=(batch * descriptions, cfg.context_length))
    eot_pos = rng.integers(2, cfg.context_length, size=batch * descriptions)
    tokens[np.arange(batch * descriptions), eot_pos] = cfg.vocab_size - 1
    return images, tokens.astype(np.int32)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("cfg", [TINY_VIT, TINY_RN], ids=["vit", "resnet"])
def test_encoders_match_reference(cfg):
    params = init_params(jax.random.PRNGKey(0), cfg)
    sd = state_dict_from_params(jax.tree.map(np.asarray, params), cfg)
    ref = _reference_model(sd)

    images, tokens = _rand_inputs(cfg)
    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(tokens.astype(np.int64))).numpy()

    our_img = np.asarray(encode_image(params, cfg, images))
    our_txt = np.asarray(encode_text(params, cfg, tokens))

    np.testing.assert_allclose(our_img, ref_img, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(our_txt, ref_txt, atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("overbatch", [True, False], ids=["overbatch", "instance"])
def test_forward_logits_match_reference(overbatch):
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(1), cfg)
    sd = state_dict_from_params(jax.tree.map(np.asarray, params), cfg)
    ref = _reference_model(sd)
    ref.set_hyps(constrastive_overbatch=overbatch)

    images, tokens = _rand_inputs(cfg, batch=2, descriptions=3, seed=1)
    with torch.no_grad():
        ref_li, ref_lt = ref(
            torch.from_numpy(images.transpose(0, 3, 1, 2)),
            torch.from_numpy(tokens.astype(np.int64)),
        )

    our_li, our_lt = forward(params, cfg, images, tokens, overbatch=overbatch)
    np.testing.assert_allclose(np.asarray(our_li), ref_li.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(our_lt), ref_lt.numpy(), atol=1e-4, rtol=1e-4)


def test_state_dict_roundtrip():
    for cfg in (TINY_VIT, TINY_RN):
        params = init_params(jax.random.PRNGKey(2), cfg)
        params = jax.tree.map(np.asarray, params)
        sd = state_dict_from_params(params, cfg)
        params2, cfg2 = params_from_state_dict(sd)
        assert cfg2 == cfg
        flat1 = jax.tree.leaves(params)
        flat2 = jax.tree.leaves(params2)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grid_features_shape():
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(3), cfg)
    images, _ = _rand_inputs(cfg)
    grid = encode_image(params, cfg, images, use_grid=True)
    assert grid.shape == (3, cfg.grid_size**2 + 1, cfg.embed_dim)


def test_resnet_batch_bn_mode():
    """Batch-stats BN runs and differs from frozen stats once stats diverge."""
    from clip_event_tpu.models import resnet as R

    cfg = TINY_RN
    params = init_params(jax.random.PRNGKey(4), cfg)
    # make running stats wrong on purpose
    params["visual"]["stem"]["bn1"]["mean"] = (
        params["visual"]["stem"]["bn1"]["mean"] + 3.0
    )
    images, _ = _rand_inputs(cfg, batch=4)
    frozen = np.asarray(encode_image(params, cfg, images))
    R.set_bn_mode("batch")
    try:
        batch_mode = np.asarray(encode_image(params, cfg, images))
    finally:
        R.set_bn_mode("frozen")
    assert np.isfinite(batch_mode).all()
    assert np.abs(frozen - batch_mode).max() > 1e-3


def test_cast_params_bf16():
    import jax.numpy as jnp

    from clip_event_tpu.models.clip import cast_params

    params = init_params(jax.random.PRNGKey(5), TINY_VIT)
    half = cast_params(params, jnp.bfloat16)
    assert half["text_projection"].dtype == jnp.bfloat16
    assert half["visual"]["patch_embed_w"].dtype == jnp.bfloat16
    # norm islands + logit scale stay f32
    assert half["ln_final"]["scale"].dtype == jnp.float32
    assert half["visual"]["ln_pre"]["bias"].dtype == jnp.float32
    assert half["logit_scale"].dtype == jnp.float32
    # model still runs
    images, tokens = _rand_inputs(TINY_VIT)
    out = encode_image(half, TINY_VIT, images, compute_dtype=jnp.bfloat16)
    assert np.isfinite(np.asarray(out, np.float32)).all()
