"""Fused Pallas attention vs the jnp reference path (interpret on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from clip_event_tpu.models import layers as L  # noqa: E402
from clip_event_tpu.ops.attention_pallas import fused_attention  # noqa: E402


def _ref_attention(q, k, v, bias, scale):
    logits = jnp.einsum("bqd,bkd->bqk", q * scale, k)
    if bias is not None:
        logits = logits + bias
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v)


@pytest.mark.parametrize("S,D", [(77, 64), (50, 64), (16, 32)])
def test_forward_matches_reference(S, D):
    rng = np.random.default_rng(0)
    BH = 6
    q = rng.normal(size=(BH, S, D)).astype(np.float32)
    k = rng.normal(size=(BH, S, D)).astype(np.float32)
    v = rng.normal(size=(BH, S, D)).astype(np.float32)
    scale = D**-0.5
    ref = np.asarray(_ref_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, scale))
    ours = np.asarray(fused_attention(q, k, v, None, scale, True))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_forward_with_causal_bias():
    rng = np.random.default_rng(1)
    BH, S, D = 4, 77, 64
    q = rng.normal(size=(BH, S, D)).astype(np.float32)
    k = rng.normal(size=(BH, S, D)).astype(np.float32)
    v = rng.normal(size=(BH, S, D)).astype(np.float32)
    bias = np.asarray(L.causal_mask(S))
    scale = D**-0.5
    ref = np.asarray(_ref_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias), scale))
    ours = np.asarray(fused_attention(q, k, v, jnp.asarray(bias), scale, True))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_gradients_match_reference():
    rng = np.random.default_rng(2)
    BH, S, D = 3, 50, 32
    q = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    bias = jnp.asarray(np.asarray(L.causal_mask(S)))
    scale = D**-0.5
    w = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v, bias, scale) * w)

    def loss_ours(q, k, v):
        return jnp.sum(fused_attention(q, k, v, bias, scale, True) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_mha_layer_pallas_matches_xla():
    rng = np.random.default_rng(3)
    B, S, W, H = 2, 16, 64, 2
    x = jnp.asarray(rng.normal(size=(B, S, W)).astype(np.float32))
    params = {
        "qkv_w": jnp.asarray(rng.normal(size=(W, 3 * W)).astype(np.float32) * 0.05),
        "qkv_b": jnp.zeros(3 * W),
        "out_w": jnp.asarray(rng.normal(size=(W, W)).astype(np.float32) * 0.05),
        "out_b": jnp.zeros(W),
    }
    bias = L.causal_mask(S)
    ref = np.asarray(L.multi_head_attention(x, params, H, bias))
    L.set_attention_impl("pallas")
    try:
        from clip_event_tpu.ops import attention_pallas

        # interpret mode on CPU
        orig = attention_pallas.fused_attention
        ours = None
        import functools

        def patched(q, k, v, b, scale, interpret=False):
            return orig(q, k, v, b, scale, True)

        attention_pallas.fused_attention = patched
        try:
            ours = np.asarray(L.multi_head_attention(x, params, H, bias))
        finally:
            attention_pallas.fused_attention = orig
    finally:
        L.set_attention_impl("xla")
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
