"""Parity of the fused LayerNorm kernels vs the XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_event_tpu.models.layers import layer_norm
from clip_event_tpu.ops.ln_pallas import (
    add_layer_norm_pallas,
    layer_norm_pallas,
    ln_supported,
    sharded_ln,
)


def _params(w, key):
    k1, k2 = jax.random.split(key)
    return {
        "scale": 1.0 + 0.1 * jax.random.normal(k1, (w,)),
        "bias": 0.1 * jax.random.normal(k2, (w,)),
    }


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(4, 7, 128), (13, 256)])
def test_layer_norm_forward_parity(dtype, shape):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape).astype(dtype)
    p = _params(shape[-1], jax.random.PRNGKey(1))
    ref = layer_norm(x, p)
    got = layer_norm_pallas(x, p["scale"], p["bias"])
    assert got.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2 if dtype == jnp.bfloat16 else 1e-6,
    )


def test_layer_norm_grad_parity():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (6, 9, 128), jnp.float32)
    p = _params(128, jax.random.PRNGKey(3))
    w = jax.random.normal(jax.random.PRNGKey(4), x.shape)

    def loss_ref(x, s, b):
        return jnp.sum(layer_norm(x, {"scale": s, "bias": b}) * w)

    def loss_ker(x, s, b):
        return jnp.sum(layer_norm_pallas(x, s, b) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, p["scale"], p["bias"])
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(x, p["scale"], p["bias"])
    for a, b in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_add_layer_norm_forward_parity(dtype):
    k = jax.random.split(jax.random.PRNGKey(5), 3)
    res = jax.random.normal(k[0], (3, 11, 256)).astype(dtype)
    delta = jax.random.normal(k[1], (3, 11, 256)).astype(dtype)
    p = _params(256, k[2])
    x_ref = res + delta
    y_ref = layer_norm(x_ref, p)
    x, y = add_layer_norm_pallas(res, delta, p["scale"], p["bias"])
    np.testing.assert_allclose(
        np.asarray(x, np.float32), np.asarray(x_ref, np.float32), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        atol=2e-2 if dtype == jnp.bfloat16 else 1e-6,
    )


def test_add_layer_norm_grad_parity():
    """Both outputs carry cotangents — the residual-carry dx must combine
    with the LN backward exactly as the unfused graph does."""
    k = jax.random.split(jax.random.PRNGKey(6), 5)
    res = jax.random.normal(k[0], (5, 8, 128), jnp.float32)
    delta = jax.random.normal(k[1], (5, 8, 128), jnp.float32)
    p = _params(128, k[2])
    wx = jax.random.normal(k[3], res.shape)
    wy = jax.random.normal(k[4], res.shape)

    def loss_ref(r, d, s, b):
        x = r + d
        y = layer_norm(x, {"scale": s, "bias": b})
        return jnp.sum(x * wx) + jnp.sum(y * wy)

    def loss_ker(r, d, s, b):
        x, y = add_layer_norm_pallas(r, d, s, b)
        return jnp.sum(x * wx) + jnp.sum(y * wy)

    args = (res, delta, p["scale"], p["bias"])
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_supported_gate():
    assert ln_supported(512) and ln_supported(768) and ln_supported(640)
    assert not ln_supported(96)


@pytest.mark.parametrize("remat", [False, "full"])
def test_transformer_ln_impl_parity(remat):
    """transformer(ln='pallas') == transformer(ln='xla') for value AND grads,
    with and without remat (the ln choice is a static checkpoint arg)."""
    from clip_event_tpu.models import layers as L

    stacked = L.init_transformer(jax.random.PRNGKey(9), 2, 128)
    x = jax.random.normal(jax.random.PRNGKey(10), (3, 16, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(11), x.shape)

    def loss(xx, pp, ln):
        out = L.transformer(xx, pp, 4, remat=remat, impl="xla", ln=ln)
        return jnp.sum(out * w)

    v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(x, stacked, "xla")
    v_ker, g_ker = jax.value_and_grad(loss, argnums=(0, 1))(
        x, stacked, ("pallas", None)
    )
    np.testing.assert_allclose(float(v_ker), float(v_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_sharded_ln_matches_local():
    """shard_map over the virtual mesh == the unsharded kernel."""
    from clip_event_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    if mesh.devices.size < 2:
        pytest.skip("needs the virtual multi-device mesh")
    x = jax.random.normal(jax.random.PRNGKey(7), (8, 5, 128), jnp.float32)
    p = _params(128, jax.random.PRNGKey(8))
    ref = layer_norm_pallas(x, p["scale"], p["bias"])
    got = sharded_ln(
        lambda x, s, b: layer_norm_pallas(x, s, b),
        (x, p["scale"], p["bias"]), mesh, "dp",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
