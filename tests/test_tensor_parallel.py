"""Tensor-parallel sharding tests on the virtual 8-device mesh: tp-sharded
forward/gradients match replicated execution exactly."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from clip_event_tpu.engine.train_step import loss_fn  # noqa: E402
from clip_event_tpu.models import init_params  # noqa: E402
from clip_event_tpu.parallel.sharding import (  # noqa: E402
    make_mesh_2d,
    param_shardings,
    shard_params,
)
from tests.test_model_parity import TINY_VIT  # noqa: E402
from tests.test_train_step import _make_batch  # noqa: E402


def test_mesh_2d_shape():
    mesh = make_mesh_2d(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}


def test_param_sharding_rules():
    mesh = make_mesh_2d(dp=2, tp=4)
    params = init_params(jax.random.PRNGKey(0), TINY_VIT)
    shardings = param_shardings(params, mesh)
    txt = shardings["text_transformer"]["attn"]
    # qkv 3W=192 divides tp=4 → column parallel
    assert txt["qkv_w"].spec == P(None, None, "tp")
    assert txt["out_w"].spec == P(None, "tp", None)
    mlp = shardings["text_transformer"]["mlp"]
    assert mlp["fc_w"].spec == P(None, None, "tp")
    assert mlp["proj_w"].spec == P(None, "tp", None)
    # vocab 128 divides 4 → vocab parallel
    assert shardings["token_embedding"].spec == P("tp", None)
    # layer norms replicate
    assert shardings["ln_final"]["scale"].spec == P()
    # vision config width 64: head-compat still divides; class embedding replicated
    assert shardings["visual"]["class_embedding"].spec == P()


def test_tp_forward_and_grads_match_replicated():
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(1), cfg)
    batch = _make_batch(cfg, seed=1)

    grad_fn = jax.jit(
        jax.value_and_grad(
            lambda p, b: loss_fn(p, b, cfg, "ce", True, False, False, jnp.float32)[0]
        )
    )
    loss_ref, grads_ref = grad_fn(params, batch)

    mesh = make_mesh_2d(dp=2, tp=4)
    params_tp = shard_params(params, mesh)
    batch_tp = {
        k: jax.device_put(
            np.asarray(v),
            NamedSharding(mesh, P("dp") if np.asarray(v).ndim and np.asarray(v).shape[0] % 2 == 0 else P()),
        )
        for k, v in batch.items()
    }
    loss_tp, grads_tp = grad_fn(params_tp, batch_tp)

    np.testing.assert_allclose(float(loss_ref), float(loss_tp), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_tp_unit_mesh_replicates():
    mesh = make_mesh_2d(dp=8, tp=1)
    params = init_params(jax.random.PRNGKey(2), TINY_VIT)
    shardings = param_shardings(params, mesh)
    assert all(s.spec == P() for s in jax.tree.leaves(shardings))
