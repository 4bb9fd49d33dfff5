"""Pallas IPOT kernel vs the pure-JAX solver (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from clip_event_tpu.ops.ot import ipot  # noqa: E402
from clip_event_tpu.ops.ot_pallas import ipot_pallas  # noqa: E402
from tests.test_ot import _make_inputs  # noqa: E402
from clip_event_tpu.ops.ot import cost_matrix_cosine  # noqa: E402


@pytest.mark.parametrize("shape", [(2, 7, 5), (3, 16, 16), (1, 1, 9)])
def test_pallas_matches_reference_solver(shape):
    B, M, N = shape
    txt, img, txt_pad, img_pad = _make_inputs(B=B, M=M, N=N, seed=42)
    joint_pad = txt_pad[:, :, None] | img_pad[:, None, :]
    cost = np.asarray(cost_matrix_cosine(jnp.asarray(txt), jnp.asarray(img)))
    cost = np.where(joint_pad, 0.0, cost)
    x_len = (M - txt_pad.sum(1)).astype(np.float32)
    y_len = (N - img_pad.sum(1)).astype(np.float32)

    ref = np.asarray(
        ipot(jnp.asarray(cost), x_len, txt_pad, y_len, img_pad, joint_pad, 0.5, 50, 1)
    )
    ours = np.asarray(
        ipot_pallas(
            jnp.asarray(cost), x_len, txt_pad, y_len, img_pad, interpret=True
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_pallas_k2_inner_iterations():
    txt, img, txt_pad, img_pad = _make_inputs(B=2, M=6, N=4, seed=7)
    joint_pad = txt_pad[:, :, None] | img_pad[:, None, :]
    cost = np.where(joint_pad, 0.0, np.asarray(cost_matrix_cosine(jnp.asarray(txt), jnp.asarray(img))))
    x_len = (6 - txt_pad.sum(1)).astype(np.float32)
    y_len = (4 - img_pad.sum(1)).astype(np.float32)
    ref = np.asarray(ipot(jnp.asarray(cost), x_len, txt_pad, y_len, img_pad, joint_pad, 0.5, 10, 2))
    ours = np.asarray(
        ipot_pallas(jnp.asarray(cost), x_len, txt_pad, y_len, img_pad, iterations=10, k=2, interpret=True)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_alignment_loss_auto_mode():
    """use_pallas='auto' selects by static node caps and matches both
    explicit settings numerically."""
    from clip_event_tpu.ops.ot import alignment_loss

    rng = np.random.default_rng(3)
    B, M, N, E = 2, 33, 34, 16  # ≥32 real nodes each → auto picks pallas
    ent = jnp.asarray(rng.normal(size=(B, M, E)), jnp.float32)
    obj = jnp.asarray(rng.normal(size=(B, N, E)), jnp.float32)
    ent_mask = jnp.ones((B, M), jnp.int32)
    obj_mask = jnp.ones((B, N), jnp.int32)
    base = alignment_loss(ent, obj, ent_mask, obj_mask, use_pallas=False)
    auto = alignment_loss(ent, obj, ent_mask, obj_mask, use_pallas="auto")
    np.testing.assert_allclose(np.asarray(auto), np.asarray(base), rtol=2e-5)

    small = alignment_loss(ent[:, :8], obj[:, :9], ent_mask[:, :8],
                           obj_mask[:, :9], use_pallas="auto")
    ref_small = alignment_loss(ent[:, :8], obj[:, :9], ent_mask[:, :8],
                               obj_mask[:, :9], use_pallas=False)
    np.testing.assert_allclose(np.asarray(small), np.asarray(ref_small), rtol=2e-5)
