"""IPOT optimal-transport parity vs the reference torch implementation."""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, reference_available

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from clip_event_tpu.ops.ot import (  # noqa: E402
    alignment_loss,
    cost_matrix_cosine,
    optimal_transport_dist,
)


def _make_inputs(B=4, M=7, N=5, D=16, seed=0, with_empty=False):
    rng = np.random.default_rng(seed)
    txt = rng.normal(size=(B, M, D)).astype(np.float32)
    img = rng.normal(size=(B, N, D)).astype(np.float32)
    txt_len = rng.integers(1, M + 1, size=B)
    img_len = rng.integers(1, N + 1, size=B)
    if with_empty:
        txt_len[0] = 0
    txt_pad = np.arange(M)[None, :] >= txt_len[:, None]
    img_pad = np.arange(N)[None, :] >= img_len[:, None]
    return txt, img, txt_pad, img_pad


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_ot_distance_matches_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import model_ot as ref_ot
    finally:
        sys.path.remove(REFERENCE_DIR)

    txt, img, txt_pad, img_pad = _make_inputs()
    ref = ref_ot.optimal_transport_dist(
        torch.from_numpy(txt),
        torch.from_numpy(img),
        torch.from_numpy(txt_pad),
        torch.from_numpy(img_pad),
    ).numpy()
    ours = np.asarray(optimal_transport_dist(txt, img, txt_pad, img_pad, safe=False))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_cost_matrix_matches_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import model_ot as ref_ot
    finally:
        sys.path.remove(REFERENCE_DIR)
    txt, img, _, _ = _make_inputs(seed=3)
    ref = ref_ot.cost_matrix_cosine(torch.from_numpy(txt), torch.from_numpy(img)).numpy()
    ours = np.asarray(cost_matrix_cosine(txt, img))
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-5)


def test_gradient_flows_through_cost_only():
    txt, img, txt_pad, img_pad = _make_inputs(B=2)

    def loss(t, i):
        return optimal_transport_dist(t, i, txt_pad, img_pad, safe=True).sum()

    g_txt, g_img = jax.grad(loss, argnums=(0, 1))(jnp.asarray(txt), jnp.asarray(img))
    assert np.isfinite(np.asarray(g_txt)).all()
    assert np.isfinite(np.asarray(g_img)).all()
    assert np.abs(np.asarray(g_txt)).max() > 0


def test_safe_mode_handles_empty_graphs():
    txt, img, txt_pad, img_pad = _make_inputs(with_empty=True)
    dist = np.asarray(optimal_transport_dist(txt, img, txt_pad, img_pad, safe=True))
    assert np.isfinite(dist).all()
    assert dist[0] == 0.0


def test_alignment_loss_shape_and_scale():
    rng = np.random.default_rng(1)
    B, M, N, E = 3, 4, 6, 8
    ent = rng.normal(size=(B, M, E)).astype(np.float32)
    obj = rng.normal(size=(B, N, E)).astype(np.float32)
    ent_mask = np.ones((B, M), np.int32)
    obj_mask = np.ones((B, N), np.int32)
    loss = alignment_loss(ent, obj, ent_mask, obj_mask)
    assert loss.shape == ()
    # scale 0.01 · Σ dist: dist per item is bounded by ~2·min(M,N)
    assert 0 <= float(loss) < 2 * min(M, N - 1) * B * 0.01 + 1
