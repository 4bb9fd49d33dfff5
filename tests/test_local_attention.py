"""Local-attention (multiattention) path tests: window math parity with the
reference bbox→patch mapping, pooled features vs an explicit loop, and the
full loss through the train step."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from clip_event_tpu.models.local_attention import (  # noqa: E402
    bbox_window_weights,
    local_attention_loss,
    pool_bbox_features,
)
from clip_event_tpu.models import init_params  # noqa: E402
from clip_event_tpu.ops.bbox import patch_from_norm_bbox  # noqa: E402
from tests.test_model_parity import TINY_VIT  # noqa: E402

GRID = 7


def test_window_matches_reference_mapping():
    rng = np.random.default_rng(0)
    boxes = rng.uniform(0, 1, size=(1, 5, 4)).astype(np.float32)
    boxes[..., 2:] = np.maximum(boxes[..., 2:], boxes[..., :2] + 1e-3)
    mask = np.ones((1, 5), np.int32)
    weights = np.asarray(bbox_window_weights(jnp.asarray(boxes), jnp.asarray(mask), GRID))
    for r in range(5):
        # reference mapping (utils_image.py:28-32): (x0, y0, x1, y1) indices
        x0, y0, x1, y1 = patch_from_norm_bbox(boxes[0, r], GRID)
        expected = np.zeros((GRID, GRID))
        expected[max(y0, 0) : y1, max(x0, 0) : x1] = 1.0
        np.testing.assert_array_equal(
            weights[0, r].reshape(GRID, GRID), expected, err_msg=f"box {r}"
        )


def test_masked_boxes_have_zero_window():
    boxes = np.tile(np.array([0.1, 0.1, 0.9, 0.9], np.float32), (1, 3, 1))
    mask = np.array([[1, 0, 1]], np.int32)
    w = np.asarray(bbox_window_weights(jnp.asarray(boxes), jnp.asarray(mask), GRID))
    assert w[0, 0].sum() > 0
    assert w[0, 1].sum() == 0
    assert w[0, 2].sum() > 0


def test_mean_pooling_matches_loop():
    """Vectorized pooling equals the reference's per-box mean over the
    window (model_clip.py:438-442)."""
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(2, GRID * GRID, 16)).astype(np.float32)
    boxes = rng.uniform(0, 1, size=(2, 3, 4)).astype(np.float32)
    boxes[..., 2:] = np.minimum(boxes[..., :2] + rng.uniform(0.2, 0.5, (2, 3, 2)), 1.0)
    mask = np.ones((2, 3), np.int32)

    pooled = np.asarray(
        pool_bbox_features(jnp.asarray(feats), jnp.asarray(boxes), jnp.asarray(mask), GRID)
    )
    grid_feats = feats.reshape(2, GRID, GRID, 16)
    for b in range(2):
        for r in range(3):
            x0, y0, x1, y1 = patch_from_norm_bbox(boxes[b, r], GRID)
            # reference slices [x0:x1, y0:y1] on a (row, col) grid — i.e. it
            # treats axis0 as x; our layout is (row=y, col=x), so the window
            # mean is over [y0:y1, x0:x1]
            window = grid_feats[b, y0:y1, x0:x1].reshape(-1, 16)
            np.testing.assert_allclose(pooled[b, r], window.mean(0), rtol=1e-5)


def test_attention_pooling_shapes_and_masks():
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(2, GRID * GRID, 16)).astype(np.float32)
    cls = rng.normal(size=(2, 16)).astype(np.float32)
    boxes = np.tile(np.array([0.0, 0.0, 0.5, 0.5], np.float32), (2, 2, 1))
    mask = np.array([[1, 0], [1, 1]], np.int32)
    pooled = np.asarray(
        pool_bbox_features(
            jnp.asarray(feats), jnp.asarray(boxes), jnp.asarray(mask), GRID,
            mode="attention", cls_feats=jnp.asarray(cls),
        )
    )
    assert pooled.shape == (2, 2, 16)
    assert np.abs(pooled[0, 1]).max() == 0.0  # masked box → zero feature
    assert np.isfinite(pooled).all()


@pytest.mark.parametrize("train_arg", ["desc", "desc_type", "desc_type_text"])
def test_local_attention_loss_modes(train_arg):
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    B, R = 2, 3
    images = rng.normal(size=(B, cfg.image_resolution, cfg.image_resolution, 3)).astype(np.float32)
    boxes = rng.uniform(0, 0.5, size=(B, R, 4)).astype(np.float32)
    boxes[..., 2:] += 0.4
    mask = np.array([[1, 1, 0], [1, 0, 0]], np.int32)
    desc = rng.integers(1, cfg.vocab_size - 2, size=(B, R, cfg.context_length)).astype(np.int32)
    desc[..., -1] = cfg.vocab_size - 1
    label = rng.integers(1, cfg.vocab_size - 2, size=(B, R, cfg.context_length)).astype(np.int32)
    label[..., -1] = cfg.vocab_size - 1

    def loss(p):
        out = local_attention_loss(
            p, cfg, images, boxes, mask, desc, label_tokens=label, train_arg=train_arg
        )
        return out["loss_bbox"] + out["loss_arg"]

    value, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(value))
    grad_norm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert grad_norm > 0


def test_train_step_with_multiattention():
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import create_train_state, make_train_step
    from tests.test_train_step import _make_batch, B

    cfg = TINY_VIT
    rng = np.random.default_rng(4)
    batch = _make_batch(cfg, seed=4)
    R = 3
    batch["bbox"] = rng.uniform(0, 0.5, size=(B, R, 4)).astype(np.float32)
    batch["bbox"][..., 2:] += 0.4
    batch["bbox_mask"] = np.ones((B, R), np.int32)
    batch["bbox_desc_text"] = rng.integers(
        1, cfg.vocab_size - 2, size=(B, R, cfg.context_length)
    ).astype(np.int32)
    batch["bbox_label_text"] = batch["bbox_desc_text"].copy()

    opt = build_optimizer("adam", build_schedule("none", 1e-4, 2))
    step = make_train_step(
        cfg, opt, multiattention="desc_type", donate=False, remat=False
    )
    state = create_train_state(init_params(jax.random.PRNGKey(5), cfg), opt)
    state, metrics = step(state, batch)
    assert bool(metrics["finite"])
    assert "loss_bbox" in metrics and "loss_arg" in metrics
