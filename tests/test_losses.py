"""Contrastive criterion + label layout parity vs the reference."""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, reference_available

jax = pytest.importorskip("jax")

from clip_event_tpu.data.labels import build_label_layout  # noqa: E402
from clip_event_tpu.engine.losses import contrastive_loss  # noqa: E402


def test_label_layout_ce_overbatch():
    # docstring example of dataset_voa.py:619-663: B=4, D=3 (P=1, G=2)
    layout = build_label_layout(4, 1, 2, "ce", overbatch=True)
    np.testing.assert_array_equal(layout.labels_per_image, [0, 3, 6, 9])
    np.testing.assert_array_equal(
        layout.labels_per_text, [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    )
    np.testing.assert_array_equal(layout.index_pos, [0, 3, 6, 9])


def test_label_layout_bce_instance():
    # docstring example: B=2, P=2, G=2 → [[1,1,0,0],[1,1,0,0]], index [0,1,4,5]
    layout = build_label_layout(2, 2, 2, "bce", overbatch=False)
    np.testing.assert_array_equal(
        layout.labels_per_image, [[1, 1, 0, 0], [1, 1, 0, 0]]
    )
    np.testing.assert_array_equal(layout.index_pos, [0, 1, 4, 5])
    np.testing.assert_array_equal(layout.labels_per_text, [0, 0, 0, 0, 1, 1, 1, 1])


def test_label_layout_validation():
    with pytest.raises(ValueError):
        build_label_layout(2, 2, 2, "ce", overbatch=True)  # ce needs P==1
    with pytest.raises(ValueError):
        build_label_layout(2, 1, 2, "bce", overbatch=True)
    with pytest.raises(ValueError):
        build_label_layout(2, 1, 2, "kl", overbatch=False)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize(
    "loss_type,overbatch,num_pos",
    [("ce", True, 1), ("ce", False, 1), ("bce", False, 2)],
)
def test_criterion_matches_reference(loss_type, overbatch, num_pos):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from model_clip import CriterionContrastive
    finally:
        sys.path.remove(REFERENCE_DIR)

    B, num_neg = 4, 2
    D = num_pos + num_neg
    rng = np.random.default_rng(0)
    logits_per_text = rng.normal(size=(B * D, B)).astype(np.float32)
    if overbatch:
        logits_per_image = rng.normal(size=(B, B * D)).astype(np.float32)
    else:
        logits_per_image = rng.normal(size=(B, D)).astype(np.float32)

    layout = build_label_layout(B, num_pos, num_neg, loss_type, overbatch)

    ref_criterion = CriterionContrastive(loss_type)
    ref_labels_i = torch.from_numpy(np.asarray(layout.labels_per_image))
    if loss_type == "ce":
        ref_labels_i = ref_labels_i.long()
    ref_out = ref_criterion(
        torch.from_numpy(logits_per_image),
        torch.from_numpy(logits_per_text),
        ref_labels_i,
        torch.from_numpy(layout.labels_per_text).long(),
        index_pos=torch.from_numpy(layout.index_pos).long(),
        constrastive_overbatch=overbatch,
    )

    ours = contrastive_loss(
        logits_per_image,
        logits_per_text,
        layout.labels_per_image,
        layout.labels_per_text,
        layout.index_pos,
        loss_type=loss_type,
    )
    np.testing.assert_allclose(
        float(ours["loss_i"]), float(ref_out["loss_i"]), atol=1e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(ours["loss_t"]), float(ref_out["loss_t"]), atol=1e-6, rtol=1e-5
    )


def test_kl_loss_sane():
    """KL mode (fixed vs the reference's broken branch): zero when predicted
    distribution equals the (uniform-over-positives) target."""
    B, P, G = 2, 2, 2
    D = P + G
    layout = build_label_layout(B, P, G, "kl", overbatch=True)
    # logits giving softmax == target: +big at positives, -big elsewhere
    big = 20.0
    logits_i = np.where(layout.labels_per_image > 0, big, -big).astype(np.float32)
    logits_t = np.zeros((B * D, B), np.float32)
    out = contrastive_loss(
        logits_i, logits_t, layout.labels_per_image, layout.labels_per_text,
        layout.index_pos, loss_type="kl",
    )
    assert float(out["loss_i"]) < 1e-5
