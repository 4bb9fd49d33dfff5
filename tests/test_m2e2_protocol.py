"""The M2E2 per-mention event/argument extraction P/R/F1 protocol
(Li et al., ACL 2020 — the CVPR'22 CLIP-Event zero-shot numbers use this
protocol), pinned on constructed examples with hand-computed values, plus
evaluate_m2e2 end-to-end over negatives / multi-mention gold / argument
grounding."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from clip_event_tpu.data.m2e2 import M2E2Dataset  # noqa: E402
from clip_event_tpu.evals.m2e2 import (  # noqa: E402
    argument_counts,
    argument_prf,
    evaluate_m2e2,
    event_mention_counts,
    event_mention_prf,
    prf,
)
from clip_event_tpu.models import CLIPConfig, init_params  # noqa: E402

TINY = CLIPConfig(
    embed_dim=64, image_resolution=32, vision_layers=2, vision_width=64,
    vision_patch_size=16, context_length=77, vocab_size=49408,
    transformer_width=64, transformer_heads=2, transformer_layers=2,
)


def test_event_mention_prf_hand_computed():
    """correct=3 / pred=6 / gold=6 → P=R=F1=0.5 (worked by hand):
      img1 gold [A,B]  pred [A]      → c1 p1 g2
      img2 gold [A]    pred [B]      → c0 p1 g1
      img3 gold []     pred [A]      → c0 p1 g0   (event-free image)
      img4 gold [B]    pred []       → c0 p0 g1   (missed mention)
      img5 gold [A,A]  pred [A,A,A]  → c2 p3 g2   (one-to-one matching)
    """
    gold = {"img1": ["A", "B"], "img2": ["A"], "img3": [],
            "img4": ["B"], "img5": ["A", "A"]}
    pred = {"img1": ["A"], "img2": ["B"], "img3": ["A"],
            "img5": ["A", "A", "A"]}
    m = event_mention_prf(pred, gold)
    assert m == {"precision": 0.5, "recall": 0.5, "f1": 0.5}
    # per-image counts
    assert event_mention_counts(["A", "A", "A"], ["A", "A"]) == (2, 3, 2)
    assert event_mention_counts([], ["B"]) == (0, 0, 1)
    assert event_mention_counts(["A"], []) == (0, 1, 0)


def test_event_prf_empty_sides():
    assert event_mention_prf({}, {}) == {"precision": 0.0, "recall": 0.0,
                                         "f1": 0.0}
    assert prf(0, 0, 5) == {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    assert prf(5, 5, 5) == {"precision": 1.0, "recall": 1.0, "f1": 1.0}


def test_argument_prf_hand_computed():
    """img1: 3 predictions against 2 gold args:
      (A, Attacker, exact box)      → correct (IoU 1.0)
      (A, Place, disjoint box)      → wrong   (IoU 0.0 < 0.5)
      (B, Attacker, exact box)      → wrong   (event type mismatch)
    correct=1, pred=3, gold=2 → P=1/3, R=1/2, F1=0.4."""
    gold = {"img1": [("A", "Attacker", [0, 0, 1, 1]),
                     ("A", "Place", [0, 0, 0.5, 0.5])]}
    pred = {"img1": [("A", "Attacker", [0, 0, 1, 1]),
                     ("A", "Place", [0.5, 0.5, 1, 1]),
                     ("B", "Attacker", [0, 0, 1, 1])]}
    m = argument_prf(pred, gold)
    np.testing.assert_allclose(
        [m["precision"], m["recall"], m["f1"]], [1 / 3, 1 / 2, 0.4]
    )


def test_argument_matching_is_one_to_one():
    gold = [("A", "Attacker", [0, 0, 1, 1])]
    pred = [("A", "Attacker", [0, 0, 1, 1]),
            ("A", "Attacker", [0, 0, 1, 1])]  # duplicate prediction
    assert argument_counts(pred, gold) == (1, 2, 1)
    # IoU exactly at threshold counts (>= semantics, utils_image.py:65-73)
    gold = [("A", "Place", [0, 0, 1, 1])]
    pred = [("A", "Place", [0, 0, 1, 0.5])]  # IoU 0.5
    assert argument_counts(pred, gold, iou_threshold=0.5) == (1, 1, 1)
    assert argument_counts(pred, gold, iou_threshold=0.51) == (0, 1, 1)


def _protocol_fixture(root, num_pos=4, num_neg=3, seed=7):
    """M2E2 anno with multi-mention gold, negatives, and a rich ontology
    (role descriptions) in the documented artifact formats."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    ontology = {
        "Conflict.Attack": {
            "template": "An image of attack event.",
            "roles": {"Attacker": "The attacker in an attack.",
                      "Place": "The place of an attack."},
        },
        "Justice.Arrest": {
            "template": "An image of arrest event.",
            "roles": {"Person": "The arrested person."},
        },
    }
    anno, listed = {}, []
    for i in range(num_pos + num_neg):
        image_id = f"proto_{i:03d}"
        listed.append(image_id)
        arr = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, image_id + ".jpg"))
        if i >= num_pos:
            continue  # negative: in image_list only
        if i == 0:  # multi-mention image
            anno[image_id] = {"events": [
                {"event_type": "Conflict.Attack",
                 "role": {"Attacker": [[0.0, 0.0, 0.6, 0.6]]}},
                {"event_type": "Justice.Arrest", "role": {}},
            ]}
        else:  # legacy single-mention form
            anno[image_id] = {
                "event_type": "Conflict.Attack",
                "role": {"Place": [[0.2, 0.2, 0.9, 0.9]]},
            }
    paths = {
        "anno": os.path.join(root, "anno.json"),
        "ontology": os.path.join(root, "ontology.json"),
        "image_list": os.path.join(root, "images.json"),
        "image_dir": img_dir,
    }
    json.dump(anno, open(paths["anno"], "w"))
    json.dump(ontology, open(paths["ontology"], "w"))
    json.dump(listed, open(paths["image_list"], "w"))
    return paths


def test_dataset_negatives_and_multi_mention(tmp_path):
    paths = _protocol_fixture(str(tmp_path))
    ds = M2E2Dataset(paths["anno"], paths["image_dir"], paths["ontology"],
                     image_list=paths["image_list"], image_size=32)
    assert len(ds) == 7  # 4 positive + 3 listed negatives
    _, meta0 = ds[0]
    assert [m["event_type"] for m in meta0["mentions"]] == [
        "Conflict.Attack", "Justice.Arrest"
    ]
    tensors_neg, meta_neg = ds[len(ds) - 1]
    assert meta_neg["mentions"] == []
    assert int(tensors_neg["event_type_idx"]) == -1
    assert ds.role_descriptions["Conflict.Attack"]["Place"]


def test_evaluate_m2e2_protocol_fields(tmp_path):
    """End-to-end on the constructed corpus: always-predict gives exactly
    one predicted mention per image → n_pred = num_images, n_gold = 5; the
    counters and the P/R/F1 identity are checked against each other."""
    paths = _protocol_fixture(str(tmp_path))
    ds = M2E2Dataset(paths["anno"], paths["image_dir"], paths["ontology"],
                     image_list=paths["image_list"], image_size=32)
    params = init_params(jax.random.PRNGKey(0), TINY)
    m = evaluate_m2e2(params, TINY, ds, batch_size=4)
    assert m["event_mentions_gold"] == 5  # 2 (multi) + 3 singles
    assert m["event_mentions_pred"] == 7  # argmax predicts on every image
    c = m["event_precision"] * m["event_mentions_pred"]
    np.testing.assert_allclose(
        m["event_recall"], c / m["event_mentions_gold"], atol=1e-9
    )
    assert 0.0 <= m["event_f1"] <= 1.0
    assert "accuracy" in m and "macro_f1" in m  # secondary fields survive

    # an impossible null threshold suppresses every prediction
    m0 = evaluate_m2e2(params, TINY, ds, batch_size=4, null_threshold=1.01)
    assert m0["event_mentions_pred"] == 0
    assert m0["event_precision"] == 0.0 and m0["event_recall"] == 0.0


def test_evaluate_m2e2_ground_arguments(tmp_path):
    paths = _protocol_fixture(str(tmp_path))
    ds = M2E2Dataset(paths["anno"], paths["image_dir"], paths["ontology"],
                     image_list=paths["image_list"], image_size=32)
    params = init_params(jax.random.PRNGKey(0), TINY)
    m = evaluate_m2e2(params, TINY, ds, batch_size=4, ground_arguments=True)
    assert m["argument_mentions_gold"] == 4  # one box per positive image
    for k in ("argument_precision", "argument_recall", "argument_f1"):
        assert 0.0 <= m[k] <= 1.0


def test_sweep_null_threshold_known_optimum():
    """Hand-computed sweep: the two highest-prob predictions are the two
    correct ones → thresholding at the 2nd prob gives P=R=F1=1."""
    from clip_event_tpu.evals.m2e2 import sweep_null_threshold

    probs = np.array([0.9, 0.8, 0.7, 0.6, 0.5])
    correct = np.array([True, True, False, False, False])
    thr, f1 = sweep_null_threshold(probs, correct, n_gold=2)
    assert thr == pytest.approx(0.8)
    assert f1 == pytest.approx(1.0)

    # tied probs cannot be split: cutting "between" the two 0.8s would give
    # an unrealizable F1=1; the sweep must take both (P=2/3, R=1, F1=0.8)
    probs = np.array([0.9, 0.8, 0.8, 0.5])
    correct = np.array([True, True, False, False])
    thr, f1 = sweep_null_threshold(probs, correct, n_gold=2)
    assert thr == pytest.approx(0.8)
    assert f1 == pytest.approx(0.8)

    # when predicting everything is optimal the sweep says "no threshold"
    thr, f1 = sweep_null_threshold(
        np.array([0.9, 0.1]), np.array([True, True]), n_gold=2
    )
    assert thr is None and f1 == pytest.approx(1.0)

    assert sweep_null_threshold(np.array([]), np.array([]), 0) == (None, 0.0)


def test_evaluate_m2e2_per_type_breakdown(tmp_path):
    """per_type P/R/F1 decomposes the corpus totals: gold counts sum to
    event_mentions_gold, predictions sum to event_mentions_pred."""
    paths = _protocol_fixture(str(tmp_path))
    ds = M2E2Dataset(paths["anno"], paths["image_dir"], paths["ontology"],
                     image_list=paths["image_list"], image_size=32)
    params = init_params(jax.random.PRNGKey(0), TINY)
    m = evaluate_m2e2(params, TINY, ds, batch_size=4)
    per_type = m["per_type"]
    assert set(per_type) <= set(ds.event_types)
    assert sum(v["gold"] for v in per_type.values()) == m["event_mentions_gold"]
    n_pred_by_type = sum(
        v["precision"] and 1 for v in per_type.values()
    )  # sanity: fields exist
    for v in per_type.values():
        assert {"precision", "recall", "f1", "gold"} <= set(v)
        assert 0.0 <= v["f1"] <= 1.0
    assert n_pred_by_type >= 0


def test_evaluate_m2e2_select_null_threshold(tmp_path):
    """The dev-half sweep emits the selected threshold + dev F1 and reports
    the primary metrics on the held-out half only."""
    paths = _protocol_fixture(str(tmp_path))
    ds = M2E2Dataset(paths["anno"], paths["image_dir"], paths["ontology"],
                     image_list=paths["image_list"], image_size=32)
    params = init_params(jax.random.PRNGKey(0), TINY)
    m = evaluate_m2e2(params, TINY, ds, batch_size=4,
                      select_null_threshold=True)
    assert "null_threshold_selected" in m and "dev_event_f1" in m
    assert m["dev_images"] + m["eval_images"] == m["num_images"]
    assert 0.0 <= m["dev_event_f1"] <= 1.0
    thr = m["null_threshold_selected"]
    assert thr is None or 0.0 < thr <= 1.0
    # held-out metrics at the selected threshold reproduce exactly
    m2 = evaluate_m2e2(params, TINY, ds, batch_size=4, null_threshold=thr)
    # (m2 evaluates ALL images; consistency check is on the identity P/R/F)
    c = m["event_precision"] * m["event_mentions_pred"]
    if m["event_mentions_gold"]:
        np.testing.assert_allclose(
            m["event_recall"], c / m["event_mentions_gold"], atol=1e-9
        )
    assert m2["eval_images"] == m2["num_images"]

    with pytest.raises(ValueError, match="incompatible"):
        evaluate_m2e2(params, TINY, ds, batch_size=4,
                      select_null_threshold=True, ground_arguments=True)
