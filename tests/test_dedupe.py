"""Dedupe-encode tests: the (unique, inverse) layout must be an EXACT
re-expression of the full text batch — same features, same loss, same
parameter gradients — for the contrastive step and the multiattention
role/label channels, through the dataset, the loader buckets, and the
dp-sharded step."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from clip_event_tpu.data.dedupe import DedupeOverflow, dedupe_rows, identity_layout  # noqa: E402
from clip_event_tpu.data.labels import build_label_layout  # noqa: E402
from clip_event_tpu.engine.train_step import (  # noqa: E402
    create_train_state,
    loss_fn,
    make_train_step,
)
from clip_event_tpu.models import init_params  # noqa: E402
from clip_event_tpu.parallel import make_mesh, replicate, shard_batch  # noqa: E402
from tests.test_model_parity import TINY_VIT  # noqa: E402

B, P, G = 8, 1, 2
D = P + G


# ---------------------------------------------------------------- host helper


def _rows(n, s=16, vocab=100, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(1, vocab, size=(n, s)).astype(np.int32)


def test_dedupe_rows_roundtrip():
    base = _rows(5)
    rows = base[np.array([0, 1, 0, 2, 2, 3, 4, 0])]
    unique, inverse = dedupe_rows(rows, cap=8)
    assert unique.shape == (8, 16) and inverse.shape == (8,)
    assert inverse.dtype == np.int32
    np.testing.assert_array_equal(unique[inverse], rows)
    # pad slots are zero (5 uniques → 3 pad rows)
    assert not unique[5:].any()


def test_dedupe_rows_rank_blocks():
    """World=2: each rank's uniques land in its cap//world block and the
    inverse indexes the GLOBAL array (rank-block concatenation)."""
    base = _rows(4)
    r0 = base[np.array([0, 1, 0, 1])]
    r1 = base[np.array([2, 3, 3, 2])]
    u0, i0 = dedupe_rows(r0, cap=8, rank=0, world=2)
    u1, i1 = dedupe_rows(r1, cap=8, rank=1, world=2)
    global_unique = np.concatenate([u0, u1])
    np.testing.assert_array_equal(global_unique[i0], r0)
    np.testing.assert_array_equal(global_unique[i1], r1)
    assert i0.max() < 4 <= i1.min()


def test_dedupe_overflow():
    rows = _rows(8)  # 8 distinct rows
    assert dedupe_rows(rows, cap=4) is None  # graceful → caller falls back
    with pytest.raises(DedupeOverflow):
        dedupe_rows(rows, cap=4, strict=True)
    u, i = identity_layout(rows)
    np.testing.assert_array_equal(u[i], rows)


def test_dedupe_cap_world_divisibility():
    with pytest.raises(ValueError, match="divide"):
        dedupe_rows(_rows(4), cap=7, world=2)


# ----------------------------------------------------------- step exactness


def _dup_text(cfg, seed=1, n_unique=6):
    """[B·D, S] token batch drawn from n_unique distinct rows."""
    rng = np.random.default_rng(seed)
    base = rng.integers(1, cfg.vocab_size - 2, size=(n_unique, cfg.context_length))
    base = base.astype(np.int32)
    base[:, -1] = cfg.vocab_size - 1  # EOT
    idx = rng.integers(0, n_unique, size=B * D)
    return base[idx]


def _batch(cfg, seed=1):
    rng = np.random.default_rng(seed)
    layout = build_label_layout(B, P, G, "ce", True)
    return {
        "image": rng.normal(
            size=(B, cfg.image_resolution, cfg.image_resolution, 3)
        ).astype(np.float32),
        "text": _dup_text(cfg, seed),
        "labels_per_image": layout.labels_per_image,
        "labels_per_text": layout.labels_per_text,
        "index_pos": layout.index_pos,
    }


def _with_dedupe(batch, cap=8):
    out = dict(batch)
    unique, inverse = dedupe_rows(batch["text"], cap)
    out["text_unique"], out["text_inverse"] = unique, inverse
    del out["text"]
    return out


def _grads(params, batch, cfg, **kw):
    args = dict(
        loss_type="ce", overbatch=True, alignment=False, use_pallas_ot=False,
        compute_dtype=jnp.float32, remat=False, multiattention=None,
    )
    args.update(kw)
    (total, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, cfg,
        args["loss_type"], args["overbatch"], args["alignment"],
        args["use_pallas_ot"], args["compute_dtype"], args["remat"],
        args["multiattention"],
    )
    return float(total), loss_dict, grads


def test_deduped_step_exact_loss_and_grads():
    """Loss bitwise, gradients to float-reduction-order tolerance: the gather
    VJP scatter-adds duplicate cotangents — the same sum the undeduped
    backward accumulates inside its matmuls."""
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    loss_a, _, grads_a = _grads(params, batch, cfg)
    loss_b, _, grads_b = _grads(params, _with_dedupe(batch), cfg)
    assert loss_a == loss_b  # identical feature values → identical logits/loss
    for (path, ga), (_, gb) in zip(
        jax.tree_util.tree_leaves_with_path(grads_a),
        jax.tree_util.tree_leaves_with_path(grads_b),
    ):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=1e-3, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_deduped_multiattention_exact():
    """The role-description + role-type-label channels (the biggest dedupe
    win: a tiny label vocabulary repeated B·R times)."""
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    R = 4
    batch = _batch(cfg, seed=3)
    batch["bbox"] = np.sort(
        rng.random((B, R, 2, 2)).astype(np.float32), axis=2
    ).reshape(B, R, 4)
    batch["bbox_mask"] = (rng.random((B, R)) < 0.7).astype(np.int32)
    vocab = _dup_text(cfg, seed=4, n_unique=3)[:3]  # 3 distinct label rows
    batch["bbox_desc_text"] = vocab[rng.integers(0, 3, size=(B, R))]
    batch["bbox_label_text"] = vocab[rng.integers(0, 3, size=(B, R))]

    loss_a, dict_a, grads_a = _grads(params, batch, cfg, multiattention="desc_type")

    ded = dict(batch)
    for field, prefix in (
        ("bbox_desc_text", "bbox_desc"), ("bbox_label_text", "bbox_label")
    ):
        rows = ded.pop(field).reshape(B * R, -1)
        u, i = dedupe_rows(rows, cap=4)
        ded[f"{prefix}_unique"], ded[f"{prefix}_inverse"] = u, i
    loss_b, dict_b, grads_b = _grads(params, ded, cfg, multiattention="desc_type")

    assert loss_a == loss_b
    for k in dict_a:
        assert float(dict_a[k]) == float(dict_b[k]), k
    for (path, ga), (_, gb) in zip(
        jax.tree_util.tree_leaves_with_path(grads_a),
        jax.tree_util.tree_leaves_with_path(grads_b),
    ):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=1e-3, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_deduped_dp_sharded_step_runs_and_matches():
    """On the 8-device mesh (unique cap divisible by 8 → sharded uniques),
    the deduped sharded step must produce the single-device loss."""
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule

    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = build_optimizer("adam", build_schedule("none", 1e-3, 10))
    batch = _with_dedupe(_batch(cfg), cap=8)

    step = make_train_step(cfg, opt, donate=False)
    state = create_train_state(params, opt)
    _, metrics_single = step(state, batch)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = shard_batch(batch, mesh)
    assert "dp" in str(sharded["text_unique"].sharding)  # uniques shard too
    state_m = create_train_state(replicate(params, mesh), opt)
    _, metrics_mesh = step(state_m, sharded)
    np.testing.assert_allclose(
        float(metrics_mesh["loss"]), float(metrics_single["loss"]),
        rtol=2e-5,
    )


# ------------------------------------------------------------- dataset layer


def test_dataset_emits_deduped_batches(tmp_path):
    from tests.fixtures import make_voa_fixture
    from clip_event_tpu.data.common import DataLoader
    from clip_event_tpu.data.voa import VOADescriptionDataset

    voa = make_voa_fixture(str(tmp_path))
    # make the corpus maximally duplicated: every image shares one
    # description triple (the template-corpus regime dedupe targets)
    with open(voa["descriptions_json"]) as fh:
        desc = json.load(fh)
    shared = next(iter(desc.values()))
    desc = {k: shared for k in desc}
    with open(voa["descriptions_json"], "w") as fh:
        json.dump(desc, fh)

    ds = VOADescriptionDataset(
        posneg_descriptions_json=voa["descriptions_json"],
        image_caption_jsons=[voa["mapping_json"]],
        image_dirs=[voa["image_dir"]],
        load_sr=True,
        object_pickles=[voa["object_pickle"]],
        object_ontology_file=voa["ontology_csv"],
        max_bboxes=3,
        dedupe_texts=4,
        dedupe_sr_texts=4,
    )
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    batch, _ = next(iter(loader))
    assert "text" not in batch
    assert batch["text_unique"].shape == (4, ds.context)
    assert batch["text_inverse"].shape == (4 * ds.num_desc,)
    # 3 shared descriptions → 3 uniques + 1 pad row
    assert not batch["text_unique"][3:].any()
    np.testing.assert_array_equal(
        batch["text_unique"][batch["text_inverse"]],
        np.stack([tokensort for tokensort in _expected_text(ds, loader)]),
    )
    for prefix in ("bbox_desc", "bbox_label"):
        assert f"{prefix}_unique" in batch
        assert batch[f"{prefix}_inverse"].shape == (4 * 3,)


def _expected_text(ds, loader):
    """The undeduped text rows of the loader's first batch, in order."""
    plan_chunk = loader._plan()[0][0]
    rows = []
    for idx in plan_chunk:
        tensors, _ = ds[idx]
        rows.extend(list(tensors["text"]))
    return rows


def test_dataset_dedupe_bucket_slices_unique(tmp_path):
    from tests.fixtures import make_voa_fixture
    from clip_event_tpu.data.voa import VOADescriptionDataset

    voa = make_voa_fixture(str(tmp_path))
    ds = VOADescriptionDataset(
        posneg_descriptions_json=voa["descriptions_json"],
        image_caption_jsons=[voa["mapping_json"]],
        image_dirs=[voa["image_dir"]],
        dedupe_texts=32,
    )
    tensors = {"text": np.stack([ds[i][0]["text"] for i in range(2)])}
    tensors = ds.finalize_batch(tensors)
    sliced = ds.apply_bucket(dict(tensors), 32)
    assert sliced["text_unique"].shape[-1] == 32
    np.testing.assert_array_equal(
        sliced["text_unique"], tensors["text_unique"][..., :32]
    )


def test_dataset_dedupe_strict_multihost(tmp_path):
    """Multi-host forces strict mode and cap divisibility."""
    from tests.fixtures import make_voa_fixture
    from clip_event_tpu.data.voa import VOADescriptionDataset

    voa = make_voa_fixture(str(tmp_path))
    with pytest.raises(ValueError, match="divide"):
        VOADescriptionDataset(
            posneg_descriptions_json=voa["descriptions_json"],
            image_caption_jsons=[voa["mapping_json"]],
            image_dirs=[voa["image_dir"]],
            dedupe_texts=7,
            dist_rank=0,
            dist_world=2,
        )
    ds = VOADescriptionDataset(
        posneg_descriptions_json=voa["descriptions_json"],
        image_caption_jsons=[voa["mapping_json"]],
        image_dirs=[voa["image_dir"]],
        dedupe_texts=8,
        dist_rank=1,
        dist_world=2,
    )
    assert ds.dedupe_strict
    # 2 instances × 3 distinct descriptions each = 6 uniques > 8//2 local cap
    tensors = {"text": np.stack([ds[i][0]["text"] for i in range(2)])}
    with pytest.raises(DedupeOverflow):
        ds.finalize_batch(tensors)


def test_config_dedupe_keys():
    from clip_event_tpu.config import ConfigError, validate_config

    base = dict(task="t", constrastive_loss="ce", batch_size=4, lr=1e-6,
                optimizer="adam", max_epoch=1)
    cfg = validate_config(dict(base, dedupe_texts=128))
    assert cfg["dedupe_texts"] == 128 and cfg["dedupe_sr_texts"] == 0
    with pytest.raises(ConfigError):
        validate_config(dict(base, dedupe_texts=-1))
    with pytest.raises(ConfigError):
        validate_config(dict(base, dedupe_texts=True))
    with pytest.raises(ConfigError, match="bbox"):
        validate_config(dict(base, dedupe_sr_texts=64))
    cfg = validate_config(
        dict(base, dedupe_sr_texts=64, multiattention="desc_type", load_sr=True)
    )
    assert cfg["dedupe_sr_texts"] == 64
