"""VOA data layer tests on a synthetic fixture: static shapes, masks,
loader sharding/shuffling, .cs parsing, end-to-end trainability."""

import numpy as np
import pytest

from clip_event_tpu.data.coldstart import load_ie_index
from clip_event_tpu.data.common import DataLoader
from clip_event_tpu.data.voa import VOACaptionDataset, VOADescriptionDataset
from clip_event_tpu.tokenizer import CONTEXT_LENGTH
from tests.fixtures import make_voa_fixture


@pytest.fixture(scope="module")
def voa(tmp_path_factory):
    return make_voa_fixture(str(tmp_path_factory.mktemp("voa")))


def _full_dataset(voa, **kw):
    args = dict(
        posneg_descriptions_json=voa["descriptions_json"],
        image_caption_jsons=[voa["mapping_json"]],
        image_dirs=[voa["image_dir"]],
        load_object=True,
        object_pickles=[voa["object_pickle"]],
        object_ontology_file=voa["ontology_csv"],
        object_detection_threshold=0.2,
        object_topk=5,
        max_objects=4,
        load_ie=True,
        input_entities=[voa["entity_cs"]],
        input_events=[voa["event_cs"]],
        max_entities=3,
        max_events=2,
    )
    args.update(kw)
    return VOADescriptionDataset(**args)


def test_caption_dataset_shapes(voa):
    ds = VOACaptionDataset([voa["mapping_json"]], [voa["image_dir"]])
    assert len(ds) == 6
    tensors, meta = ds[0]
    assert tensors["image"].shape == (224, 224, 3)
    assert tensors["text"].shape == (CONTEXT_LENGTH,)
    assert "FILE - " not in meta["caption"]


def test_description_dataset_static_shapes(voa):
    ds = _full_dataset(voa)
    assert ds.num_pos == 1 and ds.num_neg == 2
    tensors, meta = ds[2]
    assert tensors["image"].shape == (224, 224, 3)
    assert tensors["text"].shape == (3, CONTEXT_LENGTH)
    assert tensors["object_image"].shape == (4, 224, 224, 3)
    # slot 0 = whole image + 2 accepted detections (1 rejected label, 1 low score)
    np.testing.assert_array_equal(tensors["object_mask"], [1, 1, 1, 0])
    assert tensors["entity_text"].shape == (3, CONTEXT_LENGTH)
    np.testing.assert_array_equal(tensors["entity_mask"], [1, 0, 0])
    np.testing.assert_array_equal(tensors["event_mask"], [1, 0])
    assert meta["object_labels"][0] == "UNKNOWN"
    assert meta["object_labels"][1] in ("Person", "Car")
    # whole image == object slot 0
    np.testing.assert_allclose(tensors["object_image"][0], tensors["image"], atol=1e-6)


def test_loader_batches_and_labels(voa):
    ds = _full_dataset(voa)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    tensors, meta = batches[0]
    assert tensors["image"].shape == (2, 224, 224, 3)
    assert tensors["text"].shape == (6, CONTEXT_LENGTH)  # flattened B·D
    np.testing.assert_array_equal(tensors["labels_per_image"], [0, 3])
    np.testing.assert_array_equal(tensors["labels_per_text"], [0, 0, 0, 1, 1, 1])
    np.testing.assert_array_equal(tensors["index_pos"], [0, 3])
    assert len(meta) == 2


def test_loader_rank_sharding(voa):
    ds = _full_dataset(voa)
    seen = []
    for rank in range(2):
        loader = DataLoader(
            ds, batch_size=1, shuffle=True, num_workers=1, rank=rank, world_size=2
        )
        for _, meta in loader:
            seen.append(meta[0]["image_id"])
    assert len(seen) == 6
    assert len(set(seen)) == 6  # disjoint shards cover everything


def test_loader_epoch_reshuffles(voa):
    ds = _full_dataset(voa)
    loader = DataLoader(ds, batch_size=6, shuffle=True, num_workers=1)
    ids0 = [m["image_id"] for m in next(iter(loader))[1]]
    loader.set_epoch(1)
    ids1 = [m["image_id"] for m in next(iter(loader))[1]]
    assert sorted(ids0) == sorted(ids1)
    assert ids0 != ids1


def test_coldstart_parsing(voa):
    ie = load_ie_index([voa["entity_cs"]], [voa["event_cs"]])
    image_id = "VOA_EN_NW_2017_00_0"
    assert list(ie.doc_entities[image_id].keys()) == [":Entity_EDL_0000000"]
    assert ie.entity_type[":Entity_EDL_0000000"] == "Person"
    assert ie.entity_name[":Entity_EDL_0000000"] == "protester 0"
    assert ie.event_type[":Event_0000000"] == "Conflict.Attack"
    assert ie.event_mentions[":Event_0000000"] == {"march"}
    assert ie.event_arguments[":Event_0000000"]["Attacker"] == {":Entity_EDL_0000000"}


def test_end_to_end_train_step_on_fixture(voa):
    jax = pytest.importorskip("jax")
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import create_train_state, make_train_step
    from clip_event_tpu.models import init_params
    from tests.test_model_parity import TINY_VIT

    import dataclasses

    cfg = dataclasses.replace(TINY_VIT, image_resolution=32, vision_patch_size=16)
    ds = _full_dataset(voa, image_size=32)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)

    opt = build_optimizer("adam", build_schedule("none", 1e-4, 2))
    # rename IE fields for the alignment branch contract
    step = make_train_step(cfg, opt, alignment=True, remat=False, donate=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, opt)
    for tensors, _ in loader:
        tensors = dict(tensors)
        # shrink real 77-token/49k-vocab text into the tiny test config
        tensors["text"] = np.minimum(
            tensors["text"][:, : cfg.context_length], cfg.vocab_size - 1
        )
        tensors["entity_text"] = np.minimum(
            tensors["entity_text"][:, :, : cfg.context_length], cfg.vocab_size - 1
        )
        state, metrics = step(state, tensors)
        assert bool(metrics["finite"])
        assert "loss_ot" in metrics
        break


def test_sr_bbox_channel(voa):
    ds = _full_dataset(voa, load_object=False, load_ie=False, load_sr=True, max_bboxes=4)
    tensors, meta = ds[0]
    assert tensors["bbox"].shape == (4, 4)
    assert tensors["bbox_desc_text"].shape[0] == 4
    # two detections pass the label+score filters in the fixture
    np.testing.assert_array_equal(tensors["bbox_mask"], [1, 1, 0, 0])
    # boxes normalized into [0, 1]
    valid = tensors["bbox"][tensors["bbox_mask"] == 1]
    assert (valid >= 0).all() and (valid <= 1).all()
    assert (valid[:, 2:] > valid[:, :2]).all()


def test_uint8_images_device_normalize_exact(tmp_path):
    """`uint8_images=True` ships the pre-normalize uint8 stage; the model's
    on-device normalize reproduces the host float path BITWISE (same IEEE
    fp32 ops), end to end: dataset rows match, encode_image outputs match,
    and the train-step loss matches."""
    import jax
    import numpy as np

    from clip_event_tpu.data.transform import normalize
    from clip_event_tpu.models import clip as clip_model, init_params
    from tests.fixtures import make_voa_fixture
    from tests.test_model_parity import TINY_VIT

    voa = make_voa_fixture(str(tmp_path / "voa"), num_docs=4)
    kw = dict(
        posneg_descriptions_json=voa["descriptions_json"],
        image_caption_jsons=[voa["mapping_json"]],
        image_dirs=[voa["image_dir"]],
        image_size=32,
    )
    ds_f = VOADescriptionDataset(**kw)
    ds_u = VOADescriptionDataset(**kw, uint8_images=True)
    t_f, _ = ds_f[0]
    t_u, _ = ds_u[0]
    assert t_u["image"].dtype == np.uint8
    # vs the live float loader (native C++ fuses the normalize into one
    # multiply-add): equal to 1 ulp
    np.testing.assert_allclose(
        normalize(t_u["image"]), t_f["image"], rtol=1e-4, atol=1e-6
    )

    # vs the canonical transform.normalize (== what cache hits return):
    # the on-device normalize is the same fp32 ops → encoder outputs match
    # BITWISE
    params = init_params(jax.random.PRNGKey(0), TINY_VIT)
    out_f = clip_model.encode_image(
        params, TINY_VIT, normalize(t_u["image"])[None]
    )
    out_u = clip_model.encode_image(params, TINY_VIT, t_u["image"][None])
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_u))
