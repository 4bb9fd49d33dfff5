"""Dataset + zero-shot eval driver tests on synthetic fixtures with a tiny
real-vocab CLIP (context 77, vocab 49408, 32² images)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from clip_event_tpu.data.common import DataLoader  # noqa: E402
from clip_event_tpu.data.m2e2 import M2E2Dataset  # noqa: E402
from clip_event_tpu.data.meed import MEEDDataset  # noqa: E402
from clip_event_tpu.data.retrieval import COCODataset, FlickrDataset  # noqa: E402
from clip_event_tpu.data.situation import ImSituDataset  # noqa: E402
from clip_event_tpu.data.sr import GSRDataset  # noqa: E402
from clip_event_tpu.data.text import TextDataset  # noqa: E402
from clip_event_tpu.data.vcr import VCRDataset  # noqa: E402
from clip_event_tpu.data.visualcomet import VisualCOMETDataset  # noqa: E402
from clip_event_tpu.evals.gsr import evaluate_gsr  # noqa: E402
from clip_event_tpu.evals.m2e2 import evaluate_m2e2  # noqa: E402
from clip_event_tpu.evals.retrieval import evaluate_retrieval  # noqa: E402
from clip_event_tpu.evals.vcr import evaluate_vcr  # noqa: E402
from clip_event_tpu.evals.visualcomet import evaluate_visualcomet  # noqa: E402
from clip_event_tpu.models import CLIPConfig, init_params  # noqa: E402
from tests import fixtures  # noqa: E402

TINY_EVAL = CLIPConfig(
    embed_dim=64,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=77,
    vocab_size=49408,
    transformer_width=64,
    transformer_heads=1,
    transformer_layers=2,
)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), TINY_EVAL)


def test_m2e2_eval(tmp_path, params):
    paths = fixtures.make_m2e2_fixture(str(tmp_path))
    ds = M2E2Dataset(paths["anno_json"], paths["image_dir"], paths["ontology_json"],
                     image_size=32)
    assert len(ds) == 8
    assert ds.candidate_tokens.shape[0] == 3
    m = evaluate_m2e2(params, TINY_EVAL, ds, batch_size=4)
    assert 0.0 <= m["accuracy"] <= 1.0
    assert m["num_images"] == 8
    assert "macro_f1" in m


@pytest.mark.parametrize("prompt", ["def", "abstract", "name", "short"])
def test_gsr_prompts(tmp_path, prompt):
    paths = fixtures.make_swig_fixture(str(tmp_path))
    ds = GSRDataset(paths["anno_json"], paths["image_dir"], paths["ontology_json"],
                    prompt=prompt, image_size=32)
    tensors, meta = ds[0]
    assert tensors["image"].shape == (32, 32, 3)
    assert tensors["role_text"].shape == (6, 77)
    assert tensors["role_mask"][:2].sum() == 2
    assert tensors["role_bbox"][1][0] == -1.0  # place has no box


def test_gsr_eval(tmp_path, params):
    paths = fixtures.make_swig_fixture(str(tmp_path))
    ds = GSRDataset(paths["anno_json"], paths["image_dir"], paths["ontology_json"],
                    prompt="name", image_size=32)
    m = evaluate_gsr(params, TINY_EVAL, ds, batch_size=3)
    assert 0.0 <= m["verb_top1"] <= m["verb_top5"] <= 1.0
    assert m["grounded_args"] == 6  # one grounded role per image
    assert 0.0 <= m["grounding_acc"] <= 1.0
    # imSitu/SWiG noun metrics: 2 annotated noun roles per image x 6 images
    assert m["value_roles"] == 12 and m["value_frames"] == 6
    assert 0.0 <= m["value"] <= 1.0
    assert m["grounded_value"] <= m["value"]  # grounding only subtracts
    assert m["value_all"] <= m["value"]
    assert m["grounded_value_all"] <= min(m["value_all"], m["grounded_value"])
    m2 = evaluate_gsr(params, TINY_EVAL, ds, batch_size=3, value_metrics=False)
    assert "value" not in m2


def test_vcr_eval(tmp_path, params):
    paths = fixtures.make_vcr_fixture(str(tmp_path))
    for rationale in (False, True):
        ds = VCRDataset(paths["qa_jsonl"], paths["image_dir"], rationale=rationale,
                        image_size=32)
        assert len(ds) == 5
        tensors, _ = ds[0]
        assert tensors["text"].shape == (4, 77)
        m = evaluate_vcr(params, TINY_EVAL, ds, batch_size=4)
        assert m["num_questions"] == 5
    # object-name substitution
    assert "person" in ds.data[0]["question"]


def test_retrieval_evals(tmp_path, params):
    paths = fixtures.make_retrieval_fixture(str(tmp_path))
    coco = COCODataset(paths["coco_json"], paths["coco_dir"], image_size=32)
    assert len(coco) == 4
    m = evaluate_retrieval(params, TINY_EVAL, coco, batch_size=4)
    assert set(m) >= {"t2i_R@1", "i2t_R@1", "num_images"}

    flickr = FlickrDataset(paths["flickr_split"], paths["flickr_csv"],
                           paths["flickr_dir"], image_size=32)
    assert len(flickr) == 4
    tensors, _ = flickr[0]
    assert tensors["text"].shape == (5, 77)


def test_visualcomet_eval(tmp_path, params):
    paths = fixtures.make_visualcomet_fixture(str(tmp_path))
    ds = VisualCOMETDataset(paths["anno_json"], paths["image_dir"], field="intent",
                            image_size=32)
    assert len(ds) == 5
    assert len(ds.candidates) == 10  # 2 intents per image
    m = evaluate_visualcomet(params, TINY_EVAL, ds, batch_size=4)
    assert m["num_candidates"] == 10
    assert 0.0 <= m["R@1"] <= m["R@5"] <= 1.0


def test_meed_dataset(tmp_path):
    paths = fixtures.make_meed_fixture(str(tmp_path))
    for prompt, expected in [("verbprefix", 4), ("text", 12), ("event", 4)]:
        ds = MEEDDataset(paths["anno_json"], paths["image_dir"], prompt=prompt,
                         image_size=32)
        assert len(ds) == expected
    tensors, meta = ds[0]
    assert tensors["text"].shape == (77,)


def test_imsitu_dataset(tmp_path):
    paths = fixtures.make_swig_fixture(str(tmp_path))
    ds = ImSituDataset(
        image_dir=paths["image_dir"],
        imsitu_ontology_file=paths["ontology_json"],
        imsitu_annotation_file=paths["anno_json"],
        verb_mapping_file=paths["mapping_tsv"],
        max_args=4,
        image_size=32,
    )
    assert len(ds) == 6
    tensors, meta = ds[0]
    assert tensors["roles"].shape == (4,)
    assert int(tensors["arg_num"]) >= 1
    assert tensors["image"].shape == (32, 32, 3)
    # verb-role mask licenses the annotated roles
    v = int(tensors["verb"])
    assert ds.role_mask[v].sum() >= 2
    # event mapping: marching → B-Conflict.Demonstrate
    marching_idx = ds.vocab_verb.get("marching")
    events = [int(ds[i][0]["event"]) for i in range(len(ds))
              if int(ds[i][0]["verb"]) == marching_idx]
    assert all(e == ds.event2id["B-Conflict.Demonstrate"] for e in events)


def test_text_dataset():
    ds = TextDataset(["a cat", "a dog"])
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    tensors, meta = next(iter(loader))
    assert tensors["text"].shape == (2, 77)


def test_matching_eval(tmp_path, params):
    from clip_event_tpu.data.voa import VOACaptionDataset
    from clip_event_tpu.evals.matching import evaluate_matching

    voa = fixtures.make_voa_fixture(str(tmp_path))
    ds = VOACaptionDataset([voa["mapping_json"]], [voa["image_dir"]], image_size=32)
    m = evaluate_matching(params, TINY_EVAL, ds, batch_size=4)
    assert m["num_pairs"] == 6
    assert 0.0 <= m["i2t_top1"] <= m["i2t_top5"] <= 1.0
    assert 0.0 <= m["t2i_top1"] <= 1.0


def test_gsr_object_channel(tmp_path):
    import pickle

    paths = fixtures.make_swig_fixture(str(tmp_path))
    det = {
        f"swig_{i:03d}.jpg": [
            {"label": "/m/01g317", "bbox": [5, 5, 60, 90],
             "bbox_normalized": [0.04, 0.05, 0.47, 0.94], "score": 0.9},
            {"label": "/m/unknown", "bbox": [0, 0, 5, 5],
             "bbox_normalized": [0, 0, 0.04, 0.05], "score": 0.99},
        ]
        for i in range(6)
    }
    det_path = tmp_path / "det.pkl"
    pickle.dump(det, open(det_path, "wb"))
    class_map = tmp_path / "classes.csv"
    class_map.write_text("/m/01g317,Person,1\n/m/unknown,Thing,0\n")

    ds = GSRDataset(
        paths["anno_json"], paths["image_dir"], paths["ontology_json"],
        prompt="short", load_object=True, object_detection=str(det_path),
        object_class_map=str(class_map), image_size=32,
    )
    _, meta = ds[0]
    assert meta["object_labels"] == ["Person"]  # unknown label filtered
    assert len(meta["object_bboxes"]) == 1


def test_imsitu_object_channel(tmp_path):
    import pickle

    paths = fixtures.make_swig_fixture(str(tmp_path))
    det = {
        f"swig_{i:03d}.jpg": [
            {"label": "/m/01g317", "bbox": [5, 5, 60, 90], "score": 0.9},
        ]
        for i in range(6)
    }
    det_path = tmp_path / "det.pkl"
    pickle.dump(det, open(det_path, "wb"))
    class_map = tmp_path / "classes.csv"
    class_map.write_text("/m/01g317,person,1\n")

    ds = ImSituDataset(
        image_dir=paths["image_dir"],
        imsitu_ontology_file=paths["ontology_json"],
        imsitu_annotation_file=paths["anno_json"],
        verb_mapping_file=paths["mapping_tsv"],
        max_args=4,
        load_object=True,
        object_ontology_file=str(class_map),
        object_detection_pkl_file=str(det_path),
        max_objects=3,
        image_size=32,
    )
    tensors, meta = ds[0]
    assert tensors["object_image"].shape == (3, 32, 32, 3)
    np.testing.assert_array_equal(tensors["object_mask"], [1, 1, 0])
    # slot 0 is the whole image, slot 1 the person crop mapped to noun vocab
    assert int(tensors["object_label"][1]) == ds.vocab_noun.get("person")


def test_gsr_eval_object_grounding(tmp_path, params):
    import pickle

    paths = fixtures.make_swig_fixture(str(tmp_path))
    det = {
        f"swig_{i:03d}.jpg": [
            {"label": "/m/01g317", "bbox": [5, 5, 60, 90],
             "bbox_normalized": [0.04, 0.05, 0.47, 0.94], "score": 0.9},
            {"label": "/m/01g317", "bbox": [64, 5, 125, 90],
             "bbox_normalized": [0.5, 0.05, 0.98, 0.94], "score": 0.8},
        ]
        for i in range(6)
    }
    det_path = tmp_path / "det.pkl"
    pickle.dump(det, open(det_path, "wb"))
    class_map = tmp_path / "classes.csv"
    class_map.write_text("/m/01g317,Person,1\n")
    ds = GSRDataset(
        paths["anno_json"], paths["image_dir"], paths["ontology_json"],
        prompt="name", load_object=True, object_detection=str(det_path),
        object_class_map=str(class_map), image_size=32,
    )
    m = evaluate_gsr(params, TINY_EVAL, ds, batch_size=3, ground_via="objects")
    assert m["ground_via"] == "objects"
    assert m["grounded_args"] == 6
    assert 0.0 <= m["grounding_acc"] <= 1.0


TINY_MODEL_DICT = {
    "embed_dim": 64, "image_resolution": 32, "vision_layers": 2,
    "vision_width": 64, "vision_patch_size": 16, "context_length": 77,
    "vocab_size": 49408, "transformer_width": 64, "transformer_heads": 1,
    "transformer_layers": 2,
}

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_eval_cli(script, cfg, tmp_path):
    import json as _json
    import subprocess
    import sys

    cfg = dict(cfg, model=TINY_MODEL_DICT, batch_size=4,
               output_json=str(tmp_path / "out.json"))
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(_json.dumps(cfg))
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, script), "--cfg", str(cfg_path)],
        capture_output=True, text=True, timeout=600,
        cwd=_REPO, env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert proc.returncode == 0, f"{script}: {proc.stderr[-3000:]}"
    return _json.load(open(cfg["output_json"]))


@pytest.mark.slow
def test_every_eval_cli_end_to_end(tmp_path):
    """Each documented eval entry point runs as a real subprocess with its
    documented config keys (the drivers' dataset wiring is otherwise only
    exercised for m2e2/matching)."""
    from tests.fixtures import (
        make_retrieval_fixture,
        make_swig_fixture,
        make_vcr_fixture,
        make_visualcomet_fixture,
    )

    swig = make_swig_fixture(str(tmp_path / "swig"))
    m = _run_eval_cli("eval_gsr.py", {
        "anno_json": swig["anno_json"], "image_dir": swig["image_dir"],
        "ontology_json": swig["ontology_json"],
    }, tmp_path)
    assert "verb_top1" in m or "grounded_args" in m

    vcr = make_vcr_fixture(str(tmp_path / "vcr"))
    m = _run_eval_cli("eval_vcr.py", {
        "qa_jsonl": vcr["qa_jsonl"], "image_dir": vcr["image_dir"],
    }, tmp_path)
    assert m["num_questions"] == 5

    ret = make_retrieval_fixture(str(tmp_path / "ret"))
    m = _run_eval_cli("eval_retrieval.py", {
        "dataset": "coco", "caption_file": ret["coco_json"],
        "image_dir": ret["coco_dir"],
    }, tmp_path)
    assert m["num_images"] == 4
    m = _run_eval_cli("eval_retrieval.py", {
        "dataset": "flickr", "split_list": ret["flickr_split"],
        "caption_file": ret["flickr_csv"], "image_dir": ret["flickr_dir"],
    }, tmp_path)
    assert m["num_images"] == 4

    vc = make_visualcomet_fixture(str(tmp_path / "vc"))
    m = _run_eval_cli("eval_visualcomet.py", {
        "anno_json": vc["anno_json"], "image_dir": vc["image_dir"],
    }, tmp_path)
    assert m["num_images"] == 5


def test_merge_across_ranks_weave(monkeypatch):
    """The cross-rank weave must invert the loader's strided sharding exactly,
    including the wrap-around padding rows (data.common.DataLoader._indices)."""
    from clip_event_tpu.evals.common import merge_across_ranks
    from clip_event_tpu.parallel import collectives

    n, ws = 7, 2
    order = np.arange(n)
    padded = np.resize(order, -(-n // ws) * ws)
    slices = [padded[r::ws] for r in range(ws)]  # what each rank's loader yields

    arr = np.arange(n) * 10.0
    metas = [f"id{i}" for i in range(n)]
    per_rank = [
        (arr[s], [metas[i] for i in s]) for s in slices
    ]
    monkeypatch.setattr(collectives, "all_gather_objects",
                        lambda obj: [per_rank[0], per_rank[1]])
    got_arr, got_metas = merge_across_ranks(
        n, ws, per_rank[0][0], per_rank[0][1]
    )
    np.testing.assert_array_equal(got_arr, arr)
    assert got_metas == metas


def test_sharded_eval_matches_single_process(tmp_path, monkeypatch):
    """evaluate_m2e2 with simulated rank halves (gather monkeypatched) must
    reproduce the single-process metrics on an odd-sized dataset."""
    from clip_event_tpu.evals.common import merge_across_ranks  # noqa: F401
    from clip_event_tpu.parallel import collectives

    paths = fixtures.make_m2e2_fixture(str(tmp_path), num_images=7)
    ds = M2E2Dataset(paths["anno_json"], paths["image_dir"],
                     paths["ontology_json"], image_size=32)
    params = init_params(jax.random.PRNGKey(0), TINY_EVAL)
    single = evaluate_m2e2(params, TINY_EVAL, ds, batch_size=4,
                           rank=0, world_size=1)

    # run each rank's half for real, capture what it would contribute
    contributions = {}
    real_gather = collectives.all_gather_objects

    def fake_gather(obj):
        contributions[fake_gather.rank] = obj
        if len(contributions) < 2:
            raise _NeedOtherRank()
        return [contributions[0], contributions[1]]

    class _NeedOtherRank(Exception):
        pass

    for r in (1, 0):  # rank 1 first so rank 0's gather sees both
        fake_gather.rank = r
        monkeypatch.setattr(collectives, "all_gather_objects", fake_gather)
        try:
            sharded = evaluate_m2e2(params, TINY_EVAL, ds, batch_size=4,
                                    rank=r, world_size=2)
        except _NeedOtherRank:
            assert r == 1
    monkeypatch.setattr(collectives, "all_gather_objects", real_gather)
    assert sharded == single


@pytest.mark.slow
def test_eval_cli_tp(tmp_path):
    """`"tp": 2` in an eval config shards the model over a (dp × tp) mesh
    (inference tensor parallelism for models too wide for one chip) and
    produces the same metrics as the single-device run."""
    from tests.fixtures import make_retrieval_fixture

    ret = make_retrieval_fixture(str(tmp_path / "ret"))
    base = {
        "dataset": "coco", "caption_file": ret["coco_json"],
        "image_dir": ret["coco_dir"], "seed": 0,
    }
    m_ref = _run_eval_cli("eval_retrieval.py", dict(base), tmp_path)
    m_tp = _run_eval_cli("eval_retrieval.py", dict(base, tp=2), tmp_path)
    assert m_tp["num_images"] == m_ref["num_images"] == 4
    for k, v in m_ref.items():
        if isinstance(v, float):
            assert abs(v - m_tp[k]) < 1e-4, (k, v, m_tp[k])


def test_encoders_auto_dp_mesh_matches_single_device(params):
    """On a multi-chip host (the virtual 8-device mesh here) `Encoders`
    auto-shards its padded batches over a local dp mesh — features must be
    IDENTICAL to the forced single-device path, partial last batch
    included, and the mesh must actually engage when batch_size divides
    the device count (and not when it doesn't)."""
    from clip_event_tpu.evals.common import Encoders

    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(11, 32, 32, 3)).astype(np.float32)  # 11: pad path
    toks = np.zeros((5, 77), np.int32)
    toks[:, 0] = 49406
    toks[:, 1:4] = rng.integers(1, 49000, (5, 3))
    toks[:, 4] = 49407

    enc_dp = Encoders(params, TINY_EVAL, batch_size=8)
    assert enc_dp._batch_sharding is not None  # 8 % 8 == 0 → mesh engaged
    enc_1 = Encoders(params, TINY_EVAL, batch_size=8, mesh=None)
    assert enc_1._batch_sharding is None

    np.testing.assert_array_equal(enc_dp.images(imgs), enc_1.images(imgs))
    np.testing.assert_array_equal(enc_dp.texts(toks), enc_1.texts(toks))

    # non-dividing batch size: silently stays single-device
    assert Encoders(params, TINY_EVAL, batch_size=6)._batch_sharding is None
