"""Preprocessing pipeline tests: .cs loading, salient-event ranking,
description generation, and the CLI end-to-end into the training dataset."""

import json
import os
import subprocess
import sys

import pytest

from clip_event_tpu.preprocess.ke import load_cs_files
from clip_event_tpu.preprocess.selection import (
    rank_events,
    select_salient_events,
)
from clip_event_tpu.preprocess.templates import (
    build_negative_type_pool,
    edit_type,
    generate_descriptions,
    rename_args,
    short_template_type,
)

TEMPLATES = {
    "Conflict.Attack": {
        "template": "<arg1> attacked <arg2> using <arg3> at <arg4>",
        "roles": ["Attacker", "Target", "Instrument", "Place"],
    },
    "Justice.Arrest": {
        "template": "<arg1> arrested <arg2> at <arg3>",
        "roles": ["Agent", "Person", "Place"],
    },
    "Movement.Transport": {
        "template": "<arg1> transported <arg2> to <arg3>",
        "roles": ["Agent", "Artifact", "Destination"],
    },
}


def _write_cs(tmp_path):
    """Doc d1: two Attack events (same type, different args) + one Arrest.
    Doc d2: one Transport."""
    ent = tmp_path / "merged.cs"
    evt = tmp_path / "events.cs"
    ent.write_text(
        ":Entity_1\ttype\t#Person\t1.0\n"
        ':Entity_1\tcanonical_mention\t"rebels"\td1:0-5\t0.9\n'
        ':Entity_1\tmention.actual\t"rebels"\td1:0-5\t0.9\n'
        ":Entity_2\ttype\t#Location\t1.0\n"
        ':Entity_2\tcanonical_mention\t"the city"\td1:10-17\t0.8\n'
        ':Entity_2\tmention.actual\t"city"\td1:10-17\t0.8\n'
        ":Entity_3\ttype\t#Person\t1.0\n"
        ':Entity_3\tcanonical_mention\t"troops"\td2:0-5\t0.7\n'
        ':Entity_3\tmention.actual\t"troops"\td2:0-5\t0.7\n'
    )
    evt.write_text(
        ":Event_A1\ttype\t#Conflict.Attack\n"
        ':Event_A1\tcanonical_mention.actual\t"attacked"\td1:20-27\t0.9\n'
        ":Event_A1\t#Conflict.Attack_Attacker.actual\t:Entity_1\td1:0-5\t0.9\n"
        ":Event_A2\ttype\t#Conflict.Attack\n"
        ':Event_A2\tcanonical_mention.actual\t"bombed"\td1:30-35\t0.8\n'
        ":Event_A2\t#Conflict.Attack_Place.actual\t:Entity_2\td1:10-17\t0.8\n"
        ":Event_J1\ttype\t#Justice.Arrest\n"
        ':Event_J1\tcanonical_mention.actual\t"arrested"\td1:40-47\t0.6\n'
        ":Event_T1\ttype\t#Movement.Transport\n"
        ':Event_T1\tcanonical_mention.actual\t"moved"\td2:10-14\t0.9\n'
        ":Event_T1\t#Movement.Transport_Agent.actual\t:Entity_3\td2:0-5\t0.7\n"
    )
    return str(ent), str(evt)


def test_load_cs_rich(tmp_path):
    ent, evt = _write_cs(tmp_path)
    store = load_cs_files([(ent, ""), (evt, "")])
    assert store["doc_ke"]["d1"]["event"] == [":Event_A1", ":Event_A2", ":Event_J1"]
    assert store["evt_info"][":Event_A1"]["type"] == "Conflict.Attack"
    args = store["evt_args"][":Event_A1"]["Conflict.Attack_Attacker"]
    assert args[":Entity_1"][3] == "rebels"  # canonical mention


def test_rank_and_merge():
    ent_evt = None
    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as td:
        ent, evt = _write_cs(pathlib.Path(td))
        store = load_cs_files([(ent, ""), (evt, "")])
        # frequency: Attack appears twice → wins over Arrest
        best, args = rank_events("d1", store, None, None)
        assert store["evt_info"][best]["type"] == "Conflict.Attack"
        salient = select_salient_events(store, merge_args=True)
        # merged args union across both Attack events
        roles = set(salient["d1"]["event_args"].keys())
        assert {"Conflict.Attack_Attacker", "Conflict.Attack_Place"} <= roles
        assert salient["d2"]["event_type"] == "Movement.Transport"


def test_clip_ranking_branch():
    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as td:
        ent, evt = _write_cs(pathlib.Path(td))
        store = load_cs_files([(ent, ""), (evt, "")])
        id2str = ["Justice.Arrest", "Conflict.Attack"]
        # strong CLIP vote for Arrest overrides the frequency prior
        pred = {"pred_idx": 0, "scores": 0.99, "probs": []}
        best, _ = rank_events("d1", store, pred, id2str)
        assert store["evt_info"][best]["type"] == "Justice.Arrest"


def test_short_template_and_edit():
    assert short_template_type("Conflict.Attack") == "An image of attack event. "
    assert short_template_type("Justice.ArrestJail") == "An image of arrest jail event. "
    assert edit_type("Rebels attacked the city", "attacked", "Justice.Arrest") == \
        "Rebels arrest the city"
    assert rename_args("<arg1> hit <arg2>", ["Attacker", "Target"]) == "attacker hit target"


def _salient_fixture():
    return {
        "img1": {
            "event_id": "E1",
            "event_type": "Conflict.Attack",
            "event_trigger": "attacked",
            "event_args": {
                "Conflict.Attack_Attacker": {"e1": ["d:0-5", "NAM", "rebels", "rebels"]},
                "Conflict.Attack_Target": {"e2": ["d:6-9", "NAM", "base", "the base"]},
            },
        },
        "img2": {
            "event_id": "E2",
            "event_type": "Justice.Arrest",
            "event_trigger": "arrested",
            "event_args": {
                "Justice.Arrest_Person": {"e3": ["d:0-5", "NAM", "thief", "a thief"]},
            },
        },
    }


def test_negative_type_pool():
    pool = build_negative_type_pool(_salient_fixture())
    assert pool["Conflict"] == ["Justice.Arrest"]
    assert pool["Justice"] == ["Conflict.Attack"]


def test_generate_descriptions_template_template():
    captions = {"img1": "Rebels attacked the base.", "img2": "Police arrested a thief."}
    out = generate_descriptions(
        ["template"], ["template"], TEMPLATES, _salient_fixture(), captions, seed=0
    )
    d1 = out["img1"]
    assert d1["pos"] == ["rebels attacked the base using instrument at place"]
    # event-level negative: the Arrest template filled with Attack's args
    assert len(d1["neg_event"]) == 1
    assert "arrested" in d1["neg_event"][0]
    assert "rebels" in d1["neg_event"][0] or "the base" in d1["neg_event"][0]
    # argument-level negative: an argument landed in a wrong slot
    assert len(d1["neg_argument"]) == 1
    assert d1["neg_argument"][0] != d1["pos"][0]
    # no unfilled <argN> slots anywhere
    for group in d1.values():
        for text in group:
            assert "<arg" not in text


def test_generate_descriptions_deterministic():
    captions = {"img1": "c1", "img2": "c2"}
    a = generate_descriptions(["template"], ["template"], TEMPLATES, _salient_fixture(), captions, seed=7)
    b = generate_descriptions(["template"], ["template"], TEMPLATES, _salient_fixture(), captions, seed=7)
    c = generate_descriptions(["template"], ["template"], TEMPLATES, _salient_fixture(), captions, seed=8)
    assert a == b
    assert a != c  # different seed, different role swaps


def test_generate_descriptions_styles():
    captions = {"img1": "Rebels attacked the base.", "img2": "Police arrested a thief."}
    out = generate_descriptions(
        ["short", "shortverb"], ["short", "shortverb"], TEMPLATES,
        _salient_fixture(), captions, seed=0,
    )
    d1 = out["img1"]
    assert d1["pos"][0].startswith("An image of attack event.")
    assert "The attacker are rebels." in d1["pos"][0]
    assert d1["pos"][1] == "An image of attack event. "
    assert any(s.startswith("An image of arrest event.") for s in d1["neg_event"])


@pytest.mark.slow
def test_preprocess_cli_feeds_training(tmp_path):
    """CLI → descriptions json → VOADescriptionDataset consumes it."""
    ent, evt = _write_cs(tmp_path)
    # build captions keyed to the .cs doc ids
    mapping = {"d1": {"0": {"url": "", "cap": "Rebels attacked the base."}}}
    mapping_json = tmp_path / "mapping.json"
    mapping_json.write_text(json.dumps(mapping))
    template_json = tmp_path / "templates.json"
    template_json.write_text(json.dumps(TEMPLATES))
    out_dir = tmp_path / "out"

    cfg = {
        "output_dir": str(out_dir),
        "cs_inputs": [[ent, ""], [evt, ""]],
        "image_caption_json": [str(mapping_json)],
        "template_file": str(template_json),
        "positive_option": ["template"],
        "negative_option": ["template"],
        "add_clip_sim": False,
        "seed": 0,
    }
    cfg_path = tmp_path / "pp.json"
    cfg_path.write_text(json.dumps(cfg))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "preprocess_descriptions.py", "--cfg", str(cfg_path)],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    desc = json.load(open(out_dir / "descriptions_template_template.json"))
    # doc-level key 'd1' — the dataset matches on image ids 'd1_0'
    assert "d1" in desc
    assert (out_dir / "doc_salient_event_False_mergeTrue.json").exists()
    assert (out_dir / "image_caption_clean.json").exists()
