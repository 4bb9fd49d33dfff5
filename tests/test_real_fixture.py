"""Real-text fixture: the reference's shipped VOA visualization pages
(`/root/reference/data/voa/voa_caption_visualization.zip`, output of
`data/voa/visualization.py:70-101`) mined back into pipeline inputs and run
end-to-end — the only genuine CLIP-Event corpus text reachable offline.

Covers: the miner's HTML inversion against a known record, the ColdStart
round-trip through `preprocess.ke.load_cs`, salient-event selection +
description generation on real captions/arguments, the real-corpus token
width facts PERFORMANCE.md cites, and a train.py CLI run on real captions.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tools.mine_voa_fixture import (
    build_templates,
    image_id_to_doc,
    parse_visualization_zip,
    write_fixture,
)

ZIP = "/root/reference/data/voa/voa_caption_visualization.zip"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ZIP), reason="reference visualization zip not present"
)


@pytest.fixture(scope="module")
def records():
    return parse_visualization_zip(ZIP, limit=60)


@pytest.fixture(scope="module")
def fixture_dir(records, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("voa_real"))
    write_fixture(records, out)
    return out


def test_miner_parses_known_record(records):
    """First record of page 0: real caption, real events, real arguments
    (spot-checked by hand against the HTML)."""
    rec = records["VOA_EN_NW_2017_03_22_3777440_0"]
    assert rec["caption"].startswith(
        "Nidhi Chaphekar , Jet Airways flight attendant"
    )
    assert "lays a rose on a memorial in Brussels" in rec["caption"]
    types = {ev["type"] for ev in rec["events"]}
    assert "Conflict.Attack" in types
    assert "GenericCrime.GenericCrime.GenericCrime" in types
    ev0 = rec["events"][0]
    assert ev0["trigger"] == "terror"
    assert (
        "GenericCrime.GenericCrime.GenericCrime_Victim",
        ":Entity_EDL_0047837",
        "Nidhi Chaphekar",
    ) in ev0["args"]
    # caption text carries no markup
    assert "<" not in rec["caption"] and "&" not in rec["caption"]


def test_image_id_doc_roundtrip():
    doc, idx = image_id_to_doc("VOA_EN_NW_2017_03_22_3777440_0")
    assert doc == "VOA_EN_NW_2017.03.22.3777440" and idx == "0"
    # preprocess_caption re-derives the underscore id (selection.py:189)
    assert f"{doc}_{idx}".replace(".", "_") == "VOA_EN_NW_2017_03_22_3777440_0"


def test_fixture_roundtrips_through_cs_parser(records, fixture_dir):
    """The emitted .cs lines parse back through the REAL ColdStart loader
    into the same events/types/argument canonical mentions."""
    from clip_event_tpu.preprocess.ke import load_cs_files

    store = load_cs_files(
        [(os.path.join(fixture_dir, "edl.cs"), ""),
         (os.path.join(fixture_dir, "event.cs"), "")]
    )
    for image_id, rec in records.items():
        got_events = store["doc_ke"][image_id]["event"]
        assert set(got_events) == {ev["id"] for ev in rec["events"]}
        for ev in rec["events"]:
            assert store["evt_info"][ev["id"]]["type"] == ev["type"]
            assert store["evt_info"][ev["id"]]["canonical_mention"] == ev["trigger"]
            parsed_args = store["evt_args"][ev["id"]]
            for role, ent_id, name in ev["args"]:
                role_short = role.split("#")[-1]
                assert ent_id in parsed_args[role_short]
                # tuple is (offset, mention_type, mention_text, canonical)
                assert parsed_args[role_short][ent_id][3] == name


def test_descriptions_on_real_captions(records, fixture_dir):
    """Salient-event selection + template generation on real IE output:
    positives verbalize the real arguments, no unfilled <argN> slots
    survive in positives, negatives differ from positives."""
    from clip_event_tpu.preprocess.ke import load_cs_files
    from clip_event_tpu.preprocess.selection import (
        preprocess_caption,
        select_salient_events,
    )
    from clip_event_tpu.preprocess.templates import generate_descriptions

    store = load_cs_files(
        [(os.path.join(fixture_dir, "edl.cs"), ""),
         (os.path.join(fixture_dir, "event.cs"), "")]
    )
    caps = preprocess_caption(
        [os.path.join(fixture_dir, "image_caption_mapping.json")]
    )
    # caption cleanup reproduces the mined captions
    assert caps["VOA_EN_NW_2017_03_22_3777440_0"] == records[
        "VOA_EN_NW_2017_03_22_3777440_0"
    ]["caption"]

    salient = select_salient_events(store, merge_args=True)
    assert len(salient) == len(records)
    templates = json.load(open(os.path.join(fixture_dir, "templates.json")))
    descriptions = generate_descriptions(
        ["template"], ["template"], templates, salient, caps,
        neg_num=2, seed=999,
    )
    assert len(descriptions) >= 0.9 * len(records)
    real_args_seen = 0
    for doc_id, rec in descriptions.items():
        assert rec["pos"] and rec["neg_event"] and rec["neg_argument"]
        pos = rec["pos"][0]
        # every slot of the positive's own template is filled or renamed
        assert "<arg" not in pos
        assert pos not in rec["neg_event"]
        # the salient event's canonical argument mentions appear verbatim
        for role, args in salient[doc_id]["event_args"].items():
            for tup in args.values():
                if tup[3] and tup[3] in pos:
                    real_args_seen += 1
    assert real_args_seen > len(descriptions)  # arguments really fill slots


def test_real_corpus_width_statistics(records, fixture_dir):
    """The PERFORMANCE.md claim: generated template descriptions fit a
    32-token static width losslessly (the context_cap=32 deployment row)."""
    from clip_event_tpu.preprocess.ke import load_cs_files
    from clip_event_tpu.preprocess.selection import (
        preprocess_caption,
        select_salient_events,
    )
    from clip_event_tpu.preprocess.templates import generate_descriptions
    from clip_event_tpu.tokenizer import tokenize

    store = load_cs_files(
        [(os.path.join(fixture_dir, "edl.cs"), ""),
         (os.path.join(fixture_dir, "event.cs"), "")]
    )
    caps = preprocess_caption(
        [os.path.join(fixture_dir, "image_caption_mapping.json")]
    )
    salient = select_salient_events(store, merge_args=True)
    descriptions = generate_descriptions(
        ["template"], ["template"],
        json.load(open(os.path.join(fixture_dir, "templates.json"))),
        salient, caps, neg_num=2, seed=999,
    )
    texts = []
    for rec in descriptions.values():
        texts += rec["pos"] + rec["neg_event"] + rec["neg_argument"]
    toks = tokenize(texts)
    widths = (np.asarray(toks) == 49407).argmax(axis=1) + 1
    assert (widths <= 48).all()          # hard bound on this subset
    assert (widths <= 32).mean() > 0.97  # ~100% corpus-wide (PERFORMANCE.md)


@pytest.mark.slow
def test_train_cli_on_real_captions(records, fixture_dir, tmp_path):
    """train.py end-to-end on REAL VOA captions + real-IE descriptions
    (synthetic JPEGs stand in for the unfetchable image URLs)."""
    from PIL import Image

    subset = dict(list(records.items())[:8])
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    mapping = {}
    for image_id in subset:
        doc, idx = image_id_to_doc(image_id)
        mapping.setdefault(doc, {})[idx] = {
            "cap": subset[image_id]["caption"], "url": ""
        }
        arr = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{image_id}.jpg")
    mapping_json = tmp_path / "mapping.json"
    mapping_json.write_text(json.dumps(mapping))

    from clip_event_tpu.preprocess.ke import load_cs_files
    from clip_event_tpu.preprocess.selection import (
        preprocess_caption,
        select_salient_events,
    )
    from clip_event_tpu.preprocess.templates import generate_descriptions

    store = load_cs_files(
        [(os.path.join(fixture_dir, "edl.cs"), ""),
         (os.path.join(fixture_dir, "event.cs"), "")]
    )
    caps = preprocess_caption([str(mapping_json)])
    salient = {k: v for k, v in select_salient_events(store).items() if k in subset}
    descriptions = generate_descriptions(
        ["template"], ["template"],
        json.load(open(os.path.join(fixture_dir, "templates.json"))),
        salient, caps, neg_num=2, seed=999,
    )
    desc_json = tmp_path / "descriptions.json"
    desc_json.write_text(json.dumps(descriptions))

    cfg = {
        "task": "realtext",
        "constrastive_loss": "ce",
        "constrastive_overbatch": True,
        "alignment": False,
        "posneg_descriptions_json": str(desc_json),
        "image_caption_json": [str(mapping_json)],
        "image_dir": [str(img_dir)],
        "load_object": False,
        "load_ie": False,
        "ckpt_dir": str(tmp_path / "ckpt"),
        "tb_log_dir": str(tmp_path / "logs"),
        "is_train": True,
        "begin_epoch": 0,
        "max_epoch": 1,
        "batch_size": 2,
        "lr": 1e-4,
        "optimizer": "adam",
        "weight_decay": 0.0,
        "lr_scheduler": "none",
        "compute_dtype": "float32",
        "remat": False,
        "num_workers": 2,
        "model": {
            "embed_dim": 64, "image_resolution": 32, "vision_layers": 2,
            "vision_width": 64, "vision_patch_size": 16, "context_length": 77,
            "vocab_size": 49408, "transformer_width": 64,
            "transformer_heads": 1, "transformer_layers": 2,
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "train.py", "--cfg", str(cfg_path)],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    ckpts = os.listdir(tmp_path / "ckpt" / "realtext")
    assert any(name.startswith("realtext_0") for name in ckpts)


def test_templates_cover_every_corpus_type():
    """build_templates emits a usable template for every event type in the
    full zip (curated or generated), so description generation never drops
    a salient event for a missing template."""
    records = parse_visualization_zip(ZIP)
    templates = build_templates(records)
    types = {ev["type"] for rec in records.values() for ev in rec["events"]}
    assert types <= set(templates)
    for etype, tmpl in templates.items():
        import re

        roles, text = tmpl["roles"], tmpl["template"]
        for i, role in enumerate(roles):
            assert text.count(f"<arg{i + 1}>") <= 1
        for m in re.finditer(r"<arg(\d+)>", text):  # no slot beyond the roles
            assert int(m.group(1)) <= len(roles)


def test_visualization_roundtrips_real_ie(records, fixture_dir, tmp_path):
    """L7 closure on real data: our visualization renderer consumes the
    mined .cs files (which the miner inverted FROM the reference's
    visualization pages) and reproduces the known record's events,
    trigger, and argument names in its own HTML."""
    from clip_event_tpu.preprocess.selection import preprocess_caption
    from clip_event_tpu.tools.visualization import render_ie_pages

    caps = preprocess_caption(
        [os.path.join(fixture_dir, "image_caption_mapping.json")]
    )
    out = tmp_path / "viz"
    shown = render_ie_pages(
        [os.path.join(fixture_dir, "edl.cs")],
        [os.path.join(fixture_dir, "event.cs")],
        str(out), captions=caps,
    )
    assert shown == len(records)
    html = "".join(
        open(os.path.join(out, f)).read() for f in sorted(os.listdir(out))
    )
    assert "Conflict.Attack" in html
    assert "GenericCrime.GenericCrime.GenericCrime" in html
    assert "Nidhi Chaphekar" in html  # argument canonical mention
    assert "lays a rose on a memorial" in html  # caption context


def _tiny_model_dict():
    return {
        "embed_dim": 64, "image_resolution": 32, "vision_layers": 2,
        "vision_width": 64, "vision_patch_size": 16, "context_length": 77,
        "vocab_size": 49408, "transformer_width": 64,
        "transformer_heads": 1, "transformer_layers": 2,
    }


_QUAD_BOXES = [  # normalized xyxy quadrants, cycled per argument slot
    (0.0, 0.0, 0.5, 0.5), (0.5, 0.0, 1.0, 0.5),
    (0.0, 0.5, 0.5, 1.0), (0.5, 0.5, 1.0, 1.0),
]


def _run_cli(script, cfg, tmp_path, tag):
    out_json = tmp_path / f"{tag}.json"
    cfg = dict(cfg, model=_tiny_model_dict(), batch_size=4,
               output_json=str(out_json))
    cfg_path = tmp_path / f"{tag}_cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, script), "--cfg", str(cfg_path)],
        capture_output=True, text=True, timeout=600,
        cwd=repo, env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert proc.returncode == 0, f"{script}: {proc.stderr[-3000:]}"
    return json.load(open(out_json))


def test_eval_protocols_on_real_ie_arguments(records, fixture_dir, tmp_path):
    """The FULL zero-shot protocol surface (eval_m2e2 --ground-arguments and
    eval_gsr's imSitu/SWiG value metrics) runs e2e against the mined
    corpus's REAL role-typed argument structure: real event types, real
    roles, real entity canonical mentions. Gold bboxes are synthesized
    (quadrant per argument slot, painted into the stand-in JPEGs — the real
    image URLs are unfetchable offline); the assertion is a non-degenerate
    protocol (gold and predicted argument mentions both non-empty), not an
    accuracy bar — the model is random-weight."""
    import re as _re

    from PIL import Image

    templates = json.load(open(os.path.join(fixture_dir, "templates.json")))

    # records whose first event carries >= 1 argument
    subset = {
        k: v for k, v in records.items()
        if v["events"] and v["events"][0]["args"]
    }
    subset = dict(list(subset.items())[:8])
    assert len(subset) >= 4, "mined fixture lost its argument-bearing records"

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    m2e2_anno, gsr_anno = {}, {}
    verbs, nouns, noun_ids = {}, {}, {}
    n_gold_args = 0
    for image_id, rec in subset.items():
        arr = rng.integers(0, 64, size=(96, 128, 3), dtype=np.uint8)
        events_out = []
        ev = rec["events"][0]
        etype = ev["type"]
        roles_seen, frame, bb = {}, {}, {}
        for j, (role_full, ent_id, name) in enumerate(ev["args"]):
            role = role_full.split("_")[-1]
            if role in roles_seen:
                continue
            x0, y0, x1, y1 = _QUAD_BOXES[j % 4]
            roles_seen[role] = [[x0, y0, x1, y1]]
            n_gold_args += 1
            # paint the gold region so grounding sees real signal
            h, w = arr.shape[:2]
            arr[int(y0 * h):int(y1 * h), int(x0 * w):int(x1 * w), j % 3] = 255
            # GSR side: role -> noun id for the REAL entity canonical mention
            if ent_id not in noun_ids:
                noun_ids[ent_id] = f"n{len(noun_ids):04d}"
                nouns[noun_ids[ent_id]] = {"gloss": [name], "def": name}
            frame[role.lower()] = noun_ids[ent_id]
            bb[role.lower()] = [
                int(x0 * 128), int(y0 * 96), int(x1 * 128), int(y1 * 96)
            ]
        events_out.append({"event_type": etype, "role": roles_seen})
        m2e2_anno[image_id] = {"events": events_out}
        Image.fromarray(arr).save(img_dir / f"{image_id}.jpg")

        verb = etype.lower().replace(".", "_")
        if verb not in verbs:
            t = templates[etype]
            order = [r.lower() for r in t["roles"]][:6]
            verbs[verb] = {
                "framenet": verb,
                "abstract": t["template"],
                "def": _re.sub(r"<arg(\d+)>",
                               lambda m: t["roles"][int(m.group(1)) - 1].lower(),
                               t["template"]),
                "order": order,
                "roles": {
                    r.lower(): {"framenet": r.lower(),
                                "def": f"The {r.lower()} of the event."}
                    for r in t["roles"]
                },
            }
        gsr_anno[f"{image_id}.jpg"] = {
            "verb": verb, "height": 96, "width": 128,
            "bb": bb, "frames": [frame],
        }
    assert n_gold_args >= 4

    # ontology with role descriptions (what ground_arguments requires)
    ontology = {}
    for etype, t in templates.items():
        text = _re.sub(r"<arg(\d+)>",
                       lambda m: t["roles"][int(m.group(1)) - 1].lower(),
                       t["template"])
        ontology[etype] = {
            "template": text,
            "roles": {r: f"The {r.lower()} of the event." for r in t["roles"]},
        }
    anno_path = tmp_path / "m2e2_anno.json"
    onto_path = tmp_path / "m2e2_onto.json"
    anno_path.write_text(json.dumps(m2e2_anno))
    onto_path.write_text(json.dumps(ontology))

    m = _run_cli("eval_m2e2.py", {
        "image_anno": str(anno_path), "image_dir": str(img_dir),
        "ie_ontology_json": str(onto_path), "ground_arguments": True,
    }, tmp_path, "m2e2")
    assert m["event_mentions_gold"] == len(subset)
    assert m["argument_mentions_gold"] == n_gold_args
    # non-degenerate: predictions were actually made on both sides
    assert m["event_mentions_pred"] > 0
    assert m["argument_mentions_pred"] > 0
    for k in ("argument_precision", "argument_recall", "argument_f1"):
        assert 0.0 <= m[k] <= 1.0
    assert m["per_type"]  # per-type breakdown over real AIDA types

    gsr_onto_path = tmp_path / "imsitu_space.json"
    gsr_anno_path = tmp_path / "gsr_anno.json"
    gsr_onto_path.write_text(json.dumps({"verbs": verbs, "nouns": nouns}))
    gsr_anno_path.write_text(json.dumps(gsr_anno))
    g = _run_cli("eval_gsr.py", {
        "anno_json": str(gsr_anno_path), "image_dir": str(img_dir),
        "ontology_json": str(gsr_onto_path),
    }, tmp_path, "gsr")
    assert g["value_roles"] > 0  # real roles entered the noun metrics
    for k in ("value", "value_all", "grounded_value", "grounded_value_all"):
        assert 0.0 <= g[k] <= 1.0
    assert "verb_top1" in g
