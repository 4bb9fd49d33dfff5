"""Synthetic VOA-style corpus fixture (stands in for VOA_EN_NW_2017_sample50)."""

import json
import os
import pickle

import numpy as np


def make_voa_fixture(root, num_docs=6, images_per_doc=1, seed=0):
    """Create images + caption mapping + descriptions + detections + .cs files."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "jpg")
    os.makedirs(img_dir, exist_ok=True)

    mapping = {}
    descriptions = {}
    detections = {}
    entity_lines = []
    event_lines = []

    for d in range(num_docs):
        doc_id = f"VOA_EN_NW_2017_{d:02d}"
        mapping[doc_id] = {}
        for i in range(images_per_doc):
            image_id = f"{doc_id}_{i}"
            arr = rng.integers(0, 256, size=(120 + 8 * d, 160, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(img_dir, image_id + ".jpg"))
            mapping[doc_id][str(i)] = {
                "url": f"http://example.com/{image_id}.jpg",
                "cap": f"FILE - Protesters march in city {d}, file photo {i}.",
            }
            descriptions[image_id] = {
                "pos": [f"A protest event in city {d}."],
                "neg_event": [f"A wedding ceremony in city {d}."],
                "neg_argument": [f"Police march against protesters in city {d}."],
            }
            detections[image_id] = [
                {"label": "/m/01g317", "bbox": [5, 5, 80, 90], "score": 0.9},
                {"label": "/m/0k4j", "bbox": [40, 10, 150, 100], "score": 0.5},
                {"label": "/m/rejected", "bbox": [0, 0, 10, 10], "score": 0.99},
                {"label": "/m/01g317", "bbox": [2, 2, 30, 40], "score": 0.05},
            ]
            ent_id = f":Entity_EDL_{d:07d}"
            entity_lines += [
                f"{ent_id}\ttype\thttps://tac.nist.gov/ontology#Person",
                f'{ent_id}\tcanonical_mention\t"protester {d}"\t{image_id}:0-9\t1.0',
            ]
            evt_id = f":Event_{d:07d}"
            event_lines += [
                f"{evt_id}\ttype\thttps://tac.nist.gov/ontology#Conflict.Attack",
                f'{evt_id}\tmention.actual\t"march"\t{image_id}:12-17\t1.0',
                f"{evt_id}\tConflict.Attack_Attacker.actual\t{ent_id}\t{image_id}:0-9\t1.0",
            ]

    paths = {
        "image_dir": img_dir,
        "mapping_json": os.path.join(root, "image_caption_mapping.json"),
        "descriptions_json": os.path.join(root, "descriptions_template_template.json"),
        "object_pickle": os.path.join(root, "det_results.pkl"),
        "ontology_csv": os.path.join(root, "class-descriptions-boxable.csv"),
        "entity_cs": os.path.join(root, "merged.cs"),
        "event_cs": os.path.join(root, "event_rewrite.cs"),
    }
    json.dump(mapping, open(paths["mapping_json"], "w"))
    json.dump(descriptions, open(paths["descriptions_json"], "w"))
    pickle.dump(detections, open(paths["object_pickle"], "wb"))
    with open(paths["ontology_csv"], "w") as fh:
        fh.write("/m/01g317,Person,1\n/m/0k4j,Car,1\n/m/rejected,Tree,0\n")
    with open(paths["entity_cs"], "w") as fh:
        fh.write("\n".join(entity_lines) + "\n")
    with open(paths["event_cs"], "w") as fh:
        fh.write("\n".join(event_lines) + "\n")
    return paths

def _save_images(img_dir, names, rng, size=(96, 128)):
    from PIL import Image
    os.makedirs(img_dir, exist_ok=True)
    for name in names:
        arr = rng.integers(0, 256, size=size + (3,), dtype=np.uint8)
        path = os.path.join(img_dir, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(arr).save(path)


def make_m2e2_fixture(root, num_images=8, seed=1):
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "m2e2_images")
    types = ["Conflict.Attack", "Justice.Arrest", "Movement.Transport"]
    ontology = {t: f"An image of {t.split('.')[-1].lower()} event." for t in types}
    anno = {}
    names = []
    for i in range(num_images):
        image_id = f"m2e2_{i:03d}"
        names.append(image_id + ".jpg")
        anno[image_id] = {
            "event_type": types[i % len(types)],
            "role": {"Attacker": [[0.1, 0.1, 0.5, 0.5]]},
        }
    _save_images(img_dir, names, rng)
    paths = {
        "image_dir": img_dir,
        "anno_json": os.path.join(root, "m2e2_anno.json"),
        "ontology_json": os.path.join(root, "m2e2_ontology.json"),
    }
    json.dump(anno, open(paths["anno_json"], "w"))
    json.dump(ontology, open(paths["ontology_json"], "w"))
    return paths


def make_swig_fixture(root, num_images=6, seed=2):
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "swig_images")
    verbs = {
        "marching": {
            "framenet": "Mass_motion", "abstract": "AGENTS march in PLACE",
            "def": "to walk in a procession", "order": ["agent", "place"],
            "roles": {
                "agent": {"framenet": "individuals", "def": "The marchers"},
                "place": {"framenet": "place", "def": "Where it happens"},
            },
        },
        "arresting": {
            "framenet": "Arrest", "abstract": "AGENT arrests SUSPECT in PLACE",
            "def": "to take into custody", "order": ["agent", "suspect", "place"],
            "roles": {
                "agent": {"framenet": "authorities", "def": "The arrester"},
                "suspect": {"framenet": "suspect", "def": "The one arrested"},
                "place": {"framenet": "place", "def": "Where it happens"},
            },
        },
    }
    nouns = {
        "n001": {"gloss": ["person", "human"], "def": "a human being"},
        "n002": {"gloss": ["street"], "def": "a public road"},
    }
    anno = {}
    names = []
    verb_names = list(verbs)
    for i in range(num_images):
        name = f"swig_{i:03d}.jpg"
        names.append(name)
        verb = verb_names[i % 2]
        anno[name] = {
            "verb": verb, "height": 96, "width": 128,
            "bb": {"agent": [5, 5, 60, 90], "place": [-1, -1, -1, -1]},
            "frames": [{"agent": "n001", "place": "n002"}],
        }
    _save_images(img_dir, names, rng)
    paths = {
        "image_dir": img_dir,
        "anno_json": os.path.join(root, "swig_anno.json"),
        "ontology_json": os.path.join(root, "imsitu_space.json"),
        "mapping_tsv": os.path.join(root, "verb_mapping.tsv"),
    }
    json.dump(anno, open(paths["anno_json"], "w"))
    json.dump({"verbs": verbs, "nouns": nouns}, open(paths["ontology_json"], "w"))
    with open(paths["mapping_tsv"], "w") as fh:
        fh.write("marching\tagent\tConflict.Demonstrate\tEntity\n")
        fh.write("arresting\tagent\tJustice.Arrest-Jail\tAgent\n")
        fh.write("arresting\tsuspect\tJustice.Arrest-Jail\tPerson\n")
    return paths


def make_vcr_fixture(root, num_q=5, seed=3):
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "vcr_images")
    names, lines = [], []
    for i in range(num_q):
        name = f"movie/clip_{i}.jpg"
        names.append(name)
        lines.append(json.dumps({
            "annot_id": f"q{i}",
            "movie": "movie",
            "objects": ["person", "car"],
            "img_fn": name,
            "metadata_fn": "meta.json",
            "question": ["Why", "is", [0], "running", "?"],
            "answer_choices": [
                [[0], "is", "late"], ["the", [1], "is", "fast"],
                ["it", "rains"], ["nothing", "happens"],
            ],
            "answer_label": i % 4,
            "rationale_choices": [
                [[0], "looks", "worried"], ["streets", "are", "empty"],
                [[1], "honks"], ["a", "dog", "barks"],
            ],
            "rationale_label": (i + 1) % 4,
        }))
    _save_images(img_dir, names, rng)
    paths = {"image_dir": img_dir, "qa_jsonl": os.path.join(root, "val.jsonl")}
    with open(paths["qa_jsonl"], "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return paths


def make_retrieval_fixture(root, num_images=4, seed=4):
    rng = np.random.default_rng(seed)
    coco_dir = os.path.join(root, "coco_images")
    names = [f"{i:012d}.jpg" for i in range(num_images)]
    _save_images(coco_dir, names, rng)
    coco = {"images": [
        {"filename": f"COCO_val2014_{n}", "sentences": [
            {"raw": f"Caption {j} for image {i}."} for j in range(5)
        ]} for i, n in enumerate(names)
    ]}
    flickr_dir = os.path.join(root, "flickr_images")
    fnames = [f"1000{i}" for i in range(num_images)]
    _save_images(flickr_dir, [f + ".jpg" for f in fnames], rng)
    paths = {
        "coco_dir": coco_dir,
        "coco_json": os.path.join(root, "dataset_coco.json"),
        "flickr_dir": flickr_dir,
        "flickr_split": os.path.join(root, "train.txt"),
        "flickr_csv": os.path.join(root, "captions.csv"),
    }
    json.dump(coco, open(paths["coco_json"], "w"))
    with open(paths["flickr_split"], "w") as fh:
        fh.write("\n".join(fnames) + "\n")
    with open(paths["flickr_csv"], "w") as fh:
        for f in fnames:
            for j in range(5):
                fh.write(f"{f}.jpg| {j}| a photo number {j} of scene {f}\n")
    return paths


def make_visualcomet_fixture(root, num_images=5, seed=5):
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "vcomet_images")
    names = [f"vc_{i}.jpg" for i in range(num_images)]
    _save_images(img_dir, names, rng)
    anno = [
        {
            "img_fn": n, "movie": "m", "place": "street",
            "event": f"person {i} marches through the crowd",
            "intent": [f"protest issue {i}", f"reach destination {i}"],
            "before": [f"gathered at square {i}"],
            "after": [f"went home {i}"],
        }
        for i, n in enumerate(names)
    ]
    paths = {"image_dir": img_dir, "anno_json": os.path.join(root, "vcomet.json")}
    json.dump(anno, open(paths["anno_json"], "w"))
    return paths


def make_meed_fixture(root, num_images=4, seed=6):
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "meed_images")
    names = [f"meed_{i}.jpg" for i in range(num_images)]
    _save_images(img_dir, names, rng)
    anno = [
        {
            "image_name": n, "trigger": {"word": "march"},
            "event": "Conflict.Demonstrate",
            "text": [f"text a {i}", f"text b {i}", f"text c {i}"],
        }
        for i, n in enumerate(names)
    ]
    paths = {"image_dir": img_dir, "anno_json": os.path.join(root, "meed.json")}
    json.dump(anno, open(paths["anno_json"], "w"))
    return paths
