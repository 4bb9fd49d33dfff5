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
