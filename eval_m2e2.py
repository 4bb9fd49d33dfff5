"""Zero-shot M2E2 event extraction eval (documented entry, README.md:212-215).

Config keys: image_anno, image_dir, ie_ontology_json, ckpt, [model,
batch_size, image_suffix, output_json].
"""

from clip_event_tpu.evals.cli import run


def evaluate(cfg, params, mcfg):
    from clip_event_tpu.data.m2e2 import M2E2Dataset
    from clip_event_tpu.evals.m2e2 import evaluate_m2e2

    dataset = M2E2Dataset(
        image_anno=cfg["image_anno"],
        image_dir=cfg["image_dir"],
        ie_ontology_json=cfg["ie_ontology_json"],
        image_suffix=cfg.get("image_suffix", ".jpg"),
        image_size=mcfg.image_resolution,
    )
    return evaluate_m2e2(params, mcfg, dataset, batch_size=cfg.get("batch_size", 32))


if __name__ == "__main__":
    run("Zero-shot M2E2 evaluation", evaluate)
