"""Zero-shot GSR/SWiG eval: verb classification + argument grounding +
the imSitu/SWiG noun metrics (value, value-all, grounded-value[-all] —
see clip_event_tpu/evals/gsr.py for the protocol citations). Documented
entry, README.md:216-220.

Config keys: anno_json, image_dir, ontology_json, ckpt, [prompt, model,
batch_size, max_roles, ground_topk, value_metrics, iou_threshold,
output_json].
"""

from clip_event_tpu.evals.cli import run


def evaluate(cfg, params, mcfg):
    from clip_event_tpu.data.sr import GSRDataset
    from clip_event_tpu.evals.gsr import evaluate_gsr

    dataset = GSRDataset(
        anno_json=cfg["anno_json"],
        image_dir=cfg["image_dir"],
        ontology_json=cfg["ontology_json"],
        prompt=cfg.get("prompt", "name"),
        max_roles=cfg.get("max_roles", 6),
        load_object=cfg.get("load_object", False),
        object_detection=cfg.get("object_detection"),
        object_class_map=cfg.get("object_class_map"),
        object_threshold=cfg.get("object_threshold", 0.2),
        object_topk=cfg.get("object_topk", 40),
        image_size=mcfg.image_resolution,
    )
    return evaluate_gsr(
        params, mcfg, dataset,
        batch_size=cfg.get("batch_size", 32),
        ground_topk=cfg.get("ground_topk", 4),
        ground_via=cfg.get("ground_via", "grid"),
        value_metrics=cfg.get("value_metrics", True),
        iou_threshold=cfg.get("iou_threshold", 0.5),
    )


if __name__ == "__main__":
    run("Zero-shot GSR/SWiG evaluation", evaluate)
