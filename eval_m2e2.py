"""Zero-shot M2E2 multimedia event extraction eval (documented entry,
README.md:212-215) under the M2E2 per-mention P/R/F1 protocol (Li et al.,
ACL 2020; the CVPR'22 CLIP-Event zero-shot numbers use the same protocol —
see clip_event_tpu/evals/m2e2.py for the formula).

Config keys: image_anno, image_dir, ie_ontology_json, ckpt, [model,
batch_size, image_suffix, image_list, null_threshold,
select_null_threshold, ground_arguments, arg_topk, iou_threshold,
output_json].

`select_null_threshold: true` sweeps the threshold to max event F1 on a
deterministic dev half and reports held-out metrics at the selected value
(emitted as `null_threshold_selected`; see evals/m2e2.py).
"""

from clip_event_tpu.evals.cli import run


def evaluate(cfg, params, mcfg):
    from clip_event_tpu.data.m2e2 import M2E2Dataset
    from clip_event_tpu.evals.m2e2 import evaluate_m2e2

    dataset = M2E2Dataset(
        image_anno=cfg["image_anno"],
        image_dir=cfg["image_dir"],
        ie_ontology_json=cfg["ie_ontology_json"],
        image_list=cfg.get("image_list"),
        image_suffix=cfg.get("image_suffix", ".jpg"),
        image_size=mcfg.image_resolution,
    )
    return evaluate_m2e2(
        params,
        mcfg,
        dataset,
        batch_size=cfg.get("batch_size", 32),
        null_threshold=cfg.get("null_threshold"),
        select_null_threshold=cfg.get("select_null_threshold", False),
        ground_arguments=cfg.get("ground_arguments", False),
        arg_topk=cfg.get("arg_topk", 4),
        iou_threshold=cfg.get("iou_threshold", 0.5),
    )


if __name__ == "__main__":
    run("Zero-shot M2E2 evaluation", evaluate)
