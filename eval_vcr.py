"""Zero-shot VCR eval (documented entry, README.md:221-224).

Config keys: qa_jsonl, image_dir, ckpt, [rationale, model, batch_size,
output_json]. Reports both Q→A and (with rationale=true) QA→R accuracy.
"""

from clip_event_tpu.evals.cli import run


def evaluate(cfg, params, mcfg):
    from clip_event_tpu.data.vcr import VCRDataset
    from clip_event_tpu.evals.vcr import evaluate_vcr

    dataset = VCRDataset(
        qa_jsonl=cfg["qa_jsonl"],
        image_dir=cfg["image_dir"],
        rationale=cfg.get("rationale", False),
        image_size=mcfg.image_resolution,
    )
    return evaluate_vcr(params, mcfg, dataset, batch_size=cfg.get("batch_size", 32))


if __name__ == "__main__":
    run("Zero-shot VCR evaluation", evaluate)
