"""Zero-shot VisualCOMET eval (documented entry, README.md:225-229).

Config keys: anno_json, image_dir, ckpt, [field ∈ {event,intent,before,
after}, prompt, model, batch_size, output_json].
"""

from clip_event_tpu.evals.cli import run


def evaluate(cfg, params, mcfg):
    from clip_event_tpu.data.visualcomet import VisualCOMETDataset
    from clip_event_tpu.evals.visualcomet import evaluate_visualcomet

    dataset = VisualCOMETDataset(
        anno_json=cfg["anno_json"],
        image_dir=cfg["image_dir"],
        field=cfg.get("field", "event"),
        prompt=cfg.get("prompt", ""),
        image_size=mcfg.image_resolution,
    )
    return evaluate_visualcomet(params, mcfg, dataset, batch_size=cfg.get("batch_size", 32))


if __name__ == "__main__":
    run("Zero-shot VisualCOMET evaluation", evaluate)
