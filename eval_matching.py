"""Zero-shot image↔caption matching eval (BASELINE config #1).

Config keys: dataset ∈ {voa, meed}, ckpt, [model, batch_size, output_json];
voa: image_caption_json[] + image_dir[]; meed: anno_json + image_dir +
prompt.
"""

from clip_event_tpu.evals.cli import run


def evaluate(cfg, params, mcfg):
    from clip_event_tpu.evals.matching import evaluate_matching

    kind = cfg.get("dataset", "voa")
    if kind == "voa":
        from clip_event_tpu.data.voa import VOACaptionDataset

        dataset = VOACaptionDataset(
            image_caption_jsons=cfg["image_caption_json"],
            image_dirs=cfg["image_dir"],
            image_size=mcfg.image_resolution,
        )
    elif kind == "meed":
        from clip_event_tpu.data.meed import MEEDDataset

        dataset = MEEDDataset(
            anno_json=cfg["anno_json"],
            image_dir=cfg["image_dir"],
            prompt=cfg.get("prompt", "verbprefix"),
            image_size=mcfg.image_resolution,
        )
    else:
        raise ValueError("dataset must be 'voa' or 'meed'")
    return evaluate_matching(params, mcfg, dataset, batch_size=cfg.get("batch_size", 32))


if __name__ == "__main__":
    run("Zero-shot image-caption matching", evaluate)
