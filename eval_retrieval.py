"""Image–text retrieval eval on COCO (Karpathy) or Flickr30k.

Config keys: dataset ∈ {coco, flickr}, ckpt, [model, batch_size,
output_json]; coco: caption_file + image_dir; flickr: split_list +
caption_file + image_dir.
"""

from clip_event_tpu.evals.cli import run


def evaluate(cfg, params, mcfg):
    from clip_event_tpu.data.retrieval import COCODataset, FlickrDataset
    from clip_event_tpu.evals.retrieval import evaluate_retrieval

    kind = cfg.get("dataset", "coco")
    if kind == "coco":
        dataset = COCODataset(
            caption_file=cfg["caption_file"],
            image_dir=cfg["image_dir"],
            prompt=cfg.get("prompt", "An photo of"),
            image_size=mcfg.image_resolution,
        )
    elif kind == "flickr":
        dataset = FlickrDataset(
            split_list=cfg["split_list"],
            caption_file=cfg["caption_file"],
            image_dir=cfg["image_dir"],
            image_size=mcfg.image_resolution,
        )
    else:
        raise ValueError("dataset must be 'coco' or 'flickr'")
    return evaluate_retrieval(params, mcfg, dataset, batch_size=cfg.get("batch_size", 32))


if __name__ == "__main__":
    run("Image-text retrieval evaluation", evaluate)
