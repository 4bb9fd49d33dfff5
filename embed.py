"""Batch embedding export CLI — encode an image/text corpus into sharded
`.npz` feature files for serving, indexing, or retrieval.

Config keys: `output_dir` (required), `image_dir`/`image_files`,
`text_file`/`texts`, plus the shared model keys (`ckpt` or `model`,
`batch_size`). See `clip_event_tpu/embed.py::run_embed`.

The reference has no offline embedding surface — its preprocessing re-runs
CLIP forward passes inline per document
(`preprocess_description_contrastive.py:116-144`); this exports the
embeddings once so downstream consumers reuse a single encode pass.
"""

from clip_event_tpu.evals.cli import run


def evaluate(cfg, params, mcfg):
    from clip_event_tpu.embed import run_embed

    return run_embed(cfg, params, mcfg)


if __name__ == "__main__":
    run("Batch embedding export", evaluate)
