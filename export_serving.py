"""Export a trained CLIP-Event model as an AOT serving bundle.

Usage:
    python export_serving.py --cfg eval_config.json --out bundle_dir/

The config uses the eval-CLI contract (`ckpt` orbax dir / torch file, or
`model` preset): the bundle holds batch-polymorphic StableHLO encoders +
weights + metadata (see `clip_event_tpu/engine/export.py`). Serve with:

    from clip_event_tpu.engine.export import load_serving_bundle
    m = load_serving_bundle("bundle_dir/")
    feats = m.encode_image(images)   # any batch size

This is the TPU-native counterpart of shipping the reference's TorchScript
JIT archive for inference (`clip.py:77-165`).
"""

from __future__ import annotations


def main():
    import argparse

    from clip_event_tpu.platform import ensure_backend

    parser = argparse.ArgumentParser(description="Export an AOT serving bundle")
    parser.add_argument("--cfg", type=str, required=True, help="model config JSON")
    parser.add_argument("--out", type=str, required=True, help="bundle output dir")
    parser.add_argument(
        "--context", type=int, default=0,
        help="export the text encoder at this static token width instead of "
        "the model's 77 (exact for texts whose EOT fits; ~1.5-1.8x faster "
        "text encode at 48/32 — the serving analogue of context_cap)",
    )
    args = parser.parse_args()

    ensure_backend()

    import json
    import logging

    import jax.numpy as jnp

    from clip_event_tpu.engine.export import save_serving_bundle
    from clip_event_tpu.evals.cli import load_model_from_cfg

    logging.basicConfig(level=logging.INFO)
    cfg = json.load(open(args.cfg))
    if cfg.get("quantize"):
        raise SystemExit(
            "export_serving exports the float model (quantized pytrees are a "
            "runtime representation); drop `quantize` from the config"
        )
    params, mcfg = load_model_from_cfg(cfg)
    dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else jnp.float32
    out = save_serving_bundle(args.out, params, mcfg, compute_dtype=dtype,
                              context=args.context or None)
    print(f"serving bundle written to {out}")


if __name__ == "__main__":
    main()
