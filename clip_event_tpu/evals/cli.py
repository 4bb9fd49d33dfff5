"""Shared CLI plumbing for the eval entry points (README.md:212-229)."""

from __future__ import annotations

import argparse
import json
import logging
import os


def build_parser(description: str) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--cfg", type=str, required=True, help="eval config JSON")
    return parser


def load_model_from_cfg(cfg: dict):
    """Returns (params, CLIPConfig) from `ckpt` (orbax dir or torch file) or
    `model` preset with random init (for smoke runs).

    `"quantize": "int8"` switches the dense weights to the W8A8 inference
    path (`ops/quant.py`); `"int8_static"` adds calibrated static
    activation scales (vision encode +12–50% depending on model width,
    PERFORMANCE.md), with optional `"quantize_towers": ["visual"]` and
    `"calibration_batches": N`."""
    from clip_event_tpu.config import model_config
    from clip_event_tpu.engine.checkpoint import (
        import_initial_checkpoint,
        restore_checkpoint,
    )

    ckpt = cfg.get("ckpt")
    if ckpt:
        if os.path.isdir(ckpt):
            params, _opt, _meta = restore_checkpoint(ckpt)
            mcfg = model_config(cfg)
        else:
            params, mcfg = import_initial_checkpoint(ckpt)
    else:
        import jax

        logging.warning("no `ckpt` in config — evaluating a randomly initialized model")
        from clip_event_tpu.models import init_params

        mcfg = model_config(cfg)
        params = init_params(jax.random.PRNGKey(cfg.get("seed", 0)), mcfg)

    quant = cfg.get("quantize")
    if quant:
        if quant not in ("int8", "int8_static"):
            raise ValueError(
                f"quantize={quant!r}; options: 'int8' (dynamic activation "
                "scales), 'int8_static' (calibrated static scales)"
            )
        from clip_event_tpu.ops.quant import quantize_params

        act_stats = None
        if quant == "int8_static":
            from clip_event_tpu.ops.quant import calibrate_act_scales

            imgs, toks = calibration_batches_from_cfg(cfg, mcfg)
            act_stats = calibrate_act_scales(params, mcfg, imgs, toks)
        towers = cfg.get("quantize_towers")  # e.g. ["visual"] — the measured
        # sweet spot: static-int8 vision (+12–18%) with the text tower left
        # in bf16 (where int8 measures slower, PERFORMANCE.md)
        logging.info(
            "quantizing dense weights to int8 (W8A8 inference path%s)",
            f", towers={towers}" if towers else "",
        )
        params = quantize_params(
            params, act_stats=act_stats, towers=tuple(towers) if towers else None
        )
    return params, mcfg


def calibration_batches_from_cfg(cfg: dict, mcfg):
    """Sample batches for static-int8 activation calibration.

    REAL samples when the config provides them (the documented-better path,
    PERFORMANCE.md "static calibrated activation scales"):
      * `calibration_images`: a directory (or list of files) of images —
        decoded through the exact serving preprocess;
      * `calibration_texts`: a text file, one prompt per line.

    Synthetic fallback otherwise: CLIP-normalized images are ~N(0, 1) and
    the fp32-island LayerNorms make downstream activation magnitudes largely
    data-independent, so noise images + a handful of tokenized prompts land
    close to real-data scales (cosine > 0.99 measured on disjoint real
    JPEGs, tests/test_full_scale.py) — but real weights carry activation
    outliers random init does not, so prefer real batches for deployment.

    Returns (image_batches, token_batches) for `calibrate_act_scales`.
    """
    import numpy as np

    from clip_event_tpu.tokenizer import tokenize

    rng = np.random.default_rng(cfg.get("seed", 0))
    bs = min(int(cfg.get("batch_size", 16)), 16)
    res = mcfg.image_resolution

    src = cfg.get("calibration_images")
    if src:
        from clip_event_tpu.data.common import load_image_file

        files = (
            sorted(
                os.path.join(src, f)
                for f in os.listdir(src)
                if f.lower().endswith((".jpg", ".jpeg", ".png"))
            )
            if isinstance(src, str)
            else list(src)
        )
        if not files:
            raise ValueError(f"calibration_images: no images under {src!r}")
        arr = np.stack([load_image_file(f, res) for f in files])
        imgs = [arr[i : i + bs] for i in range(0, len(arr), bs)]
        logging.info(
            "int8 calibration: %d REAL images from %s", len(arr), src
        )
    else:
        n = int(cfg.get("calibration_batches", 2))
        imgs = [
            rng.normal(size=(bs, res, res, 3)).astype(np.float32)
            for _ in range(n)
        ]
        logging.info(
            "int8 calibration: %d synthetic image batches (pass "
            "`calibration_images` for exact scales)", n
        )

    texts_src = cfg.get("calibration_texts")
    if texts_src:
        prompts = [
            line.strip() for line in open(texts_src, encoding="utf-8")
            if line.strip()
        ]
        if not prompts:
            raise ValueError(f"calibration_texts: {texts_src!r} is empty")
        logging.info("int8 calibration: %d REAL prompts from %s",
                     len(prompts), texts_src)
    else:
        prompts = [
            "a photo of a person", "an image of a protest march",
            "soldiers at a military checkpoint", "a meeting of officials",
            "a building on fire after an attack", "a crowd at a rally",
        ]
    if mcfg.vocab_size >= 49408:
        toks = np.asarray(tokenize(prompts, context_length=mcfg.context_length))
    else:  # reduced-vocab test models: synthetic token rows
        toks = np.zeros((len(prompts), mcfg.context_length), np.int32)
        toks[:, 0] = mcfg.vocab_size - 2
        toks[:, 1:8] = rng.integers(1, mcfg.vocab_size - 2, (len(prompts), 7))
        toks[:, 8] = mcfg.vocab_size - 1
    token_batches = [toks[i : i + bs] for i in range(0, len(toks), bs)]
    return imgs, token_batches


def run(description: str, evaluate) -> None:
    """Parse --cfg, build model, call `evaluate(cfg, params, mcfg)`,
    print the metrics JSON."""
    from clip_event_tpu.platform import ensure_backend

    ensure_backend()
    logging.basicConfig(level=logging.INFO)
    args = build_parser(description).parse_args()
    with open(args.cfg) as fh:
        cfg = json.load(fh)
    if cfg.get("image_cache") and not os.environ.get("CLIP_EVENT_IMAGE_CACHE"):
        from clip_event_tpu.data import cache as image_cache

        image_cache.activate(cfg["image_cache"])
    import jax

    # Megatron tensor parallelism for inference: "tp": N shards the
    # transformer weights over a (dp × tp) mesh so models too wide for one
    # chip evaluate across the slice. Single-process only (multi-process
    # eval sharding divides DATA per rank; combining both would need a
    # global mesh handshake this CLI doesn't do).
    tp = int(cfg.get("tp", 1))
    mesh = None
    if tp > 1:
        if jax.process_count() > 1:
            raise SystemExit("tp>1 evals are single-process only")
        if jax.device_count() % tp:
            raise SystemExit(
                f"tp={tp} does not divide device count {jax.device_count()}"
            )
        from clip_event_tpu.evals.common import set_eval_mesh
        from clip_event_tpu.parallel.sharding import make_mesh_2d

        mesh = make_mesh_2d(tp=tp)
        # Encoders shard their batches over this mesh's dp axis too
        set_eval_mesh(mesh)
    if cfg.get("use_pallas_attention", True):
        # same flagship attention path as training (PERFORMANCE.md); on a
        # tp mesh the kernel runs head-group-parallel via shard_map. On
        # non-TPU backends the kernel would only run in Mosaic interpret
        # mode (orders of magnitude slower than the XLA einsum path), so
        # keep XLA there — interpret mode is for tests, not production eval
        # runs.
        if jax.default_backend() == "tpu":
            from clip_event_tpu.models.layers import set_attention_impl

            set_attention_impl("pallas", mesh)
        else:
            logging.info(
                "use_pallas_attention requested but backend is %s — using the "
                "XLA attention path (Pallas interpret mode is test-only)",
                jax.default_backend(),
            )
    params, mcfg = load_model_from_cfg(cfg)
    if mesh is not None:
        from clip_event_tpu.parallel.sharding import shard_params

        # float weights shard column/row-wise; int8 QuantWeight leaves are
        # pytree-internal (no named leaf path) and stay replicated
        params = shard_params(params, mesh)
    metrics = evaluate(cfg, params, mcfg)
    print(json.dumps(metrics, indent=2))
    out = cfg.get("output_json")
    if out:
        with open(out, "w") as fh:
            json.dump(metrics, fh, indent=2)
