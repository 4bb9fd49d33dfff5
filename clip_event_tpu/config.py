"""Config-JSON contract (reference README.md:151-197) with real validation.

Same keys and semantics as the reference's `--cfg` JSON (including the
original `constrastive_*` spellings), plus a schema layer the reference
lacked: type/choice checks, cross-field constraints (bce↔instance,
kl↔overbatch, alignment⇒object+IE channels), and defaults for every
optional key. New TPU-specific keys are additive and default sensibly:

  compute_dtype          'float32' | 'bfloat16'      (default bfloat16)
  moment_dtype           None | 'float32' | 'bfloat16' — optimizer moment
                         storage (bf16 mu cuts Adam state HBM 25%)
  remat                  bool | 'full'|'dots'|'dots_nobatch'|'attn'  (default true)
  use_pallas_ot          bool | 'auto'               (default auto: fused
                         kernel once node caps ≥ 32, XLA scan below)
  use_pallas_attention   bool                        (default true)
  use_pallas_ln          bool — fused one-pass LayerNorm kernels (default false)
  num_workers            host loader threads         (default 8)
  max_objects/max_entities/max_events  static-shape caps
  steps_per_epoch_schedule  bool — true reproduces the reference's
      per-step scheduler stepping (`engine.py:94`), false steps per epoch.
"""

from __future__ import annotations

import json
import logging
from typing import Any, Dict

_CHOICES = {
    "constrastive_loss": ("ce", "bce", "kl"),
    "optimizer": ("adam", "sgd"),
    "lr_scheduler": ("cosineannealinglr", "multisteplr", "warmup", "warmupmultisteplr", "none"),
    "log_level": ("info", "debug"),
    "compute_dtype": ("float32", "bfloat16"),
    "moment_dtype": ("float32", "bfloat16"),
}

_REQUIRED = ("task", "constrastive_loss", "batch_size", "lr", "optimizer", "max_epoch")

_DEFAULTS: Dict[str, Any] = {
    "constrastive_overbatch": True,
    "alignment": False,
    # sequential lax.map slices for the sim_entity object/entity encodes —
    # peak activation memory divides by this at zero extra FLOPs
    "alignment_chunks": 4,
    "multiattention": False,
    "posneg_descriptions_json": None,
    "image_caption_json": [],
    "image_dir": [],
    "load_object": False,
    "object_pickle": [],
    "object_ontology_file": None,
    "object_detection_threshold": 0.2,
    "object_topk": 50,
    "load_ie": False,
    "ie_ontology_json": None,
    "input_entities": [],
    "input_events": [],
    "ltf_dir": None,
    "load_sr": False,
    "sync_bn": False,
    "ckpt_dir": "checkpoints",
    "tb_log_dir": "logs",
    "print_freq": 1,
    "log_level": "info",
    "is_train": True,
    "begin_ckpt": None,
    "jit": False,
    "begin_epoch": 0,
    "max_epoch": 30,
    "weight_decay": 0.0,
    "momentum": 0.9,
    "lr_scheduler": "none",
    "lr_steps": [],
    "lr_gamma": 0.1,
    "warmup_epoch": 5,
    "seed": 999,
    "grad_clip_norm": 1.0,
    # TPU-native additions
    "model": "ViT-B/32",
    "compute_dtype": "bfloat16",
    "remat": True,
    "use_pallas_ot": "auto",
    # fused packed-QKV attention kernel: 339→239 ms/step on ViT-B/32 B=256
    # (PERFORMANCE.md); under tp>1 meshes it runs head-group-parallel via
    # shard_map (einsum fallback only when heads/width don't divide tp)
    "use_pallas_attention": True,
    # fused LayerNorm kernels (standalone LN + residual-add+LN in one HBM
    # pass each, ops/ln_pallas.py); default off pending a measured win —
    # falls back to XLA under sp or non-128-tiled widths
    "use_pallas_ln": False,
    # Megatron tensor parallelism: mesh becomes (dp = devices//tp) × tp,
    # transformer weights column/row-sharded (parallel/sharding.py); 1 = dp
    # only. The stretch parallelism for ViT-L/14+ (SURVEY §2.7).
    "tp": 1,
    # Pipeline parallelism: mesh becomes (dp = devices//pp) × pp, every
    # transformer stack whose L axis divides pp is layer-sharded over 'pp'
    # and runs the GPipe microbatch schedule (parallel/pipeline.py); 1 = off.
    # Mutually exclusive with tp (pick ONE model-sharding axis).
    "pp": 1,
    # Megatron sequence parallelism (requires tp > 1): between transformer
    # blocks the residual stream's SEQUENCE axis is sharded over 'tp'
    # (models/layers.py::set_sequence_parallel), so the LayerNorm passes and
    # residual adds — otherwise replicated across the tp group — run
    # 1/tp-sized, and per-device activation memory for the stream drops tp×.
    # GSPMD swaps the row-parallel projections' all-reduce for a
    # reduce-scatter + all-gather pair (same bytes). Identity in math.
    "sp": False,
    # GPipe microbatches per pipelined stack forward (bubble fraction
    # (pp-1)/(M+pp-1)); clipped to a divisor of the batch at trace time.
    "pp_microbatches": 4,
    # Multi-slice data parallelism: number of DCN-connected slices. >1
    # prepends a 'dcn' mesh axis outside dp (and tp), so the batch shards
    # over dcn×dp and the gradient reduction decomposes hierarchically —
    # reduce-scatter/all-gather over ICI inside each slice, only per-slice
    # partials over the slow DCN links (parallel/mesh.py::make_mesh).
    # ZeRO/FSDP sharding stays on the intra-slice dp axis by design (their
    # per-step weight/update gathers must ride ICI). 1 = single slice.
    "dcn_dp": 1,
    # ZeRO-1 optimizer-state sharding: partition Adam moments over the dp
    # axis (parallel/sharding.py::zero_opt_shardings). Divides the fp32
    # moment HBM (2× param bytes) by the dp degree at the cost of one
    # param-sized all-gather of the update per step. No effect on 1 device.
    "zero": False,
    # ZeRO-3 / FSDP parameter sharding: additionally partition the params
    # themselves over dp (parallel/sharding.py::fsdp_param_shardings). Per-
    # device param HBM divides by dp at the cost of one all-gather per
    # weight per direction per step; implies sharded moments. No effect on
    # 1 device.
    "fsdp": False,
    # Static text-sequence cap: tokenize descriptions / entity mentions /
    # bbox label texts to THIS many tokens instead of the model's 77. The
    # text transformer is causal and pools at EOT, so any text whose
    # tokenization (SOT + ids + EOT) fits the cap produces the SAME pooled
    # embedding as the 77-wide layout — compute just drops ~linearly in the
    # cap (the text tower is ~70% of the train step, PERFORMANCE.md).
    # Over-long texts truncate-keep-EOT at the cap, the same rule the
    # reference applies at 77 (`clip.py:194-196`). The loader logs the
    # fraction of texts that hit the cap so the truncation cost is visible.
    # 0 = off (full context_length).
    "context_cap": 0,
    # Lossless length bucketing: a list of static text widths (e.g.
    # [32, 48]). The loader groups training instances by their minimal
    # width (max description EOT + 1) and emits each batch at the
    # narrowest listed width that fits every instance in it — short-text
    # batches run the text tower (the step's dominant cost) at a fraction
    # of 77 tokens with ZERO truncation (over-long instances land in the
    # implicit full-width bucket; contrast context_cap, which truncates).
    # Exact by the causal+EOT argument (tests/test_context_cap.py). One jit
    # recompile per distinct width. [] = off.
    "length_buckets": [],
    # dedupe-encode repeated texts (data/dedupe.py): static GLOBAL caps on
    # the unique token rows per batch; 0 = off. The loader emits each
    # batch's unique rows (zero-padded to the cap) + an inverse index, the
    # step encodes only the uniques and gathers features back to the full
    # layout — EXACT for loss and gradients (tests/test_dedupe.py), encode
    # cost ∝ unique count. Big win on template corpora (descriptions repeat
    # across images) and on the multiattention role/label channels (drawn
    # from a small label vocabulary). A batch whose unique count exceeds the
    # cap falls back to the undeduped layout (one extra jit specialization)
    # — except under multi-host or stacked-batch dispatch, where shapes must
    # agree and an overflow raises instead (pick the cap from the logged
    # per-batch unique counts). Caps must divide by the process count; for
    # sharded (not replicated) unique encodes also by the dp degree.
    "dedupe_texts": 0,
    # same, for the bbox role-description and role-type-label channels
    # (multiattention); the label vocabulary is tiny, so 128–256 suffices
    "dedupe_sr_texts": 0,
    # reduced-precision optimizer moments: 'bfloat16' stores Adam's first
    # moment / SGD's momentum buffer in bf16 (engine/optim.py) — 25% (Adam)
    # or 50% (SGD) less optimizer-state HBM; Adam's second moment stays f32.
    # None/'float32' = full precision (the reference's behavior).
    "moment_dtype": None,
    "num_workers": 8,
    "prefetch": 2,
    # offline preprocessed-image cache dir (cache_images.py); None = live
    # decode. The CLIP_EVENT_IMAGE_CACHE env var overrides at runtime.
    "image_cache": None,
    # ship PRE-normalize uint8 images and CLIP-normalize on device
    # (models/clip.py::encode_image): bitwise-identical result, 4× less
    # host→device image traffic, and cache-hit loader reads become bare
    # memcpys (no host float pass). Main image channel only; the
    # object-crop channel keeps float32.
    "device_normalize": True,
    "max_objects": None,
    "max_entities": 16,
    "max_events": 8,
    "max_bboxes": 8,
    "multiattention_pooling": "mean",
    "steps_per_epoch_schedule": True,
    "steps_per_dispatch": 1,
    # gradient accumulation: K loader microbatches → ONE optimizer step
    # (grads K-averaged under lax.scan; peak memory = one microbatch's step).
    # Mutually exclusive with steps_per_dispatch>1.
    "grad_accum_steps": 1,
    # async checkpoint writes: snapshot to host synchronously, commit to disk
    # in orbax's background committer — the train loop overlaps the write of
    # a multi-GB checkpoint with the next steps (engine/checkpoint.py)
    "async_save": False,
    # step-granular checkpointing: save a rolling mid-epoch checkpoint every
    # N optimizer steps (0 = epoch-granular only, the reference's behavior);
    # resume re-enters the interrupted epoch at the saved batch offset
    "save_steps": 0,
    # hard stop after N optimizer steps (0 = run to max_epoch); a mid-epoch
    # checkpoint is saved at the stop point
    "max_steps": 0,
    # optional per-epoch zero-shot matching validation (tracks `perf`)
    "validate_every": 0,
    "val_image_caption_json": [],
    "val_image_dir": [],
}


class ConfigError(ValueError):
    pass


def validate_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Fill defaults and enforce the schema. Returns a new dict."""
    out = dict(_DEFAULTS)
    out.update(cfg)

    missing = [k for k in _REQUIRED if k not in out or out[k] is None]
    if missing:
        raise ConfigError(f"missing required config keys: {missing}")

    for key, choices in _CHOICES.items():
        if out.get(key) is not None and out[key] not in choices:
            raise ConfigError(f"{key}={out[key]!r} not in {choices}")

    if not isinstance(out["batch_size"], int) or out["batch_size"] <= 0:
        raise ConfigError("batch_size must be a positive int")
    if not isinstance(out["tp"], int) or out["tp"] < 1:
        raise ConfigError("tp must be a positive int (1 = data-parallel only)")
    if not isinstance(out["pp"], int) or out["pp"] < 1:
        raise ConfigError("pp must be a positive int (1 = no pipeline parallelism)")
    if out["pp"] > 1 and out["tp"] > 1:
        raise ConfigError(
            "pp>1 and tp>1 are mutually exclusive: pick ONE model-sharding "
            "axis (tp column/row-shards weights, pp layer-shards the stacks)"
        )
    if out["sp"] and out["tp"] <= 1:
        raise ConfigError(
            "sp (sequence parallelism) shards the residual stream over the "
            "tp axis — it requires tp > 1"
        )
    if not isinstance(out["pp_microbatches"], int) or out["pp_microbatches"] < 1:
        raise ConfigError("pp_microbatches must be a positive int")
    if not isinstance(out["dcn_dp"], int) or out["dcn_dp"] < 1:
        raise ConfigError("dcn_dp must be a positive int (1 = single slice)")
    if out["dcn_dp"] > 1 and out["pp"] > 1:
        raise ConfigError(
            "dcn_dp>1 with pp>1 is not supported: the GPipe ppermute "
            "schedule would rotate activations over DCN every microbatch — "
            "keep pipeline stages inside one slice"
        )
    cap = out["context_cap"]
    if not isinstance(cap, int) or cap < 0:
        raise ConfigError("context_cap must be an int ≥ 0 (0 = full context)")
    if cap:
        mcfg = out.get("model")
        # "model" may be a preset name (str) — every zoo preset is 77-wide
        ctx = mcfg.get("context_length", 77) if isinstance(mcfg, dict) else 77
        if not 2 <= cap <= ctx:
            raise ConfigError(
                f"context_cap must be in [2, context_length={ctx}] "
                "(SOT + EOT need two slots)"
            )
    buckets = out["length_buckets"]
    if not isinstance(buckets, (list, tuple)) or not all(
        isinstance(w, int) and not isinstance(w, bool) for w in buckets
    ):
        raise ConfigError("length_buckets must be a list of ints (widths)")
    if buckets:
        mcfg = out.get("model")
        ctx = mcfg.get("context_length", 77) if isinstance(mcfg, dict) else 77
        eff = out["context_cap"] or ctx
        if not all(2 <= w < eff for w in buckets):
            raise ConfigError(
                f"length_buckets widths must be in [2, {eff}) — the "
                "effective full width is an implicit final bucket"
            )
        if int(out.get("steps_per_dispatch", 1)) > 1 or out["grad_accum_steps"] > 1:
            raise ConfigError(
                "length_buckets needs one static width per dispatch: "
                "incompatible with steps_per_dispatch>1 / grad_accum_steps>1 "
                "(stacked batches must share a shape)"
            )
    for key in ("dedupe_texts", "dedupe_sr_texts"):
        v = out[key]
        if not isinstance(v, int) or isinstance(v, bool) or v < 0:
            raise ConfigError(f"{key} must be an int ≥ 0 (0 = off, else the unique-row cap)")
    if out["dedupe_sr_texts"] and not (out["load_sr"] or out["multiattention"]):
        raise ConfigError(
            "dedupe_sr_texts dedupes the bbox text channels: set load_sr=true "
            "or multiattention"
        )
    if not isinstance(out["zero"], bool):
        raise ConfigError("zero must be a bool (ZeRO-1 moment sharding)")
    if not isinstance(out["fsdp"], bool):
        raise ConfigError("fsdp must be a bool (ZeRO-3 param sharding)")
    if out["begin_epoch"] > out["max_epoch"]:
        raise ConfigError("begin_epoch must be ≤ max_epoch")
    if not isinstance(out["grad_accum_steps"], int) or out["grad_accum_steps"] < 1:
        raise ConfigError("grad_accum_steps must be a positive int")
    if out["grad_accum_steps"] > 1 and int(out.get("steps_per_dispatch", 1)) > 1:
        raise ConfigError(
            "grad_accum_steps>1 and steps_per_dispatch>1 are mutually "
            "exclusive (one accumulates microbatches into one optimizer "
            "step, the other fuses K optimizer steps into one dispatch)"
        )

    loss = out["constrastive_loss"]
    if loss == "bce" and out["constrastive_overbatch"]:
        raise ConfigError("set constrastive_overbatch=false for constrastive_loss='bce'")
    if loss == "kl" and not out["constrastive_overbatch"]:
        raise ConfigError("set constrastive_overbatch=true for constrastive_loss='kl'")

    if out["alignment"]:
        if not out["load_object"] or not out["load_ie"]:
            raise ConfigError(
                "alignment=true requires load_object=true and load_ie=true "
                "(OT aligns detected objects with text entities)"
            )
    if out["load_object"] and not out["object_ontology_file"]:
        raise ConfigError("load_object=true requires object_ontology_file")

    # multiattention: reference config uses a bool; we also accept the
    # contrast-mode strings. true → 'desc'.
    ma = out["multiattention"]
    if ma is True:
        out["multiattention"] = "desc"
    elif ma in (False, None):
        out["multiattention"] = None
    elif ma not in ("desc", "desc_type", "desc_type_text"):
        raise ConfigError(
            "multiattention must be bool or one of desc/desc_type/desc_type_text"
        )
    if out["multiattention"]:
        if not (out["load_sr"] or out["load_object"]):
            raise ConfigError(
                "multiattention needs a bbox channel: set load_sr=true or load_object=true"
            )
        # the local-attention loss consumes the bbox channel, which the
        # dataset emits under load_sr (built from the same detections
        # pickle load_object uses) — switch it on so multiattention +
        # load_object alone doesn't produce a bbox-less batch
        if not out["load_sr"]:
            if "load_sr" in cfg and cfg["load_sr"] in (False, 0):
                raise ConfigError(
                    "multiattention requires the bbox channel: load_sr was "
                    "explicitly false — remove it or set load_sr=true"
                )
            logging.getLogger(__name__).warning(
                "multiattention set: enabling load_sr=true (bbox channel)"
            )
            out["load_sr"] = True
    if out["multiattention_pooling"] not in ("mean", "attention"):
        raise ConfigError("multiattention_pooling must be 'mean' or 'attention'")
    return out


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as fh:
        return validate_config(json.load(fh))


def model_config(cfg: Dict[str, Any]):
    """Resolve the model spec: a preset name or an explicit dict."""
    from clip_event_tpu.models.clip import (
        RN50,
        RN50X4,
        RN101,
        VIT_B16,
        VIT_B32,
        VIT_L14,
        CLIPConfig,
    )

    presets = {
        "ViT-B/32": VIT_B32,
        "ViT-B/16": VIT_B16,
        "ViT-L/14": VIT_L14,
        "RN50": RN50,
        "RN101": RN101,
        "RN50x4": RN50X4,
    }
    spec = cfg.get("model", "ViT-B/32")
    if isinstance(spec, str):
        if spec not in presets:
            raise ConfigError(f"unknown model preset {spec!r}; options: {list(presets)}")
        return presets[spec]
    if isinstance(spec, dict):
        vl = spec.get("vision_layers")
        if isinstance(vl, list):
            spec = dict(spec, vision_layers=tuple(vl))
        return CLIPConfig(**spec)
    raise ConfigError("model must be a preset name or a CLIPConfig dict")
