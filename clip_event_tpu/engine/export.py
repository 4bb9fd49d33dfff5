"""AOT serving export: trained encoders as portable StableHLO artifacts.

TPU-native replacement for the role the reference's TorchScript JIT archive
plays at inference time (`clip.py:77-165` loads a torchscript model so
serving needs no model-building code): `jax.export` serializes the jitted,
batch-polymorphic `encode_image`/`encode_text` functions to versioned
StableHLO. A server deserializes and calls them on any JAX backend — or a
non-Python runtime consumes the module via PJRT — without importing the
model code.

Bundle layout (`save_serving_bundle`):

    <dir>/image_encode.stablehlo   serialized Exported, args (params, images)
    <dir>/text_encode.stablehlo    serialized Exported, args (params, tokens)
    <dir>/params.npz               weights in the flat OpenAI state_dict
                                   naming (models/convert.py) — swappable
                                   without re-exporting the module
    <dir>/meta.json                CLIPConfig + dtype + export metadata

Weights stay OUT of the StableHLO module (passed as call arguments): baking
a ViT's ~600 MB of constants into the module would bloat the artifact and
freeze the weights; the flat npz keeps them independently updatable and
reference-interoperable.

The export always uses the portable XLA attention path (the Pallas kernel
lowers to a TPU-only custom call that the export safety checks reject);
batch is a symbolic dimension so one artifact serves every batch size.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import asdict
from typing import Any, Callable, Tuple

import numpy as np

log = logging.getLogger(__name__)

IMAGE_MODULE = "image_encode.stablehlo"
TEXT_MODULE = "text_encode.stablehlo"
PARAMS_FILE = "params.npz"
QUANT_PARAMS_FILE = "params_int8.npz"
META_FILE = "meta.json"


def _is_quant_leaf(x) -> bool:
    from clip_event_tpu.ops.quant import QuantWeight

    return isinstance(x, QuantWeight)


def _save_quant_params(path: str, qparams) -> None:
    """Quantized pytree → npz: leaves in `tree_flatten(is_leaf=QuantWeight)`
    order; QuantWeight children under `<i>.q/.scale/.act`, float leaves
    under `<i>.w` (int8 weights are 4× smaller than the float npz — the
    serving footprint win that motivates the quantized bundle)."""
    import jax

    leaves, _ = jax.tree.flatten(qparams, is_leaf=_is_quant_leaf)
    blob = {}
    for i, leaf in enumerate(leaves):
        if _is_quant_leaf(leaf):
            blob[f"{i}.q"] = np.asarray(leaf.q)
            blob[f"{i}.scale"] = np.asarray(leaf.scale)
            if leaf.act_scale is not None:
                blob[f"{i}.act"] = np.asarray(leaf.act_scale)
        else:
            blob[f"{i}.w"] = np.asarray(leaf)
    np.savez(path, **blob)


def _tree_manifest(qparams):
    """JSON-serializable mirror of the quantized pytree: the same nested
    dicts with each leaf replaced by its kind ("quant" | "array"). Stored in
    meta.json so `load_serving_bundle` can rebuild the treedef WITHOUT the
    model package (params are plain nested dicts, so the manifest round-trips
    through JSON; jax flattens dicts in sorted-key order on both sides)."""
    import jax

    return jax.tree.map(
        lambda leaf: "quant" if _is_quant_leaf(leaf) else "array",
        qparams,
        is_leaf=_is_quant_leaf,
    )


def _load_quant_params_from_manifest(path: str, manifest):
    """Rebuild the quantized pytree from the meta.json manifest + npz —
    no model code needed (the treedef comes from the manifest itself)."""
    import jax

    from clip_event_tpu.ops.quant import QuantWeight

    kinds, treedef = jax.tree.flatten(manifest)
    with np.load(path) as npz:
        new = []
        for i, kind in enumerate(kinds):
            if kind == "quant":
                act = npz[f"{i}.act"] if f"{i}.act" in npz.files else None
                new.append(
                    QuantWeight(
                        q=npz[f"{i}.q"], scale=npz[f"{i}.scale"], act_scale=act
                    )
                )
            else:
                new.append(npz[f"{i}.w"])
    return jax.tree.unflatten(treedef, new)


def _load_quant_params(path: str, cfg, towers):
    """Legacy fallback (bundles written before the meta.json manifest):
    rebuild the quantized pytree from a random-init skeleton of the SAME
    model config quantized the same way (init and quantization are
    structure-deterministic); every leaf value comes from the npz. Requires
    the model package — new bundles carry the manifest instead."""
    import jax

    from clip_event_tpu.models import init_params
    from clip_event_tpu.ops.quant import QuantWeight, quantize_params

    skeleton = quantize_params(
        init_params(jax.random.PRNGKey(0), cfg),
        towers=tuple(towers) if towers else None,
    )
    leaves, treedef = jax.tree.flatten(skeleton, is_leaf=_is_quant_leaf)
    with np.load(path) as npz:
        new = []
        for i, leaf in enumerate(leaves):
            if _is_quant_leaf(leaf):
                act = npz[f"{i}.act"] if f"{i}.act" in npz.files else None
                new.append(
                    QuantWeight(
                        q=npz[f"{i}.q"], scale=npz[f"{i}.scale"], act_scale=act
                    )
                )
            else:
                new.append(npz[f"{i}.w"])
    return jax.tree.unflatten(treedef, new)


def _encoder_fns(cfg, compute_dtype) -> Tuple[Callable, Callable]:
    """The serving functions: L2-normalized features, params as ARGUMENTS."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.models import clip as clip_model

    def image_encode(params, images):
        return clip_model.l2_normalize(
            clip_model.encode_image(params, cfg, images, compute_dtype=compute_dtype)
        ).astype(jnp.float32)

    def text_encode(params, tokens):
        return clip_model.l2_normalize(
            clip_model.encode_text(params, cfg, tokens, compute_dtype=compute_dtype)
        ).astype(jnp.float32)

    return jax.jit(image_encode), jax.jit(text_encode)


def export_encoders(params, cfg, compute_dtype=None, platforms=("cpu", "tpu"),
                    context=None):
    """Returns (image Exported, text Exported) with a symbolic batch dim.

    `platforms` defaults to cpu+tpu so the one artifact runs under a CPU
    smoke harness and on the serving TPU alike.

    `context`: export the text encoder at this static token width instead of
    the model's 77 — the serving analogue of the `context_cap` training key
    (exact for texts whose EOT fits; text encode time drops ~linearly, a
    measured 1.5-1.8x at 48/32 on v5e — PERFORMANCE.md "Static context
    cap"). The server tokenizes with `tokenize(texts, context)`.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    from clip_event_tpu.models import layers as L

    if compute_dtype is None:
        compute_dtype = jnp.float32
    image_fn, text_fn = _encoder_fns(cfg, compute_dtype)

    (b,) = jex.symbolic_shape("b")
    res = cfg.image_resolution
    param_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), params
    )
    image_spec = jax.ShapeDtypeStruct((b, res, res, 3), jnp.float32)
    seq = int(context) if context else cfg.context_length
    if not 2 <= seq <= cfg.context_length:
        raise ValueError(
            f"context must be in [2, {cfg.context_length}] (got {context})"
        )
    token_spec = jax.ShapeDtypeStruct((b, seq), jnp.int32)

    # the Pallas kernels are TPU-only custom calls — force the portable XLA
    # attention + LN paths for the exported module, then restore the
    # session's impls
    prev_impl, prev_mesh = L._ATTENTION_IMPL, L._ATTENTION_MESH
    prev_ln, prev_ln_mesh = L._LN_IMPL, L._LN_MESH
    L.set_attention_impl("xla")
    L.set_ln_impl("xla")
    try:
        image_exp = jex.export(image_fn, platforms=list(platforms))(
            param_specs, image_spec
        )
        text_exp = jex.export(text_fn, platforms=list(platforms))(
            param_specs, token_spec
        )
    finally:
        L.set_attention_impl(prev_impl, prev_mesh)
        L.set_ln_impl(prev_ln, prev_ln_mesh)
    return image_exp, text_exp


def save_serving_bundle(
    out_dir: str, params, cfg, compute_dtype=None, platforms=("cpu", "tpu"),
    context=None, quantize=None, quantize_towers=None, act_stats=None,
) -> str:
    """Export both encoders + weights + metadata into `out_dir`.

    `quantize`: None (float bundle) | "int8" (dynamic activation scales) |
    "int8_static" (pass `act_stats` from `ops.quant.calibrate_act_scales`).
    A quantized bundle's StableHLO modules are traced against the quantized
    pytree and the weights ship as `params_int8.npz` (4× smaller) — this is
    how the measured int8 serving win (ViT-L/14 vision 1.44–1.50×,
    PERFORMANCE.md) reaches the AOT artifact a fleet actually deploys.
    `quantize_towers`: e.g. ("visual",) — the measured ViT-B sweet spot."""
    import jax

    from clip_event_tpu.models.convert import state_dict_from_params

    os.makedirs(out_dir, exist_ok=True)
    if quantize:
        if quantize not in ("int8", "int8_static"):
            raise ValueError(f"quantize={quantize!r}: 'int8' or 'int8_static'")
        if quantize == "int8_static" and act_stats is None:
            raise ValueError(
                "quantize='int8_static' needs act_stats "
                "(ops.quant.calibrate_act_scales)"
            )
        from clip_event_tpu.ops.quant import quantize_params

        export_params = quantize_params(
            params,
            act_stats=act_stats if quantize == "int8_static" else None,
            towers=tuple(quantize_towers) if quantize_towers else None,
        )
    else:
        export_params = params

    image_exp, text_exp = export_encoders(
        export_params, cfg, compute_dtype=compute_dtype, platforms=platforms,
        context=context,
    )
    with open(os.path.join(out_dir, IMAGE_MODULE), "wb") as fh:
        fh.write(image_exp.serialize())
    with open(os.path.join(out_dir, TEXT_MODULE), "wb") as fh:
        fh.write(text_exp.serialize())

    if quantize:
        _save_quant_params(
            os.path.join(out_dir, QUANT_PARAMS_FILE), export_params
        )
    else:
        sd = state_dict_from_params(jax.tree.map(np.asarray, params), cfg)
        np.savez(os.path.join(out_dir, PARAMS_FILE), **sd)

    meta = {
        "model_config": asdict(cfg),
        "compute_dtype": str(np.dtype(compute_dtype).name) if compute_dtype else "float32",
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "embed_dim": cfg.embed_dim,
        "image_resolution": cfg.image_resolution,
        # the width the TEXT module was exported at — the server must
        # tokenize to exactly this many tokens (may be < the model's 77)
        "context_length": int(context) if context else cfg.context_length,
        "quantize": quantize,
        "quantize_towers": list(quantize_towers) if quantize_towers else None,
        # treedef manifest: lets load_serving_bundle rebuild a quantized
        # pytree without importing the model package (see _tree_manifest)
        "params_tree": _tree_manifest(export_params) if quantize else None,
    }
    with open(os.path.join(out_dir, META_FILE), "w") as fh:
        json.dump(meta, fh, indent=2)
    log.info("=> serving bundle written to %s%s", out_dir,
             f" (quantize={quantize})" if quantize else "")
    return out_dir


class ServingModel:
    """A deserialized bundle: `encode_image` / `encode_text` at any batch."""

    def __init__(self, image_exp, text_exp, params, meta: dict):
        self._image = image_exp
        self._text = text_exp
        self.params = params
        self.meta = meta

    def encode_image(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._image.call(self.params, np.asarray(images, np.float32)))

    def encode_text(self, tokens: np.ndarray) -> np.ndarray:
        return np.asarray(self._text.call(self.params, np.asarray(tokens, np.int32)))


def load_serving_bundle(bundle_dir: str) -> ServingModel:
    """Deserialize a bundle; needs only jax + the weight converter (no model
    code is traced — the StableHLO module IS the model). Quantized bundles
    rebuild their pytree from the meta.json `params_tree` manifest (no model
    package at all); only pre-manifest quantized bundles fall back to the
    init_params skeleton."""
    from jax import export as jex

    from clip_event_tpu.models.clip import CLIPConfig
    from clip_event_tpu.models.convert import params_from_state_dict

    with open(os.path.join(bundle_dir, IMAGE_MODULE), "rb") as fh:
        image_exp = jex.deserialize(fh.read())
    with open(os.path.join(bundle_dir, TEXT_MODULE), "rb") as fh:
        text_exp = jex.deserialize(fh.read())
    meta = json.load(open(os.path.join(bundle_dir, META_FILE)))
    mcfg = meta.get("model_config")
    cfg = CLIPConfig(**{**mcfg, "vision_layers": _vision_layers(mcfg)}) if mcfg else None
    if meta.get("quantize"):
        qpath = os.path.join(bundle_dir, QUANT_PARAMS_FILE)
        if meta.get("params_tree") is not None:
            params = _load_quant_params_from_manifest(
                qpath, meta["params_tree"]
            )
        else:  # pre-manifest bundle: needs the model package for the treedef
            params = _load_quant_params(qpath, cfg, meta.get("quantize_towers"))
    else:
        with np.load(os.path.join(bundle_dir, PARAMS_FILE)) as npz:
            sd = {k: npz[k] for k in npz.files}
        params, _ = params_from_state_dict(sd, cfg)
    return ServingModel(image_exp, text_exp, params, meta)


def _vision_layers(mcfg: dict):
    vl = mcfg["vision_layers"]
    return tuple(vl) if isinstance(vl, list) else vl
