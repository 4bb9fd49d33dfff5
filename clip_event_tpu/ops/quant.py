"""Int8 (W8A8) quantized inference for the encode paths.

TPU v5e's MXU runs s8×s8→s32 matmuls at 2× the bf16 rate (394 vs 197
TOPS), and inference-time encoding (zero-shot evals, embedding export,
serving) tolerates quantization noise that training does not. This module
provides:

  * `QuantWeight` — a pytree-registered container {q: int8 [..., in, out],
    scale: f32 [..., out]} produced by symmetric per-output-channel weight
    quantization. Because it is a pytree, stacked [L, ...] transformer
    weights scan correctly under `lax.scan` and nest anywhere a plain
    weight array does.
  * `quantized_linear` — dynamic per-row activation quantization (abs-max
    over the reduction axis) + int8 dot_general with int32 accumulation +
    float rescale. Called automatically by `models.layers.linear` when the
    weight is a `QuantWeight`.
  * `quantize_params` — maps a CLIP param pytree to its quantized form:
    every dense matmul weight of both towers (attention qkv/out, MLP
    fc/proj, ViT patch-embed, and the final image/text projections) becomes
    a `QuantWeight`. LayerNorm/BatchNorm parameters, embeddings, biases,
    logit_scale, and ResNet convolutions stay in float (the RN tower's
    conv stack is left unquantized; its text tower and projections do
    quantize).

The reference has no quantization story (fp16 only, `model_clip.py:554`);
this is a TPU-native serving addition. Training always runs bf16/f32 —
`quantize_params` output is for inference entry points only (eval CLIs and
`embed.py` accept `"quantize": "int8"`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantWeight:
    """Symmetric per-output-channel int8 weight: w ≈ q * scale.

    `act_scale` (optional, float32 [...] scalar per weight — [L] on stacked
    transformer weights, sliced to a scalar under `lax.scan`): a STATIC
    per-tensor activation scale from offline calibration
    (`calibrate_act_scales`). When present, `quantized_linear` skips the
    dynamic per-row abs-max reduction — the quantize becomes a pure
    elementwise op XLA fuses into the producer (the reduction is what costs
    the dynamic path its end-to-end loss, PERFORMANCE.md "Int8 W8A8")."""

    q: jnp.ndarray      # int8, [..., in, out]
    scale: jnp.ndarray  # float32, [..., out]
    act_scale: Optional[jnp.ndarray] = None  # float32 [...], static per-tensor

    def tree_flatten(self):
        if self.act_scale is None:
            return (self.q, self.scale), False
        return (self.q, self.scale, self.act_scale), True

    @classmethod
    def tree_unflatten(cls, has_act, children):
        return cls(*children)

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.q.dtype


# jax.export serializes the exported function's in_tree — QuantWeight must
# be registered for PyTreeDef serialization so quantized serving bundles can
# be written (engine/export.py). Auxdata is the `has_act` bool.
try:
    from jax import export as _jex

    _jex.register_pytree_node_serialization(
        QuantWeight,
        serialized_name="clip_event_tpu.QuantWeight",
        serialize_auxdata=lambda has_act: bytes([int(bool(has_act))]),
        deserialize_auxdata=lambda b: bool(b[0]),
    )
except (ImportError, ValueError):  # ValueError: already registered (reload)
    pass


def quantize_weight(
    w: jnp.ndarray, act_absmax: Optional[jnp.ndarray] = None
) -> QuantWeight:
    """[..., in, out] float → QuantWeight (per-output-channel abs-max).
    `act_absmax`: calibrated input abs-max ([] or [L]) → static act_scale."""
    w32 = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=-2) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale[..., None, :]), -127, 127).astype(jnp.int8)
    act_scale = None
    if act_absmax is not None:
        act_scale = jnp.maximum(
            jnp.asarray(act_absmax, jnp.float32) / 127.0, 1e-12
        )
    return QuantWeight(q=q, scale=scale, act_scale=act_scale)


# GEMM backend for quantized_linear. "auto" == "xla": the fused VMEM-resident
# kernel (ops.quant_pallas) MEASURED 1.7–2.1× SLOWER than XLA's own
# quantize→int8-dot→rescale schedule at every CLIP shape and block size
# (PERFORMANCE.md "Int8 W8A8"), so it is opt-in ("pallas") for measurement
# only. NOTE: the jit/checkpoint trace caches do NOT key on this global —
# build fresh jitted functions after changing it (tools/bench_components.py
# bench_quant shows the pattern).
_GEMM_IMPL = "auto"


def set_gemm_impl(impl: str) -> None:
    global _GEMM_IMPL
    if impl not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown quant GEMM impl {impl!r}")
    _GEMM_IMPL = impl


def _pallas_enabled() -> bool:
    return _GEMM_IMPL == "pallas"


def quantized_linear(
    x: jnp.ndarray, w: QuantWeight, b: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """y = dequant(quant(x) @ w.q) (+ b). x: [..., in]; returns [..., out]
    in x.dtype. Activation scales are static per-tensor when `w.act_scale`
    is set (calibrated — elementwise quantize, no reduction), dynamic
    per-row abs-max otherwise."""
    if w.q.ndim == 2 and w.act_scale is None and _pallas_enabled():
        from clip_event_tpu.ops.quant_pallas import (
            quantized_matmul,
            quantized_matmul_supported,
        )

        k, n = w.q.shape
        if x.shape[-1] == k and quantized_matmul_supported(k, n):
            y = quantized_matmul(x.reshape(-1, k), w.q, w.scale, b)
            return y.reshape(*x.shape[:-1], n)
    x32 = x.astype(jnp.float32)
    if w.act_scale is not None:
        s_x = w.act_scale  # [] static — quantize is purely elementwise
    else:
        s_x = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
        s_x = jnp.maximum(s_x, 1e-12)
    x_q = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q,
        w.q,
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * w.scale)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


# Param-tree leaf names that hold dense matmul weights ([..., in, out]).
_DENSE_KEYS = frozenset(
    {"qkv_w", "out_w", "fc_w", "proj_w", "patch_embed_w", "proj", "text_projection"}
)


def quantize_params(params: Any, act_stats: Any = None, towers=None) -> Any:
    """CLIP param pytree → same tree with dense weights as QuantWeight.

    ResNet tower convolutions (`conv_w` etc. under `visual` for RN models)
    are intentionally left in float — only true [in, out] dense weights
    quantize. Biases and everything else pass through unchanged.

    `act_stats`: a calibration tree from `calibrate_act_scales` (same
    nesting as `params`, abs-max per dense input). Dense weights with a
    matching stat get a STATIC activation scale; the rest stay dynamic.

    `towers`: None (both) or a subset of {"visual", "text"} — measured
    guidance (PERFORMANCE.md "Int8 W8A8"): static-int8 WINS on the vision
    tower (+12–18%) but the text tower stays faster in bf16, so the
    serving sweet spot is `towers=("visual",)`."""

    _TOWER_KEYS = {
        "visual": ("visual",),
        "text": ("text_transformer", "text_projection", "token_embedding"),
    }
    allowed = None
    if towers is not None:
        unknown = set(towers) - set(_TOWER_KEYS)
        if unknown:
            raise ValueError(f"unknown towers {sorted(unknown)}; options: visual, text")
        allowed = {k for t in towers for k in _TOWER_KEYS[t]}

    def walk(node, stats, active):
        # `active` is None only at the param-tree root, where the tower
        # filter applies per top-level key; below that it propagates as-is.
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                act = (allowed is None or k in allowed) if active is None else active
                s = stats.get(k) if isinstance(stats, dict) else None
                if isinstance(v, (dict, list, tuple)):
                    out[k] = walk(v, s, act)
                elif act and k in _DENSE_KEYS and hasattr(v, "ndim") and v.ndim >= 2:
                    out[k] = quantize_weight(v, act_absmax=s)
                else:
                    out[k] = v
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(
                walk(v, None, True if active is None else active) for v in node
            )
        return node

    return walk(params, act_stats, None)


def calibrate_act_scales(
    params: Any,
    cfg: Any,
    image_batches,
    token_batches,
    compute_dtype=jnp.float32,
) -> Any:
    """Offline static-activation calibration: run the stats forwards
    (`models.vit.vit_act_stats`, `models.clip.text_act_stats`) over sample
    batches and return the element-wise max abs-max tree, shaped to plug
    into `quantize_params(params, act_stats=...)`.

    ViT + text towers only (the RN tower's conv stack doesn't quantize; its
    dense weights keep dynamic scales). The reference has no quantization
    story; static W8A8 is the TPU-serving addition that removes the dynamic
    row-reduction the measured dynamic path loses to (PERFORMANCE.md).

    Caveat (honest limits): accuracy is validated at full ViT-B/32 scale
    with RANDOM weights (cosine > 0.99 on batches disjoint from
    calibration, `tests/test_full_scale.py`). Real pretrained CLIP
    checkpoints are known to carry activation OUTLIERS that per-tensor
    static scales handle worse than random init does (the motivation for
    percentile clipping / SmoothQuant-style smoothing in the literature);
    re-validate cosine on real weights before serving them static — the
    dynamic path (`act_stats=None`) is the safe fallback, and
    real-weight validation is gated on network egress in this sandbox."""
    from clip_event_tpu.models.clip import text_act_stats
    from clip_event_tpu.models.vit import vit_act_stats

    stats = None
    if cfg.is_vit:
        vfn = jax.jit(
            lambda p, x: vit_act_stats(
                p, x, cfg.vision_patch_size, cfg.vision_heads,
                compute_dtype=compute_dtype,
            )
        )
        for imgs in image_batches:
            s = {"visual": jax.device_get(vfn(params["visual"], jnp.asarray(imgs)))}
            stats = s if stats is None else jax.tree.map(jnp.maximum, stats, s)
    tfn = jax.jit(
        lambda p, t: text_act_stats(p, cfg, t, compute_dtype=compute_dtype)
    )
    tstats = None
    for toks in token_batches:
        s = jax.device_get(tfn(params, jnp.asarray(toks)))
        tstats = s if tstats is None else jax.tree.map(jnp.maximum, tstats, s)
    if tstats is not None:
        stats = dict(stats or {}, **tstats)
    return stats


def is_quantized(params: Any) -> bool:
    return any(
        isinstance(leaf, QuantWeight)
        for leaf in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, QuantWeight)
        )
    )
