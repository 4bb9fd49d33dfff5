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
    """Symmetric per-output-channel int8 weight: w ≈ q * scale."""

    q: jnp.ndarray      # int8, [..., in, out]
    scale: jnp.ndarray  # float32, [..., out]

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.q.dtype


def quantize_weight(w: jnp.ndarray) -> QuantWeight:
    """[..., in, out] float → QuantWeight (per-output-channel abs-max)."""
    w32 = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=-2) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return QuantWeight(q=q, scale=scale)


# GEMM backend for quantized_linear. "auto" == "xla": the fused VMEM-resident
# kernel (ops.quant_pallas) MEASURED ~40% SLOWER than XLA's own
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
    """y = dequant(quant(x) @ w.q) (+ b), with dynamic per-row activation
    scales. x: [..., in]; returns [..., out] in x.dtype."""
    if w.q.ndim == 2 and _pallas_enabled():
        from clip_event_tpu.ops.quant_pallas import (
            quantized_matmul,
            quantized_matmul_supported,
        )

        k, n = w.q.shape
        if x.shape[-1] == k and quantized_matmul_supported(k, n):
            y = quantized_matmul(x.reshape(-1, k), w.q, w.scale, b)
            return y.reshape(*x.shape[:-1], n)
    x32 = x.astype(jnp.float32)
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


def quantize_params(params: Any) -> Any:
    """CLIP param pytree → same tree with dense weights as QuantWeight.

    ResNet tower convolutions (`conv_w` etc. under `visual` for RN models)
    are intentionally left in float — only true [in, out] dense weights
    quantize. Biases and everything else pass through unchanged."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if isinstance(v, (dict, list, tuple)):
                    out[k] = walk(v)
                elif k in _DENSE_KEYS and hasattr(v, "ndim") and v.ndim >= 2:
                    out[k] = quantize_weight(v)
                else:
                    out[k] = v
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def is_quantized(params: Any) -> bool:
    return any(
        isinstance(leaf, QuantWeight)
        for leaf in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, QuantWeight)
        )
    )
