"""CLIP dual encoder — functional JAX top level.

Capabilities match the reference `CLIP` module (`model_clip.py:266-552`):
ViT or ModifiedResNet vision tower, causal text transformer with EOT pooling,
learned logit_scale, over-batch (`mm`) vs per-instance (`bmm`) contrastive
logits, grid-token image encoding, and batched object/entity encoding for the
OT alignment path (`sim_entity`, `model_clip.py:531-552`).

Everything here is pure: `forward(params, cfg, images, tokens)`. Sharding is
applied by the caller (see `clip_event_tpu.parallel`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from clip_event_tpu.models import layers as L
from clip_event_tpu.models.resnet import init_resnet, resnet_encode
from clip_event_tpu.models.vit import init_vit, vit_encode


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int
    image_resolution: int
    vision_layers: Union[int, Tuple[int, int, int, int]]
    vision_width: int
    vision_patch_size: Optional[int]
    context_length: int
    vocab_size: int
    transformer_width: int
    transformer_heads: int
    transformer_layers: int

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)

    @property
    def vision_heads(self) -> int:
        if self.is_vit:
            return self.vision_width // 64
        return self.vision_width * 32 // 64

    @property
    def grid_size(self) -> int:
        assert self.is_vit
        return self.image_resolution // self.vision_patch_size


VIT_B32 = CLIPConfig(512, 224, 12, 768, 32, 77, 49408, 512, 8, 12)
VIT_B16 = CLIPConfig(512, 224, 12, 768, 16, 77, 49408, 512, 8, 12)
VIT_L14 = CLIPConfig(768, 224, 24, 1024, 14, 77, 49408, 768, 12, 12)
RN50 = CLIPConfig(1024, 224, (3, 4, 6, 3), 64, None, 77, 49408, 512, 8, 12)
RN101 = CLIPConfig(512, 224, (3, 4, 23, 3), 64, None, 77, 49408, 512, 8, 12)
RN50X4 = CLIPConfig(640, 288, (4, 6, 10, 6), 80, None, 77, 49408, 640, 10, 12)


def init_params(rng: jax.Array, cfg: CLIPConfig) -> dict:
    """Random init following the reference scheme (`model_clip.py:348-375`)."""
    k_vis, k_txt, k_tok, k_pos, k_proj = jax.random.split(rng, 5)
    if cfg.is_vit:
        visual = init_vit(
            k_vis,
            cfg.image_resolution,
            cfg.vision_patch_size,
            cfg.vision_width,
            cfg.vision_layers,
            cfg.embed_dim,
        )
    else:
        visual = init_resnet(
            k_vis,
            cfg.vision_layers,
            cfg.vision_width,
            cfg.image_resolution,
            cfg.embed_dim,
            cfg.vision_heads,
        )
    return {
        "visual": visual,
        "token_embedding": 0.02 * jax.random.normal(k_tok, (cfg.vocab_size, cfg.transformer_width)),
        "positional_embedding": 0.01 * jax.random.normal(k_pos, (cfg.context_length, cfg.transformer_width)),
        "text_transformer": L.init_transformer(k_txt, cfg.transformer_layers, cfg.transformer_width),
        "ln_final": L.init_layer_norm(cfg.transformer_width),
        "text_projection": cfg.transformer_width**-0.5
        * jax.random.normal(k_proj, (cfg.transformer_width, cfg.embed_dim)),
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), dtype=jnp.float32),
    }


def cast_params(params: dict, dtype=jnp.bfloat16) -> dict:
    """Cast matmul weights to a low-precision dtype while keeping the
    LayerNorm/BatchNorm parameters and logit_scale in float32 (reference
    `convert_weights`, `model_clip.py:554-575`, with bf16 instead of fp16 —
    the TPU-native low-precision format)."""

    def cast(path, leaf):
        keys = [getattr(k, "key", None) for k in path]
        name = keys[-1] or ""
        in_norm = any(isinstance(k, str) and (k.startswith("ln") or k.startswith("bn")) for k in keys)
        if in_norm or name in ("logit_scale",) or "mean" in name or "var" in name:
            return leaf
        return leaf.astype(dtype) if hasattr(leaf, "astype") else leaf

    return jax.tree_util.tree_map_with_path(cast, params)


def encode_image(
    params: dict,
    cfg: CLIPConfig,
    images: jnp.ndarray,
    use_grid: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    """[B, H, W, 3] → [B, E], or [B, grid²+1, E] when use_grid (ViT only).

    uint8 inputs are CLIP-normalized ON DEVICE (`(x/255 - mean)/std`, the
    exact ops of `data.transform.normalize` in fp32 — bitwise-identical
    result). Shipping uint8 instead of host-normalized float32 cuts
    host→device image traffic 4× and removes the loader's float pass (its
    measured throughput ceiling, PERFORMANCE.md "Offline image cache");
    the normalize itself fuses into the patch-embed convolution's prologue.
    """
    if images.dtype == jnp.uint8:
        from clip_event_tpu.data.transform import CLIP_MEAN, CLIP_STD

        images = (
            images.astype(jnp.float32) / 255.0 - CLIP_MEAN
        ) / CLIP_STD
    if cfg.is_vit:
        return vit_encode(
            params["visual"],
            images,
            cfg.vision_patch_size,
            cfg.vision_heads,
            use_grid=use_grid,
            compute_dtype=compute_dtype,
            remat=remat,
        )
    assert not use_grid, "grid features require the ViT tower"
    return resnet_encode(
        params["visual"], images, cfg.vision_layers, cfg.vision_heads, compute_dtype=compute_dtype
    )


def encode_text(
    params: dict,
    cfg: CLIPConfig,
    tokens: jnp.ndarray,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    """[B, S] int tokens → [B, E]; EOT pooling via argmax token id.

    S may be any length ≤ cfg.context_length (the positional embedding and
    causal mask are sliced/built to the tokens' actual width): because the
    transformer is causal and padding after EOT is zeros, the EOT-pooled
    output for a caption whose tokens fit in S is identical to running the
    full 77-token layout — so a static `context_cap` (config key) cuts the
    text tower's compute proportionally with NO semantic change for texts
    that fit (over-long ones truncate-keep-EOT at the cap, the same rule the
    reference applies at 77 — `clip.py:194-196`)."""
    seq = tokens.shape[-1]
    x = params["token_embedding"][tokens].astype(compute_dtype)
    x = x + params["positional_embedding"][:seq].astype(compute_dtype)
    bias = L.causal_mask(seq)
    x = L.transformer(x, params["text_transformer"], cfg.transformer_heads, bias, remat=remat)
    x = L.layer_norm(x, params["ln_final"])
    eot_idx = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    return L.linear(pooled, params["text_projection"])


def text_act_stats(
    params: dict, cfg: CLIPConfig, tokens: jnp.ndarray, compute_dtype=jnp.float32
) -> dict:
    """Dense-input abs-max stats for the text tower (static int8 activation
    calibration, `ops/quant.py`): mirrors `encode_text` and returns
    {"text_transformer": {...[L]...}, "text_projection"}."""
    seq = tokens.shape[-1]
    x = params["token_embedding"][tokens].astype(compute_dtype)
    x = x + params["positional_embedding"][:seq].astype(compute_dtype)
    bias = L.causal_mask(seq)
    x, tstats = L.transformer_with_act_stats(
        x, params["text_transformer"], cfg.transformer_heads, bias
    )
    x = L.layer_norm(x, params["ln_final"])
    eot_idx = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    return {"text_transformer": tstats, "text_projection": L._absmax(pooled)}


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def contrastive_logits(
    params: dict,
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    overbatch: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scaled cosine-sim logits from NORMALIZED features (the tail of the
    reference `CLIP.forward`, `model_clip.py:496-521`). Split out of
    `forward` so callers that build the text features differently — e.g. the
    dedupe-encode path, which encodes each batch's unique token rows once and
    gathers them back to the full [B·D, E] layout — share the identical
    logit/label semantics."""
    scale = jnp.exp(params["logit_scale"]).astype(image_features.dtype)
    logits_per_text = scale * jnp.dot(
        text_features, image_features.T, preferred_element_type=jnp.float32
    )
    if overbatch:
        logits_per_image = scale * jnp.dot(
            image_features, text_features.T, preferred_element_type=jnp.float32
        )
    else:
        B = image_features.shape[0]
        per_inst = text_features.reshape(B, -1, text_features.shape[-1])
        logits_per_image = scale * jnp.einsum(
            "be,bde->bd", image_features, per_inst, preferred_element_type=jnp.float32
        )
    return logits_per_image, logits_per_text


def forward(
    params: dict,
    cfg: CLIPConfig,
    images: jnp.ndarray,
    tokens: jnp.ndarray,
    overbatch: bool = True,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Contrastive logits (reference `CLIP.forward`, `model_clip.py:419-528`).

    images: [B, H, W, 3]; tokens: [B*D, context] (D descriptions per image).
    Returns (logits_per_image, logits_per_text):
      overbatch:  [B, B*D] and [B*D, B]
      instance:   [B, D]   and [B*D, B]  (text side is always over-batch)
    """
    image_features = l2_normalize(
        encode_image(params, cfg, images, compute_dtype=compute_dtype, remat=remat)
    )
    text_features = l2_normalize(
        encode_text(params, cfg, tokens, compute_dtype=compute_dtype, remat=remat)
    )
    return contrastive_logits(params, image_features, text_features, overbatch)


def sim_entity(
    params: dict,
    cfg: CLIPConfig,
    object_images: jnp.ndarray,
    entity_tokens: jnp.ndarray,
    compute_dtype=jnp.float32,
    remat: bool = False,
    chunks: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode object crops and entity mentions for the OT alignment loss.

    object_images: [B, N, H, W, 3]; entity_tokens: [B, M, context].
    Returns ([B, N, E], [B, M, E]) — unnormalized, as in the reference
    (`model_clip.py:531-552`; normalization happens inside the OT cost).

    At alignment scale the B·N object-crop tower is the largest activation
    consumer in the step (B=256 × 11 crops = 2,816 images — OOMs a 16 GB
    chip even under remat), so `remat` matters more here than in `forward`,
    and `chunks > 1` additionally runs the B·N/B·M encode batch in that many
    SEQUENTIAL `lax.map` slices: peak activation memory divides by `chunks`
    at zero extra FLOPs (config key `alignment_chunks`)."""
    B, N = object_images.shape[:2]
    M = entity_tokens.shape[1]

    def encode_chunked(encode_fn, x, node_axis_len):
        """x: [B, K, ...] → [B, K, E], encoding `chunks` sequential slices.

        Chunking splits the NODE axis (not the flattened B·K batch) so each
        chunk still spans the full data-parallel batch — under a dp mesh
        every chunk stays sharded over all devices instead of living on a
        device subset. Each chunk is wrapped in jax.checkpoint: without it
        the lax.map scan STACKS every chunk's layer residuals for the
        backward ([chunks, L, b, S, W] — measured 3.6 GB at B=256) and
        chunking saves no memory; with it only the chunk inputs are saved
        and each chunk's forward re-runs during its own backward slice.

        The effective count is the smallest divisor of the node axis ≥ the
        requested `chunks` (e.g. 11 object slots with chunks=4 → 11 slices
        of one node each) — falling back to NO chunking for a non-dividing
        axis would re-OOM exactly the configs chunking exists for."""
        c = 1
        if chunks > 1:
            c = next(
                d for d in range(min(chunks, node_axis_len), node_axis_len + 1)
                if node_axis_len % d == 0
            )
        k = node_axis_len // c
        if c == 1:
            flat = x.reshape((B * node_axis_len,) + x.shape[2:])
            return encode_fn(flat).reshape(B, node_axis_len, -1)

        def one(xc):  # [B, k, ...] → [B·k, E]
            return encode_fn(xc.reshape((B * k,) + xc.shape[2:]))

        stacked = jnp.moveaxis(x.reshape((B, c, k) + x.shape[2:]), 1, 0)
        out = jax.lax.map(jax.checkpoint(one), stacked)  # [c, B·k, E]
        out = out.reshape(c, B, k, -1)
        return jnp.moveaxis(out, 0, 1).reshape(B, node_axis_len, -1)

    img = encode_chunked(
        lambda x: encode_image(params, cfg, x, compute_dtype=compute_dtype, remat=remat),
        object_images, N,
    )
    txt = encode_chunked(
        lambda t: encode_text(params, cfg, t, compute_dtype=compute_dtype, remat=remat),
        entity_tokens, M,
    )
    return img, txt
