"""Vision Transformer tower (reference `model_clip.py:214-263`), TPU-native.

The strided patch convolution is expressed as reshape + one large matmul
(mathematically identical for stride == kernel, and it maps straight onto the
MXU instead of relying on conv lowering). Input layout is NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from clip_event_tpu.models import layers as L


def patch_embed(images: jnp.ndarray, w: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] → [B, grid², width] via non-overlapping patch matmul.

    `w` is [patch*patch*3, width], flattened in (kh, kw, C) order — the
    converter reshapes the torch conv weight [width, 3, p, p] accordingly.
    """
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, patch * patch * C)
    return L.linear(x, w)


def vit_encode(
    params: dict,
    images: jnp.ndarray,
    patch_size: int,
    num_heads: int,
    use_grid: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    """ViT forward. Returns [B, E] (CLS-pooled) or [B, grid²+1, E] if use_grid."""
    x = images.astype(compute_dtype)
    x = patch_embed(x, params["patch_embed_w"], patch_size)  # [B, G², W]
    B = x.shape[0]
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(x.dtype), (B, 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)  # [B, G²+1, W]
    x = x + params["positional_embedding"].astype(x.dtype)
    x = L.layer_norm(x, params["ln_pre"])
    x = L.transformer(x, params["transformer"], num_heads, remat=remat)
    if use_grid:
        x = L.layer_norm(x, params["ln_post"])  # all tokens (grid path)
    else:
        x = L.layer_norm(x[:, 0, :], params["ln_post"])  # CLS only
    return L.linear(x, params["proj"])


def vit_act_stats(
    params: dict,
    images: jnp.ndarray,
    patch_size: int,
    num_heads: int,
    compute_dtype=jnp.float32,
) -> dict:
    """Dense-input abs-max stats for the ViT tower (static int8 activation
    calibration, `ops/quant.py`): mirrors `vit_encode` (CLS path) and
    returns {"patch_embed_w", "transformer": {...[L]...}, "proj"}."""
    x = images.astype(compute_dtype)
    B, H, W, C = x.shape
    gh, gw = H // patch_size, W // patch_size
    patches = x.reshape(B, gh, patch_size, gw, patch_size, C)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, gh * gw, patch_size * patch_size * C
    )
    stats = {"patch_embed_w": L._absmax(patches)}
    x = L.linear(patches, params["patch_embed_w"])
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(x.dtype), (B, 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(x.dtype)
    x = L.layer_norm(x, params["ln_pre"])
    x, stats["transformer"] = L.transformer_with_act_stats(
        x, params["transformer"], num_heads
    )
    x = L.layer_norm(x[:, 0, :], params["ln_post"])
    stats["proj"] = L._absmax(x)
    return stats


def init_vit(
    rng: jax.Array,
    input_resolution: int,
    patch_size: int,
    width: int,
    num_layers: int,
    output_dim: int,
) -> dict:
    keys = jax.random.split(rng, 4)
    grid = input_resolution // patch_size
    scale = width**-0.5
    return {
        "patch_embed_w": scale
        * jax.random.normal(keys[0], (patch_size * patch_size * 3, width)),
        "class_embedding": scale * jax.random.normal(keys[1], (width,)),
        "positional_embedding": scale
        * jax.random.normal(keys[2], (grid * grid + 1, width)),
        "ln_pre": L.init_layer_norm(width),
        "transformer": L.init_transformer(keys[3], num_layers, width),
        "ln_post": L.init_layer_norm(width),
        "proj": scale * jax.random.normal(keys[3], (width, output_dim)),
    }
