"""ModifiedResNet vision tower (reference `model_clip.py:14-154`), NHWC/TPU.

Differences from a torchvision ResNet, faithfully reproduced: 3-conv stem
with avg-pool, anti-aliased strided convs (avg-pool before any stride-2
conv), and a QKV attention pool instead of global average pooling.

TPU-native choices: NHWC layout throughout, frozen (inference-mode)
BatchNorm folded into scale/offset — CLIP fine-tuning starts from pretrained
running stats, and the reference's SyncBN path is config-gated off by
default. The attention pool computes only the CLS query row (mathematically
identical to the reference's full attention followed by `x[0]`,
`model_clip.py:94`).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from clip_event_tpu.models import layers as L


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """NHWC conv; weight layout HWIO.

    No `preferred_element_type` here: with bf16 operands its transpose rule
    feeds the f32 cotangent into a bf16-kernel conv and fails; the MXU
    accumulates in f32 regardless, so bf16-in/bf16-out loses nothing.
    """
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# BN statistics mode: "frozen" (running stats — CLIP fine-tuning default) or
# "batch" (statistics of the current global batch; under a dp-sharded pjit
# the mean/var reductions are global, i.e. SyncBatchNorm semantics for free —
# the reference needed torch SyncBatchNorm + NCCL, train.py:219-220).
_BN_MODE = "frozen"


def set_bn_mode(mode: str) -> None:
    global _BN_MODE
    if mode not in ("frozen", "batch"):
        raise ValueError("bn mode must be 'frozen' or 'batch'")
    _BN_MODE = mode


def batch_norm(x: jnp.ndarray, params: dict, eps: float = 1e-5) -> jnp.ndarray:
    """BN over NHWC channels; statistics per `_BN_MODE`."""
    if _BN_MODE == "batch":
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=(0, 1, 2))
        var = x32.var(axis=(0, 1, 2))
    else:
        mean = params["mean"].astype(jnp.float32)
        var = params["var"].astype(jnp.float32)
    inv = jax.lax.rsqrt(var + eps)
    scale = (params["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    offset = (
        params["bias"].astype(jnp.float32)
        - mean * params["scale"].astype(jnp.float32) * inv
    ).astype(x.dtype)
    return x * scale + offset


def avg_pool(x: jnp.ndarray, window: int) -> jnp.ndarray:
    if window == 1:
        return x
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, window, window, 1),
        padding="VALID",
    ) / float(window * window)


def bottleneck(x: jnp.ndarray, params: dict, stride: int) -> jnp.ndarray:
    out = jax.nn.relu(batch_norm(conv2d(x, params["conv1_w"]), params["bn1"]))
    out = jax.nn.relu(batch_norm(conv2d(out, params["conv2_w"], padding=1), params["bn2"]))
    out = avg_pool(out, stride)
    out = batch_norm(conv2d(out, params["conv3_w"]), params["bn3"])

    if "downsample" in params:
        identity = avg_pool(x, stride)
        identity = batch_norm(
            conv2d(identity, params["downsample"]["conv_w"]), params["downsample"]["bn"]
        )
    else:
        identity = x
    return jax.nn.relu(out + identity)


def attention_pool(x: jnp.ndarray, params: dict, num_heads: int) -> jnp.ndarray:
    """QKV pooling head. x: [B, H, W, C] → [B, out_dim].

    Key/value cover mean+grid tokens with positional embedding; only the mean
    token's query row is computed (equivalent to reference `x[0]`).
    """
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C)
    tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)
    tokens = tokens + params["positional_embedding"].astype(tokens.dtype)

    q = L.linear(tokens[:, 0], params["q_w"], params["q_b"])  # [B, C]
    k = L.linear(tokens, params["k_w"], params["k_b"])  # [B, S, C]
    v = L.linear(tokens, params["v_w"], params["v_b"])

    head_dim = C // num_heads
    S = tokens.shape[1]
    # single-query attention with heads kept packed in the channel axis:
    # reshapes are layout-free, no [B,S,H,D] physical transposes
    qh = q.reshape(B, num_heads, head_dim)
    kh = k.reshape(B, S, num_heads, head_dim)
    vh = v.reshape(B, S, num_heads, head_dim)
    logits = jnp.einsum(
        "bhd,bshd->bhs", qh * head_dim**-0.5, kh, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum(
        "bhs,bshd->bhd", weights, vh, preferred_element_type=jnp.float32
    ).astype(x.dtype).reshape(B, C)
    return L.linear(out, params["c_w"], params["c_b"])


def resnet_encode(
    params: dict,
    images: jnp.ndarray,
    layers_cfg: tuple,
    num_heads: int,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """ModifiedResNet forward: [B, H, W, 3] → [B, E]."""
    x = images.astype(compute_dtype)
    # 3-conv stem
    x = jax.nn.relu(batch_norm(conv2d(x, params["stem"]["conv1_w"], stride=2, padding=1), params["stem"]["bn1"]))
    x = jax.nn.relu(batch_norm(conv2d(x, params["stem"]["conv2_w"], padding=1), params["stem"]["bn2"]))
    x = jax.nn.relu(batch_norm(conv2d(x, params["stem"]["conv3_w"], padding=1), params["stem"]["bn3"]))
    x = avg_pool(x, 2)

    for stage_idx, num_blocks in enumerate(layers_cfg):
        stage = params[f"layer{stage_idx + 1}"]
        stride = 1 if stage_idx == 0 else 2
        for block_idx in range(num_blocks):
            x = bottleneck(x, stage[block_idx], stride if block_idx == 0 else 1)

    return attention_pool(x, params["attnpool"], num_heads)


# ----------------------------------------------------------------- init


def _init_bn(ch: int, zero_scale: bool = False) -> dict:
    return {
        "scale": jnp.zeros((ch,)) if zero_scale else jnp.ones((ch,)),
        "bias": jnp.zeros((ch,)),
        "mean": jnp.zeros((ch,)),
        "var": jnp.ones((ch,)),
    }


def _init_conv(rng, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return jax.random.normal(rng, (kh, kw, cin, cout)) * (2.0 / fan_in) ** 0.5


def init_resnet(
    rng: jax.Array,
    layers_cfg: tuple,
    width: int,
    input_resolution: int,
    output_dim: int,
    num_heads: int,
) -> dict:
    """Random init matching reference structure (incl. zero-init bn3 scale)."""
    keys = iter(jax.random.split(rng, 256))
    params = {
        "stem": {
            "conv1_w": _init_conv(next(keys), 3, 3, 3, width // 2),
            "bn1": _init_bn(width // 2),
            "conv2_w": _init_conv(next(keys), 3, 3, width // 2, width // 2),
            "bn2": _init_bn(width // 2),
            "conv3_w": _init_conv(next(keys), 3, 3, width // 2, width),
            "bn3": _init_bn(width),
        }
    }
    inplanes = width
    for stage_idx, num_blocks in enumerate(layers_cfg):
        planes = width * (2**stage_idx)
        stride = 1 if stage_idx == 0 else 2
        blocks = []
        for block_idx in range(num_blocks):
            block = {
                "conv1_w": _init_conv(next(keys), 1, 1, inplanes, planes),
                "bn1": _init_bn(planes),
                "conv2_w": _init_conv(next(keys), 3, 3, planes, planes),
                "bn2": _init_bn(planes),
                "conv3_w": _init_conv(next(keys), 1, 1, planes, planes * 4),
                "bn3": _init_bn(planes * 4, zero_scale=True),
            }
            s = stride if block_idx == 0 else 1
            if s > 1 or inplanes != planes * 4:
                block["downsample"] = {
                    "conv_w": _init_conv(next(keys), 1, 1, inplanes, planes * 4),
                    "bn": _init_bn(planes * 4),
                }
            blocks.append(block)
            inplanes = planes * 4
        params[f"layer{stage_idx + 1}"] = blocks

    embed_dim = width * 32
    spatial = input_resolution // 32
    std = embed_dim**-0.5
    params["attnpool"] = {
        "positional_embedding": jax.random.normal(next(keys), (spatial * spatial + 1, embed_dim)) * std,
        "q_w": std * jax.random.normal(next(keys), (embed_dim, embed_dim)),
        "q_b": jnp.zeros((embed_dim,)),
        "k_w": std * jax.random.normal(next(keys), (embed_dim, embed_dim)),
        "k_b": jnp.zeros((embed_dim,)),
        "v_w": std * jax.random.normal(next(keys), (embed_dim, embed_dim)),
        "v_b": jnp.zeros((embed_dim,)),
        "c_w": std * jax.random.normal(next(keys), (embed_dim, output_dim)),
        "c_b": jnp.zeros((output_dim,)),
    }
    return params
