"""On-device (jit) image preprocessing: resize as two MXU matmuls.

For corpora whose images are pre-decoded at a canonical raw size (or on a
host too slow to resize), the whole CLIP transform runs on the TPU instead:

    uint8 [B, H0, W0, 3] → (M_v @ img @ M_hᵀ) → center crop → normalize

The resampling matrices carry the exact PIL-bicubic filter taps
(`data.transform.resize_matrix`), so outputs match the host path up to
PIL's intermediate uint8 rounding (≤1 count for ~99% of pixels; see
tests/test_transform.py::test_resize_matrix_matches_float_filter).

Shapes are static per (H0, W0, size), so each raw size compiles once; batch
them by raw size or letterbox on the host first.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from clip_event_tpu.data.transform import CLIP_MEAN, CLIP_STD, resize_matrix


def _shortside_dims(h: int, w: int, size: int):
    if (h <= w and h == size) or (w <= h and w == size):
        return h, w
    if h < w:
        return size, int(size * w / h)
    return int(size * h / w), size


@functools.partial(jax.jit, static_argnames=("size",))
def _preprocess_kernel(images, m_v, m_h, top, left, size):
    x = images.astype(jnp.float32)
    x = jnp.einsum("oh,bhwc->bowc", m_v, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("pw,bowc->bopc", m_h, x, preferred_element_type=jnp.float32)
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (x.shape[0], size, size, x.shape[3])
    )
    x = jnp.clip(x, 0.0, 255.0) / 255.0
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std


def preprocess_on_device(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """uint8/float [B, H0, W0, 3] (RGB) → float32 [B, size, size, 3] on the
    accelerator. Short-side resize + center crop + CLIP normalization."""
    B, H0, W0, C = images.shape
    out_h, out_w = _shortside_dims(H0, W0, size)
    m_v = jnp.asarray(resize_matrix(H0, out_h))
    m_h = jnp.asarray(resize_matrix(W0, out_w))
    # short-side resize guarantees out_h, out_w ≥ size (upscales small images)
    top = int(round((out_h - size) / 2.0))
    left = int(round((out_w - size) / 2.0))
    return _preprocess_kernel(images, m_v, m_h, top, left, size)
