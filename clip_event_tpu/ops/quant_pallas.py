"""Fused W8A8 quantized GEMM Pallas kernel for the inference encode paths.

The XLA composition of the int8 path (`ops.quant.quantized_linear`: dynamic
per-row activation quant → s8×s8→s32 `dot_general` → float rescale) measures
SLOWER than bf16 at CLIP shapes even though the raw int8 MXU rate is 1.79×
the bf16 rate on this chip (PERFORMANCE.md "Int8 W8A8 inference"): XLA
materializes the int32 dot output in HBM ([M, N] i32 = 2× the bf16 bytes)
and the quantize pass costs an extra full read+write of the activation.

This kernel removes both. Per (row-block, col-block) grid step it

  1. reads the bf16/f32 activation block [TM, K] once,
  2. quantizes it in VMEM (abs-max per row / 127, round-half-even — same
     scheme as the XLA path; the row scale can differ in its last f32 ulp
     because the fused kernel may lower the /127 differently, which is one
     int8 rounding step on a handful of elements),
  3. runs the s8×s8 matmul with int32 accumulation on the MXU,
  4. rescales by (row_scale × weight_col_scale), adds the bias, and writes
     the [TM, TN] output directly in the activation dtype.

Nothing int32- or int8-shaped ever touches HBM.

**Measured conclusion (round 3): the fusion LOSES.** Isolated-GEMM chained
timing at the hot CLIP shapes on v5e, 500 chained iterations
(`tools/bench_components.py quantgemm`; PERFORMANCE.md "Int8 W8A8"):

  | shape | bf16 | int8-XLA | this kernel (best block) |
  |---|---|---|---|
  | [12800,768]x[768,2304] | 0.341 ms | **0.289 ms** | 0.497 ms |
  | [12800,768]x[768,3072] | 0.381 ms | **0.325 ms** | 0.544 ms |
  | [19712,512]x[512,1536] | 0.231 ms | **0.219 ms** | 0.452 ms |

The premise (XLA's int32 HBM round trip dominates) was wrong: XLA fuses
the quantize into the producer and the rescale into the consumer, and its
int8 composition beats bf16 at EVERY hot shape in isolation (to +17%).
The kernel is 1.7–2.1× slower than the XLA composition at every block
size swept (TM 512–1024, TN 256–512) because the per-row-block VPU
quantize serializes against the MXU dot, while XLA overlaps them across
ops. End-to-end the int8 encode path still loses to bf16 (0.69–0.95×) for
non-GEMM reasons, so `quantize: int8` remains a memory/footprint option,
not a speed one. The kernel stays opt-in (`quant.set_gemm_impl("pallas")`)
as the measurement vehicle; `auto` uses the XLA composition.

Inference only — no VJP is defined, matching the training-stays-bf16
contract (reference has no quantization story at all, `model_clip.py:554`
casts to fp16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_event_tpu.ops.pallas_util import interpret_off_tpu as _interpret_here
from clip_event_tpu.ops.pallas_util import round_up as _round_up

_DOT2D = (((1,), (0,)), ((), ()))  # [M, K] · [K, N] → [M, N]


def _kernel(x_ref, q_ref, s_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)  # [TM, K]
    row = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x / row), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, q_ref[...], _DOT2D, preferred_element_type=jnp.int32)
    # (row ⊗ s) first, then one multiply — the same association the XLA
    # path uses.
    o_ref[...] = (acc.astype(jnp.float32) * (row * s_ref[...]) + b_ref[...]).astype(
        o_ref.dtype
    )


def _block_bytes(tm: int, tn: int, k: int) -> int:
    """VMEM working set: double-buffered io blocks (x in bf16-ish, q int8,
    out) + the f32 upcast of x, the int8 quantized copy, and the int32
    accumulator."""
    io = 2 * (2 * tm * k + k * tn + 2 * tm * tn + 4 * 2 * tn)
    scratch = 4 * tm * k + tm * k + 4 * tm * tn
    return io + scratch


_VMEM_BUDGET = 10 * 1024 * 1024


def quantized_matmul_supported(k: int, n: int) -> bool:
    """Lane constraints: both the reduction dim (x lanes / q sublanes) and
    the output dim must be 128-multiples; anything else (e.g. ViT-L/14's
    588-wide patch embed) falls back to the XLA composition."""
    return k % 128 == 0 and n % 128 == 0 and _block_bytes(32, 128, k) < _VMEM_BUDGET


def _pick_blocks(m: int, k: int, n: int) -> tuple[int, int]:
    # int8 min tile is (32, 128): TM must stay a 32-multiple.
    for tm in (512, 256, 128, 64, 32):
        for tn in (512, 256, 128):
            if n % tn:
                continue
            if _block_bytes(tm, tn, k) < _VMEM_BUDGET:
                return tm, tn
    raise ValueError(f"no VMEM-feasible block for K={k}, N={n}")


def quantized_matmul(x, q, scale, bias=None, *, interpret: bool = False):
    """y = dequant(rowquant(x) @ q) (+ bias). x: [M, K] float; q: int8
    [K, N]; scale: f32 [N] per-output-channel weight scale. Returns [M, N]
    in x.dtype. Numerics match the XLA path in `ops.quant.quantized_linear`
    up to one int8 rounding step (see module docstring)."""
    m, k = x.shape
    kq, n = q.shape
    assert k == kq, (k, kq)
    tm, tn = _pick_blocks(m, k, n)
    mp = _round_up(m, tm)
    if mp != m:
        x = jnp.pad(x, [(0, mp - m), (0, 0)])
    s2 = scale.astype(jnp.float32).reshape(1, n)
    b2 = (
        jnp.zeros((1, n), jnp.float32)
        if bias is None
        else bias.astype(jnp.float32).reshape(1, n)
    )
    out = pl.pallas_call(
        _kernel,
        grid=(mp // tm, n // tn),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=_interpret_here(interpret),
    )(x, q, s2, b2)
    return out[:m]
