"""Fused multi-head attention Pallas kernel for CLIP's short sequences.

CLIP's towers run tiny sequences (text 77, ViT-B/32 grid 50, ViT-L/14 257),
so the whole (S × S) score matrix of a head-block fits in VMEM — no KV
streaming needed. The kernel fuses QKᵀ → bias → softmax → ·V into one pass
(XLA otherwise round-trips the logits and probabilities through HBM), and
the custom VJP recomputes the probabilities in VMEM instead of saving them.

Layout: [BH, S, D] with a grid over blocks of BH (batch·heads); S and D pad
to the 128-lane tile inside the wrapper, with padded key columns masked by
an additive -inf bias (padded query rows compute garbage that is sliced
away; their gradients are zeroed by construction of the cotangent).

Used by `models.layers.multi_head_attention(..., use_pallas=True)`; numerics
match the jnp path at f32 tolerance (see tests/test_attention_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# batched dot_general helpers over the leading block-of-heads axis
_QKT = (((2,), (2,)), ((0,), (0,)))  # [T,S,D]·[T,S,D] → [T,S,S]
_PV = (((2,), (1,)), ((0,), (0,)))  # [T,S,S]·[T,S,D] → [T,S,D]
_PT_DO = (((1,), (1,)), ((0,), (0,)))  # [T,S,S]ᵀ·[T,S,D] → [T,S,D]


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[...].astype(jnp.float32)  # [T, S, D]
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    logits = jax.lax.dot_general(q * scale, k, _QKT, preferred_element_type=jnp.float32)
    logits = logits + bias_ref[...][None]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(p, v, _PV, preferred_element_type=jnp.float32) / denom
    o_ref[...] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[...].astype(jnp.float32)  # [T, S, D]
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)

    logits = jax.lax.dot_general(q * scale, k, _QKT, preferred_element_type=jnp.float32)
    logits = logits + bias_ref[...][None]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [T, S, S]

    dv = jax.lax.dot_general(p, do, _PT_DO, preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, _QKT, preferred_element_type=jnp.float32)  # [T,S,S]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q, _PT_DO, preferred_element_type=jnp.float32) * scale

    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


BLOCK_BH = 16  # heads×batch rows per grid program (amortizes program overhead)


def _pad_operands(q, k, v, bias, seq_len, head_dim, block_bh):
    sp = _round_up(seq_len, _LANE)
    dp = _round_up(head_dim, _LANE)
    bh = q.shape[0]
    bhp = _round_up(bh, block_bh)
    pad = [(0, bhp - bh), (0, sp - seq_len), (0, dp - head_dim)]
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)
    # mask padded key columns with -inf; padded query rows are sliced off
    biasp = jnp.full((sp, sp), NEG_INF, jnp.float32)
    base = jnp.zeros((seq_len, seq_len), jnp.float32) if bias is None else bias.astype(jnp.float32)
    biasp = biasp.at[:seq_len, :seq_len].set(base)
    return qp, kp, vp, biasp, sp, dp


def _specs(block_bh, sp, dp):
    spec = pl.BlockSpec((block_bh, sp, dp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((sp, sp), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return spec, bias_spec


def _call(kernel, outs, qp, kp, vp, biasp, sp, dp, interpret, block_bh):
    spec, bias_spec = _specs(block_bh, sp, dp)
    return pl.pallas_call(
        kernel,
        grid=(qp.shape[0] // block_bh,),
        in_specs=[spec, spec, spec, bias_spec],
        out_specs=[spec] * len(outs) if len(outs) > 1 else spec,
        out_shape=outs if len(outs) > 1 else outs[0],
        interpret=interpret,
    )(qp, kp, vp, biasp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q, k, v, bias, scale, interpret=False):
    """softmax(q·kᵀ·scale + bias)·v, fused. q/k/v: [BH, S, D]; bias: [S, S]
    or None. Returns [BH, S, D] in q.dtype."""
    out, _ = _fused_attention_fwd(q, k, v, bias, scale, interpret)
    return out


def _fused_attention_fwd(q, k, v, bias, scale, interpret):
    BH, S, D = q.shape
    block_bh = min(BLOCK_BH, BH)
    qp, kp, vp, biasp, sp, dp = _pad_operands(q, k, v, bias, S, D, block_bh)
    kernel = functools.partial(_fwd_kernel, scale=scale)
    outp = _call(
        kernel, [jax.ShapeDtypeStruct(qp.shape, q.dtype)], qp, kp, vp, biasp, sp, dp,
        interpret, block_bh,
    )
    return outp[:BH, :S, :D], (q, k, v, bias)


def _fused_attention_bwd(scale, interpret, residuals, g):
    q, k, v, bias = residuals
    BH, S, D = q.shape
    block_bh = min(BLOCK_BH, BH)
    qp, kp, vp, biasp, sp, dp = _pad_operands(q, k, v, bias, S, D, block_bh)
    gp = jnp.pad(g, [(0, qp.shape[0] - BH), (0, sp - S), (0, dp - D)])
    kernel = functools.partial(_bwd_kernel, scale=scale)
    spec, bias_spec = _specs(block_bh, sp, dp)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(qp.shape[0] // block_bh,),
        in_specs=[spec, spec, spec, bias_spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct(qp.shape, q.dtype)] * 3,
        interpret=interpret,
    )(qp, kp, vp, biasp, gp)
    dq = dq[:BH, :S, :D]
    dk = dk[:BH, :S, :D]
    dv = dv[:BH, :S, :D]
    return dq, dk, dv, None


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
