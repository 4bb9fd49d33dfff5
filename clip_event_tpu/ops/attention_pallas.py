"""Fused attention-core Pallas kernel operating on the packed QKV projection.

CLIP's towers run tiny sequences (text 77, ViT-B/32 grid 50, ViT-L/14 257),
so a whole batch-block of the attention computation fits in VMEM. The XLA
einsum path costs ~3.5 ms/layer-pass on the text tower where ~0.3 ms is
theoretical (measured, PERFORMANCE.md): 6 physical [B,S,H,D] transposes per
layer per pass, head_dim-64 tensors padded to the 128-lane tile in HBM, and
logits/probabilities round-tripping through HBM.

This kernel removes all of that by consuming the packed [B, S, 3W] output of
the QKV projection *directly* — heads are sliced out of the lane dimension
inside VMEM, the whole softmax(QKᵀ)·V core runs per batch-block without ever
leaving VMEM, and the output is written back in the concatenated [B, S, W]
layout the out-projection consumes. The custom VJP recomputes probabilities
in VMEM and emits the gradient already packed as [B, S, 3W], so the backward
pass has no transposes either.

Reference behavior: torch's nn.MultiheadAttention as used by
`model_clip.py:188-200` (reference CLIP residual blocks); numerics match the
jnp einsum path (tests/test_attention_pallas.py).

Used by `models.layers.multi_head_attention` when the attention impl is set
to "pallas" (`use_pallas_attention` in the config).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_event_tpu.ops.pallas_util import interpret_off_tpu as _interpret_here
from clip_event_tpu.ops.pallas_util import round_up as _round_up


def _out_struct(shape, dtype, like):
    """ShapeDtypeStruct carrying `like`'s varying-mesh-axes (vma).

    Inside a vma-checked `jax.shard_map` body (e.g. the pipeline schedule,
    `parallel/pipeline.py`) pallas_call outputs must declare how they vary
    over the manual mesh axes; the kernels are elementwise over the batch
    axis, so the output varies exactly like the packed QKV input."""
    try:
        vma = getattr(jax.typeof(like), "vma", None)
    except Exception:
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)

# batched dot_general helpers over a leading batch axis
_QKT = (((2,), (2,)), ((0,), (0,)))  # [N,S,D]·[N,S,D]  → [N,S,S]
_PV = (((2,), (1,)), ((0,), (0,)))  # [N,S,S]·[N,S,D]  → [N,S,D]
_PT_DO = (((1,), (1,)), ((0,), (0,)))  # [N,S,S]ᵀ·[N,S,D] → [N,S,D]


def _split_heads(qkv, num_heads, width):
    """[TB, S, 3W] → q, k, v each [H*TB, S, D], heads stacked on the batch
    axis (one batched dot_general instead of a per-head loop)."""
    tb, s, _ = qkv.shape
    head_dim = width // num_heads
    qs, ks, vs = [], [], []
    for h in range(num_heads):
        off = h * head_dim
        qs.append(qkv[:, :, off : off + head_dim])
        ks.append(qkv[:, :, width + off : width + off + head_dim])
        vs.append(qkv[:, :, 2 * width + off : 2 * width + off + head_dim])
    stack = lambda ts: jnp.concatenate([t[None] for t in ts], 0).reshape(
        num_heads * tb, s, head_dim
    )
    return stack(qs), stack(ks), stack(vs)


def _merge_heads(out, num_heads, tb):
    """[H*TB, S, D] → [TB, S, W] (concatenate heads back along lanes)."""
    hs = out.reshape(num_heads, tb, out.shape[1], out.shape[2])
    return jnp.concatenate([hs[h] for h in range(num_heads)], axis=-1)


def _probs(q, k, bias, scale):
    """softmax(q·kᵀ·scale + bias) in float32. q/k: [N, S, D]; bias [S, S]."""
    logits = jax.lax.dot_general(q * scale, k, _QKT, preferred_element_type=jnp.float32)
    logits = logits + bias[None]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel(qkv_ref, bias_ref, o_ref, *, num_heads, width, scale):
    qkv = qkv_ref[...].astype(jnp.float32)  # [TB, S, 3W]
    q, k, v = _split_heads(qkv, num_heads, width)
    p = _probs(q, k, bias_ref[...], scale)
    out = jax.lax.dot_general(p, v, _PV, preferred_element_type=jnp.float32)
    o_ref[...] = _merge_heads(out, num_heads, qkv.shape[0]).astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, bias_ref, do_ref, dqkv_ref, *, num_heads, width, scale):
    tb = qkv_ref.shape[0]
    qkv = qkv_ref[...].astype(jnp.float32)
    q, k, v = _split_heads(qkv, num_heads, width)
    # cotangent per head: [TB, S, W] sliced exactly like the q lanes
    g = do_ref[...].astype(jnp.float32)
    head_dim = width // num_heads
    gs = [g[:, :, h * head_dim : (h + 1) * head_dim] for h in range(num_heads)]
    do = jnp.concatenate([t[None] for t in gs], 0).reshape(num_heads * tb, -1, head_dim)

    p = _probs(q, k, bias_ref[...], scale)
    dv = jax.lax.dot_general(p, do, _PT_DO, preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, _QKT, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q, _PT_DO, preferred_element_type=jnp.float32) * scale

    merge = lambda t: _merge_heads(t, num_heads, tb)
    dqkv_ref[...] = jnp.concatenate([merge(dq), merge(dk), merge(dv)], axis=-1).astype(
        dqkv_ref.dtype
    )


def _block_bytes(tb: int, seq_len: int, width: int, num_heads: int) -> int:
    """Worst-case (backward-kernel) VMEM working set for a tb-item block:
    double-buffered bf16 qkv/do/dqkv blocks, ~4 qkv-sized f32 tensors
    (qkv upcast + split q/k/v + merged d_qkv), and the 3 probability-shaped
    f32 tensors (p, dp, ds) with their 128-lane padding."""
    sp = _round_up(seq_len, 128)
    bytes_io = 2 * 2 * (2 * tb * seq_len * 3 * width + tb * seq_len * width)
    bytes_f32 = 4 * (4 * tb * seq_len * 3 * width + 3 * tb * seq_len * sp * num_heads)
    return bytes_io + bytes_f32


def _block_bytes_fwd(tb: int, seq_len: int, width: int, num_heads: int) -> int:
    """Forward-kernel VMEM working set — roughly half the backward's (no
    do/dqkv blocks, one probability tensor plus softmax temporaries instead
    of three), so the forward runs at ~2x the backward's batch block. The
    forward is 2/3 of the attention-core passes under full remat (fwd +
    recompute) and ALL of them at inference."""
    sp = _round_up(seq_len, 128)
    bytes_io = 2 * 2 * (tb * seq_len * 3 * width + tb * seq_len * width)
    bytes_f32 = 4 * (
        2 * tb * seq_len * 3 * width
        + 2 * tb * seq_len * sp * num_heads
        + 2 * tb * seq_len * width
    )
    return bytes_io + bytes_f32


_VMEM_BUDGET = 12 * 1024 * 1024  # of the 16 MB physical VMEM

# Measured liveness calibration for BLOCK SIZING only (round 3): the byte
# models above sum every temporary as simultaneously live, but Mosaic frees
# dead temporaries — blocks the models scored at 15.8–20 MB compile and run
# fine in the 16 MB physical VMEM, and the bigger blocks measure +2% on the
# full train step (PERFORMANCE.md "Attention block-size calibration").
# Applied in the tb pickers, NOT in the *_supported() dispatch gates —
# which kernel runs for a given shape stays exactly as measured.
# Calibrated on the benched presets only: an unmeasured (S, W, H) can hit a
# loud trace-time Mosaic scoped-allocation failure where the uncalibrated
# model would have picked a smaller, compiling block. Escape hatch:
# CLIP_EVENT_ATTN_LIVENESS=1.0 disables the calibration (conservative
# sum-of-temporaries sizing) without code changes.
_LIVENESS = 0.6


def _liveness() -> float:
    raw = os.environ.get("CLIP_EVENT_ATTN_LIVENESS")
    if not raw:
        return _LIVENESS
    try:
        val = float(raw)
    except ValueError:
        raise ValueError(
            f"CLIP_EVENT_ATTN_LIVENESS={raw!r} is not a float (use e.g. 1.0 "
            "to disable the VMEM-liveness calibration)"
        ) from None
    if not 0.0 < val <= 1.0:
        raise ValueError(
            f"CLIP_EVENT_ATTN_LIVENESS={val} must be in (0, 1]"
        )
    return val


def _forced_tb(fwd: bool):
    """Validated CLIP_EVENT_ATTN_TB[_FWD] override, or None.

    Note the asymmetry: custom_vjp preps forward and backward independently,
    so setting only CLIP_EVENT_ATTN_TB forces the BACKWARD block and leaves
    the forward on the byte-model pick (set _FWD too to force both). The
    override bypasses the VMEM byte model entirely — an oversized block is a
    loud trace-time Mosaic error, never silent corruption."""
    name = "CLIP_EVENT_ATTN_TB_FWD" if fwd else "CLIP_EVENT_ATTN_TB"
    raw = os.environ.get(name)
    if not raw:
        return None
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(f"{name}={raw!r} is not an integer") from None
    if val < 1:
        raise ValueError(f"{name}={val} must be >= 1")
    return val


def fused_attention_supported(seq_len: int, width: int, num_heads: int) -> bool:
    """Whether even a 1-item block fits in VMEM. False for e.g. ViT-L/14's
    vision tower (S=257, W=1024, H=16 → ~26 MB at tb=1); callers fall back
    to the XLA einsum path, which tiles through HBM."""
    return _block_bytes(1, seq_len, width, num_heads) < _VMEM_BUDGET


def _pick_block_b(
    batch: int, seq_len: int, width: int, num_heads: int, fwd: bool = False
) -> int:
    """Largest batch-block whose working set fits in the VMEM budget.

    `CLIP_EVENT_ATTN_TB` / `CLIP_EVENT_ATTN_TB_FWD` env overrides exist for
    block-size sweeps (read at trace time — sweep in fresh processes, the
    jit/remat caches do not key on env; see `_forced_tb` for the
    fwd/bwd-independence caveat)."""
    forced = _forced_tb(fwd)
    if forced is not None:
        return min(forced, batch)
    model = _block_bytes_fwd if fwd else _block_bytes
    for tb in (32, 16, 8, 4, 2, 1):
        if model(tb, seq_len, width, num_heads) * _liveness() < _VMEM_BUDGET:
            return min(tb, batch)
    raise ValueError(
        f"attention block (S={seq_len}, W={width}, H={num_heads}) exceeds VMEM "
        "even at block size 1 — gate calls on fused_attention_supported()"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_attention_qkv(qkv, bias, num_heads, scale, interpret=False):
    """Multi-head softmax attention over a packed QKV projection.

    qkv: [B, S, 3W] (the raw output of the fused QKV matmul, heads laid out
    as torch/CLIP: q lanes [0, W), k [W, 2W), v [2W, 3W), head h at
    [h·D, (h+1)·D) within each). bias: additive [S, S] float mask or None.
    Returns [B, S, W] — head outputs concatenated, ready for the
    out-projection — in qkv.dtype.
    """
    out, _ = _fused_qkv_fwd(qkv, bias, num_heads, scale, interpret)
    return out


def _prep(qkv, bias, num_heads, fwd=False):
    B, S, W3 = qkv.shape
    width = W3 // 3
    if width % num_heads:
        raise ValueError(f"width {width} not divisible by num_heads {num_heads}")
    tb = _pick_block_b(B, S, width, num_heads, fwd=fwd)
    bp = _round_up(B, tb)
    if bp != B:
        qkv = jnp.pad(qkv, [(0, bp - B), (0, 0), (0, 0)])
    b = jnp.zeros((S, S), jnp.float32) if bias is None else bias.astype(jnp.float32)
    return qkv, b, width, tb




def _fused_qkv_fwd(qkv, bias, num_heads, scale, interpret):
    interpret = _interpret_here(interpret)
    B, S, _ = qkv.shape
    qp, b, width, tb = _prep(qkv, bias, num_heads, fwd=True)
    kernel = functools.partial(_fwd_kernel, num_heads=num_heads, width=width, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(qp.shape[0] // tb,),
        in_specs=[
            pl.BlockSpec((tb, S, 3 * width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, S, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=_out_struct((qp.shape[0], S, width), qkv.dtype, qp),
        interpret=interpret,
    )(qp, b)
    return out[:B], (qkv, bias)


def _fused_qkv_bwd(num_heads, scale, interpret, residuals, g):
    interpret = _interpret_here(interpret)
    qkv, bias = residuals
    B, S, _ = qkv.shape
    qp, b, width, tb = _prep(qkv, bias, num_heads)
    gp = jnp.pad(g, [(0, qp.shape[0] - B), (0, 0), (0, 0)]) if qp.shape[0] != B else g
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads, width=width, scale=scale)
    dqkv = pl.pallas_call(
        kernel,
        grid=(qp.shape[0] // tb,),
        in_specs=[
            pl.BlockSpec((tb, S, 3 * width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, S, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, S, 3 * width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=_out_struct((qp.shape[0], S, 3 * width), qkv.dtype, qp),
        interpret=interpret,
    )(qp, b, gp)
    return dqkv[:B], None


fused_attention_qkv.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)


def sharded_attention(kernel_fn, qkv, bias, num_heads, scale, mesh, axis):
    """Batch-sharded kernel invocation for multi-chip meshes.

    GSPMD cannot partition a pallas custom call — left alone it replicates
    the operands (an all-gather of the whole batch). Attention is
    embarrassingly parallel over B, so wrap the call in `shard_map` over the
    data axis: each device runs the kernel on its local batch shard, no
    collectives.
    """
    from jax.sharding import PartitionSpec as P

    spec = P(axis, None, None)
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes info
    if bias is None:
        return jax.shard_map(
            lambda q: kernel_fn(q, None, num_heads, scale),
            mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False,
        )(qkv)
    return jax.shard_map(
        lambda q, b: kernel_fn(q, b, num_heads, scale),
        mesh=mesh, in_specs=(spec, P(None, None)), out_specs=spec, check_vma=False,
    )(qkv, bias)


def fused_attention_qkv_sharded(qkv, bias, num_heads, scale, mesh, axis):
    return sharded_attention(fused_attention_qkv, qkv, bias, num_heads, scale, mesh, axis)


def sharded_attention_tp(kernel_fn, qkv, bias, num_heads, scale, mesh, dp_axis, tp_axis):
    """(dp × tp)-sharded kernel invocation for Megatron tensor parallelism.

    Under column-parallel QKV (`parallel/sharding.py`) the packed [B, S, 3W]
    activation is lane-sharded over 'tp' in canonical [q|k|v] order, whose
    tp-chunks cross the q/k/v section boundaries — useless to the kernel.
    But attention is embarrassingly parallel over HEADS, and the Megatron
    head-groups are contiguous within each section, so: reorder the lanes to
    per-group packing [q_g|k_g|v_g] (one lane-permuting reshard under GSPMD —
    the einsum path pays the equivalent reshard at its q/k/v split), then
    shard_map the kernel over (dp, tp) with H/tp local heads. Each device's
    local block is a valid packed QKV of an H/tp-head attention, and because
    head-group g's output IS lanes [g·W/tp, (g+1)·W/tp) of the canonical
    head-concat, the out_specs reassemble [B, S, W] in canonical order —
    already lane-sharded exactly the way the row-parallel out-projection
    wants its input. No inverse permutation, no collectives in the kernel.
    """
    from jax.sharding import PartitionSpec as P

    B, S, W3 = qkv.shape
    W = W3 // 3
    tp = dict(zip(mesh.axis_names, mesh.devices.shape))[tp_axis]
    wl = W // tp
    qkv = (
        qkv.reshape(B, S, 3, tp, wl)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, S, W3)
    )
    spec = P(dp_axis, None, tp_axis)
    out_spec = P(dp_axis, None, tp_axis)
    h_local = num_heads // tp
    if bias is None:
        return jax.shard_map(
            lambda q: kernel_fn(q, None, h_local, scale),
            mesh=mesh, in_specs=(spec,), out_specs=out_spec, check_vma=False,
        )(qkv)
    return jax.shard_map(
        lambda q, b: kernel_fn(q, b, h_local, scale),
        mesh=mesh, in_specs=(spec, P(None, None)), out_specs=out_spec,
        check_vma=False,
    )(qkv, bias)



# --------------------------------------------------------------- head-gridded
# Variant for sequences whose whole-width block cannot fit VMEM (ViT-L/14
# S=257, ViT-B/16 S=197): the grid runs over (batch-block, lane-block) where
# a lane-block is 128 lanes = 128//D consecutive heads (2 for CLIP's D=64),
# and each program sees only those heads' q/k/v lanes. q, k, v arrive as
# three BlockSpecs over the SAME packed [B, S, 3W] array with lane-block
# offsets 0, W/128, 2W/128 — Mosaic requires lane blocks of exactly 128, so
# the heads-per-program count is fixed by the head_dim, and W must be a
# multiple of 128 (true for every CLIP tower). Working set shrinks by
# H/(128/D)× vs the whole-width kernel; it replaces the XLA einsum
# fallback, not the main kernel.

_HG_LANES = 128


def _hg_heads(head_dim: int) -> int:
    return _HG_LANES // head_dim


def _hg_stack(t, heads):
    """[TB, S, 128] lane-block → [heads·TB, S, D] (heads onto the batch
    axis, same move as `_split_heads` for the whole-width kernel)."""
    tb, s, _ = t.shape
    d = _HG_LANES // heads
    return jnp.concatenate(
        [t[:, :, h * d : (h + 1) * d][None] for h in range(heads)], 0
    ).reshape(heads * tb, s, d)


def _hg_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, heads, scale):
    # refs are [TB, S, 128] lane-blocks = a width-128, `heads`-head attention
    tb = q_ref.shape[0]
    q = _hg_stack(q_ref[...].astype(jnp.float32), heads)
    k = _hg_stack(k_ref[...].astype(jnp.float32), heads)
    v = _hg_stack(v_ref[...].astype(jnp.float32), heads)
    p = _probs(q, k, bias_ref[...], scale)
    out = jax.lax.dot_general(p, v, _PV, preferred_element_type=jnp.float32)
    o_ref[...] = _merge_heads(out, heads, tb).astype(o_ref.dtype)


def _hg_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                   dq_ref, dk_ref, dv_ref, *, heads, scale):
    tb = q_ref.shape[0]
    q = _hg_stack(q_ref[...].astype(jnp.float32), heads)
    k = _hg_stack(k_ref[...].astype(jnp.float32), heads)
    v = _hg_stack(v_ref[...].astype(jnp.float32), heads)
    do = _hg_stack(do_ref[...].astype(jnp.float32), heads)

    p = _probs(q, k, bias_ref[...], scale)
    dv = jax.lax.dot_general(p, do, _PT_DO, preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, _QKT, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q, _PT_DO, preferred_element_type=jnp.float32) * scale

    dq_ref[...] = _merge_heads(dq, heads, tb).astype(dq_ref.dtype)
    dk_ref[...] = _merge_heads(dk, heads, tb).astype(dk_ref.dtype)
    dv_ref[...] = _merge_heads(dv, heads, tb).astype(dv_ref.dtype)


def _hg_block_bytes(tb: int, seq_len: int, heads: int) -> int:
    """Backward working set per program: 7 f32 [heads·TB, S, D→128-lane]
    tensors (q, k, v, do, dq, dk, dv), 3 probability tensors, the double-
    buffered bf16 io streams (q/k/v/do in + dq/dk/dv out = 7), and the
    [S, S] f32 bias block."""
    sp = _round_up(seq_len, 128)
    f32 = 4 * (7 * heads * tb * seq_len * _HG_LANES + 3 * heads * tb * seq_len * sp)
    io = 2 * 2 * 7 * tb * seq_len * _HG_LANES
    bias = 4 * seq_len * sp
    return f32 + io + bias


def _hg_block_bytes_fwd(tb: int, seq_len: int, heads: int) -> int:
    """Forward working set: 4 f32 tensors (q, k, v, out), 2 probability
    tensors (softmax temporary + result), 4 bf16 io streams (q/k/v in +
    out) — roughly half the backward's, so the forward runs bigger blocks
    (same split as `_block_bytes_fwd` for the whole-width kernel)."""
    sp = _round_up(seq_len, 128)
    f32 = 4 * (4 * heads * tb * seq_len * _HG_LANES + 2 * heads * tb * seq_len * sp)
    io = 2 * 2 * 4 * tb * seq_len * _HG_LANES
    bias = 4 * seq_len * sp
    return f32 + io + bias


def head_grid_supported(seq_len: int, width: int, num_heads: int) -> bool:
    """The head-gridded kernel needs W % 128 == 0, head_dim dividing 128,
    and a 1-item block fitting VMEM."""
    if width % num_heads or width % _HG_LANES:
        return False
    d = width // num_heads
    if d > _HG_LANES or _HG_LANES % d:
        return False
    return _hg_block_bytes(1, seq_len, _hg_heads(d)) < _VMEM_BUDGET


def _hg_pick_tb(batch: int, seq_len: int, heads: int, fwd: bool = False) -> int:
    forced = _forced_tb(fwd)
    if forced is not None:
        return min(forced, batch)
    model = _hg_block_bytes_fwd if fwd else _hg_block_bytes
    for tb in (32, 16, 8, 4, 2, 1):
        if model(tb, seq_len, heads) * _liveness() < _VMEM_BUDGET:
            return min(tb, batch)
    raise ValueError(
        f"head-gridded attention (S={seq_len}) exceeds VMEM — gate calls on "
        "head_grid_supported()"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_attention_qkv_headgrid(qkv, bias, num_heads, scale, interpret=False):
    """Drop-in for `fused_attention_qkv` with an H·D/128× smaller VMEM
    footprint (one 128-lane head group per grid program). Same packed
    [B, S, 3W] input / [B, S, W] output contract."""
    out, _ = _hg_fwd(qkv, bias, num_heads, scale, interpret)
    return out


def _hg_prep(qkv, bias, num_heads, fwd=False):
    B, S, W3 = qkv.shape
    width = W3 // 3
    d = width // num_heads
    heads = _hg_heads(d)
    tb = _hg_pick_tb(B, S, heads, fwd=fwd)
    bp = _round_up(B, tb)
    if bp != B:
        qkv = jnp.pad(qkv, [(0, bp - B), (0, 0), (0, 0)])
    b = jnp.zeros((S, S), jnp.float32) if bias is None else bias.astype(jnp.float32)
    return qkv, b, width, heads, tb


def _hg_specs(tb, S, width):
    nb = width // _HG_LANES  # lane-blocks per q/k/v segment
    blk = (tb, S, _HG_LANES)
    q = pl.BlockSpec(blk, lambda b, h: (b, 0, h), memory_space=pltpu.VMEM)
    k = pl.BlockSpec(blk, lambda b, h: (b, 0, nb + h), memory_space=pltpu.VMEM)
    v = pl.BlockSpec(blk, lambda b, h: (b, 0, 2 * nb + h), memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((S, S), lambda b, h: (0, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec(blk, lambda b, h: (b, 0, h), memory_space=pltpu.VMEM)
    return q, k, v, bias, out


def _hg_fwd(qkv, bias, num_heads, scale, interpret):
    interpret = _interpret_here(interpret)
    B, S, _ = qkv.shape
    qp, b, width, heads, tb = _hg_prep(qkv, bias, num_heads, fwd=True)
    qs, ks, vs, bs, os = _hg_specs(tb, S, width)
    kernel = functools.partial(_hg_fwd_kernel, heads=heads, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(qp.shape[0] // tb, width // _HG_LANES),
        in_specs=[qs, ks, vs, bs],
        out_specs=os,
        out_shape=_out_struct((qp.shape[0], S, width), qkv.dtype, qp),
        interpret=interpret,
    )(qp, qp, qp, b)
    return out[:B], (qkv, bias)


def _hg_bwd(num_heads, scale, interpret, residuals, g):
    interpret = _interpret_here(interpret)
    qkv, bias = residuals
    B, S, _ = qkv.shape
    qp, b, width, heads, tb = _hg_prep(qkv, bias, num_heads)
    bp = qp.shape[0]
    gp = g if bp == B else jnp.pad(g, [(0, bp - B), (0, 0), (0, 0)])
    qs, ks, vs, bs, os = _hg_specs(tb, S, width)
    kernel = functools.partial(_hg_bwd_kernel, heads=heads, scale=scale)
    shape = _out_struct((bp, S, width), qkv.dtype, qp)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bp // tb, width // _HG_LANES),
        in_specs=[qs, ks, vs, bs, os],
        out_specs=(os, os, os),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(qp, qp, qp, b, gp)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return dqkv[:B], None


fused_attention_qkv_headgrid.defvjp(_hg_fwd, _hg_bwd)


# ---------------------------------------------------------------- megakernel
# Forward-only fused LN1 + QKV-projection + attention-core block, built to
# MEASURE the whole-block-fusion break-even (PERFORMANCE.md lever 3): both
# towers sit ~30-40% above their pure-matmul floors, and the remaining
# non-matmul time is LN passes + attention-core HBM traffic. This kernel
# keeps qkv_w resident in VMEM (1.5 MB bf16 for the text tower) and fuses
#   ln = LayerNorm(x);  qkv = ln @ qkv_w + qkv_b;  out = attn_core(qkv)
# into one VMEM-resident pass per batch-block — x is read from HBM once and
# the [B, S, 3W] projection never materializes in HBM. Output contract
# matches `fused_attention_qkv` ([B, S, W], pre-out-projection).
# tools/bench_components.py `megakernel` times it against the unfused
# ln→matmul→kernel chain; it is wired into the train path only if that
# measurement wins (config `use_megakernel`).


def _mega_fwd_kernel(x_ref, lns_ref, lnb_ref, w_ref, b_ref, bias_ref, o_ref,
                     *, num_heads, width, scale, eps=1e-5):
    tb, s, _ = x_ref.shape
    x = x_ref[...].astype(jnp.float32)  # [TB, S, W]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    ln = (x - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    # the projection runs at the io dtype (bf16 weights on the MXU, f32
    # accumulation) — same numerics as the unfused linear()
    qkv = jax.lax.dot(
        ln.reshape(tb * s, width).astype(x_ref.dtype), w_ref[...],
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + b_ref[...].astype(jnp.float32)).reshape(tb, s, 3 * width)
    q, k, v = _split_heads(qkv, num_heads, width)
    p = _probs(q, k, bias_ref[...], scale)
    out = jax.lax.dot_general(p, v, _PV, preferred_element_type=jnp.float32)
    o_ref[...] = _merge_heads(out, num_heads, tb).astype(o_ref.dtype)


def _mega_block_bytes(tb: int, seq_len: int, width: int, num_heads: int) -> int:
    """Forward working set: double-buffered io blocks (x in, out out), the
    resident weights, and the f32 intermediates (x upcast + ln + qkv +
    split q/k/v + probs)."""
    sp = _round_up(seq_len, 128)
    io = 2 * 2 * (tb * seq_len * width + tb * seq_len * width)
    weights = 2 * width * 3 * width + 4 * 3 * width
    f32 = 4 * (
        2 * tb * seq_len * width          # x upcast + ln
        + 2 * tb * seq_len * 3 * width    # qkv + stacked q/k/v
        + num_heads * tb * seq_len * sp   # probabilities
    )
    return io + weights + f32


def megakernel_supported(seq_len: int, width: int, num_heads: int) -> bool:
    return _mega_block_bytes(1, seq_len, width, num_heads) < _VMEM_BUDGET


def _mega_pick_tb(batch: int, seq_len: int, width: int, num_heads: int) -> int:
    for tb in (32, 16, 8, 4, 2, 1):
        if _mega_block_bytes(tb, seq_len, width, num_heads) < _VMEM_BUDGET:
            return min(tb, batch)
    raise ValueError(
        f"megakernel block (S={seq_len}, W={width}) exceeds VMEM — gate on "
        "megakernel_supported()"
    )


def fused_ln_qkv_attention(x, ln_scale, ln_bias, qkv_w, qkv_b, bias,
                           num_heads, scale, interpret=False):
    """LayerNorm → packed QKV projection → attention core, one kernel.

    x: [B, S, W]; ln_scale/ln_bias: [W]; qkv_w: [W, 3W]; qkv_b: [3W];
    bias: additive [S, S] mask or None. Returns [B, S, W] in x.dtype.
    Forward-only (no custom VJP) — the break-even measurement vehicle for
    the full dW-accumulating block megakernel.
    """
    interpret = _interpret_here(interpret)
    B, S, W = x.shape
    if W % num_heads:
        raise ValueError(f"width {W} not divisible by num_heads {num_heads}")
    tb = _mega_pick_tb(B, S, W, num_heads)
    bp = _round_up(B, tb)
    xp = jnp.pad(x, [(0, bp - B), (0, 0), (0, 0)]) if bp != B else x
    b = jnp.zeros((S, S), jnp.float32) if bias is None else bias.astype(jnp.float32)
    kernel = functools.partial(
        _mega_fwd_kernel, num_heads=num_heads, width=W, scale=scale
    )
    const = lambda *_: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, S, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 3 * W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, S, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, S, W), x.dtype),
        interpret=interpret,
    )(
        xp,
        ln_scale.reshape(1, W).astype(x.dtype),
        ln_bias.reshape(1, W).astype(x.dtype),
        qkv_w.astype(x.dtype),
        qkv_b.reshape(1, 3 * W).astype(x.dtype),
        b,
    )
    return out[:B]
