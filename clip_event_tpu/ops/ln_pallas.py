"""Fused LayerNorm Pallas kernels (standalone LN and residual-add + LN).

Why this might pay: the LN passes are the last decomposed non-matmul cost in
the transformer stacks — the LN-free ceiling measures 15% (text) / 9%
(vision) of the stack gradient (PERFORMANCE.md "LayerNorm share"), and the
cost is HBM traffic: XLA schedules LN as a reduce pass (read #1 of the
activations) plus a normalize pass (read #2), and the preceding residual add
is a third pass over the same bytes. These kernels do each LN in ONE read +
one write per tensor — mean/var and the normalize happen on the VMEM-resident
block — and `add_layer_norm` folds the residual add into the same read. The
custom VJPs do the same on the backward: one read of (x, dy) per row-block,
with dγ/dβ accumulated across grid steps (the TPU grid is sequential, so
accumulating into a block that maps to the same output slot every step is
race-free).

Unlike the whole-block megakernel (measured NEGATIVE — keeping weights
VMEM-resident forced per-block matmul shapes that lost more MXU utilization
than the fusion saved, PERFORMANCE.md lever 3), these kernels contain no
matmuls, so they cannot lose on MXU scheduling; the only risk is Mosaic
launch overhead vs XLA's fusions.

Numerics match `models.layers.layer_norm` exactly in structure: stats and
normalize in float32 ("fp32 island", reference model_clip.py:157-163), output
cast back to the input dtype; the residual add in `add_layer_norm` runs in
the I/O dtype, matching the XLA path's bf16 residual arithmetic.

Used by `models.layers.residual_block` when the LN impl is "pallas"
(`use_pallas_ln` in the config); `tests/test_ln_pallas.py` proves parity vs
the XLA path for forward and gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_event_tpu.ops.pallas_util import interpret_off_tpu as _interpret_here
from clip_event_tpu.ops.pallas_util import round_up as _round_up

_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_rows(n_rows: int, width: int, bwd: bool = False) -> int:
    """Largest row-block whose f32 working set fits the VMEM budget.

    Byte model: the backward holds ~6 [TR, W] f32 temporaries live (x upcast,
    xhat, dy, g, dx, plus reduction temps) + double-buffered bf16 io for 4
    tensors; the forward ~4 temporaries + io for 3 tensors."""
    temps, ios = (6, 4) if bwd else (4, 3)
    for tr in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        b = tr * width * (4 * temps + 2 * 2 * 2 * ios)
        if b < _VMEM_BUDGET:
            return min(tr, _round_up(n_rows, 8))
    return 8


def _stats(x32: jnp.ndarray, eps: float):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    c = x32 - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return c * rstd  # xhat


def _ln_fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps):
    xhat = _stats(x_ref[...].astype(jnp.float32), eps)
    y = xhat * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _add_ln_fwd_kernel(r_ref, d_ref, g_ref, b_ref, x_ref, y_ref, *, eps):
    x = r_ref[...] + d_ref[...]  # residual add in the io dtype (matches XLA)
    x_ref[...] = x
    xhat = _stats(x.astype(jnp.float32), eps)
    y = xhat * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _ln_bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps):
    """dx for one row-block + dγ/dβ accumulated across the grid."""
    i = pl.program_id(0)
    x32 = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    c = x32 - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = c * rstd
    dy = dy_ref[...].astype(jnp.float32)
    g = dy * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(g, axis=-1, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx_ref[...] = ((g - m1 - xhat * m2) * rstd).astype(dx_ref.dtype)
    dg_blk = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_blk = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dg_ref[...] = dg_blk
        db_ref[...] = db_blk

    @pl.when(i > 0)
    def _acc():
        dg_ref[...] += dg_blk
        db_ref[...] += db_blk


def _flatten(x):
    w = x.shape[-1]
    return x.reshape(-1, w), x.shape


def _pad_rows(x2, tr):
    n = x2.shape[0]
    np_ = _round_up(n, tr)
    if np_ != n:
        x2 = jnp.pad(x2, [(0, np_ - n), (0, 0)])
    return x2, n


def _row_spec(tr, w):
    return pl.BlockSpec((tr, w), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _vec_spec(w):
    return pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM)


# --------------------------------------------------------------- standalone


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm_pallas(x, scale, bias, eps=1e-5, interpret=False):
    """LayerNorm over the last axis in ONE HBM read + one write.

    x: [..., W] (W a multiple of 128); scale/bias: [W]. Float32 stats and
    normalize, output in x.dtype — identical numerics to
    `models.layers.layer_norm` (reference LayerNorm, model_clip.py:157-163).
    """
    y, _ = _ln_fwd(x, scale, bias, eps, interpret)
    return y


def _ln_fwd(x, scale, bias, eps, interpret):
    interpret = _interpret_here(interpret)
    x2, shape = _flatten(x)
    w = x2.shape[1]
    tr = _pick_rows(x2.shape[0], w)
    x2, n = _pad_rows(x2, tr)
    kernel = functools.partial(_ln_fwd_kernel, eps=eps)
    y = pl.pallas_call(
        kernel,
        grid=(x2.shape[0] // tr,),
        in_specs=[_row_spec(tr, w), _vec_spec(w), _vec_spec(w)],
        out_specs=_row_spec(tr, w),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, w), bias.reshape(1, w))
    return y[:n].reshape(shape), (x, scale, bias)


def _ln_bwd_call(x2, scale, dy2, eps, interpret, out_dtype):
    """Shared backward pallas_call: returns (dx [N, W], dγ [W], dβ [W] f32)."""
    w = x2.shape[1]
    tr = _pick_rows(x2.shape[0], w, bwd=True)
    x2, n = _pad_rows(x2, tr)
    dy2, _ = _pad_rows(dy2, tr)
    kernel = functools.partial(_ln_bwd_kernel, eps=eps)
    dx, dg, db = pl.pallas_call(
        kernel,
        grid=(x2.shape[0] // tr,),
        in_specs=[_row_spec(tr, w), _vec_spec(w), _row_spec(tr, w)],
        out_specs=[_row_spec(tr, w), _vec_spec(w), _vec_spec(w)],
        out_shape=[
            jax.ShapeDtypeStruct(x2.shape, out_dtype),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
        ],
        interpret=interpret,
    )(x2, scale.reshape(1, w), dy2)
    return dx[:n], dg.reshape(w), db.reshape(w)


def _ln_bwd(eps, interpret, residuals, g):
    interpret = _interpret_here(interpret)
    x, scale, bias = residuals
    x2, shape = _flatten(x)
    dy2, _ = _flatten(g)
    dx, dg, db = _ln_bwd_call(x2, scale, dy2, eps, interpret, x.dtype)
    return dx.reshape(shape), dg.astype(scale.dtype), db.astype(bias.dtype)


layer_norm_pallas.defvjp(_ln_fwd, _ln_bwd)


# ------------------------------------------------------------ fused add+LN


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def add_layer_norm_pallas(res, delta, scale, bias, eps=1e-5, interpret=False):
    """(x, y) = (res + delta, LayerNorm(res + delta)) in one kernel.

    Folds the residual add into the LN's single read: 2 reads + 2 writes of
    the [N, W] stream vs the XLA schedule's add pass + two LN passes. The
    backward's d(res) == d(delta) == dx_cotangent + LN_dx(dy), computed in
    one kernel read as well.
    """
    (x, y), _ = _add_ln_fwd(res, delta, scale, bias, eps, interpret)
    return x, y


def _add_ln_fwd(res, delta, scale, bias, eps, interpret):
    interpret = _interpret_here(interpret)
    r2, shape = _flatten(res)
    d2, _ = _flatten(delta)
    w = r2.shape[1]
    tr = _pick_rows(r2.shape[0], w)
    r2, n = _pad_rows(r2, tr)
    d2, _ = _pad_rows(d2, tr)
    kernel = functools.partial(_add_ln_fwd_kernel, eps=eps)
    x, y = pl.pallas_call(
        kernel,
        grid=(r2.shape[0] // tr,),
        in_specs=[_row_spec(tr, w), _row_spec(tr, w), _vec_spec(w), _vec_spec(w)],
        out_specs=[_row_spec(tr, w), _row_spec(tr, w)],
        out_shape=[
            jax.ShapeDtypeStruct(r2.shape, res.dtype),
            jax.ShapeDtypeStruct(r2.shape, res.dtype),
        ],
        interpret=interpret,
    )(r2, d2, scale.reshape(1, w), bias.reshape(1, w))
    x = x[:n].reshape(shape)
    return (x, y[:n].reshape(shape)), (x, scale, bias)


def _add_ln_bwd(eps, interpret, residuals, cotangents):
    interpret = _interpret_here(interpret)
    x, scale, bias = residuals
    dx_out, dy = cotangents
    x2, shape = _flatten(x)
    dy2, _ = _flatten(dy)
    dx_ln, dg, db = _ln_bwd_call(x2, scale, dy2, eps, interpret, x.dtype)
    din = dx_out + dx_ln.reshape(shape).astype(dx_out.dtype)
    return din, din, dg.astype(scale.dtype), db.astype(bias.dtype)


add_layer_norm_pallas.defvjp(_add_ln_fwd, _add_ln_bwd)


def ln_supported(width: int) -> bool:
    """The kernels need the lane axis to be a whole number of 128-lane tiles
    (CLIP widths 512/640/768/1024 all qualify)."""
    return width % 128 == 0


def sharded_ln(fn, args, mesh, axis, n_outs=1):
    """shard_map wrapper over the batch axis for multi-chip meshes (GSPMD
    cannot partition a pallas custom call; LN is row-parallel so each device
    runs the kernel on its local [B/dp, S, W] shard, no collectives)."""
    from jax.sharding import PartitionSpec as P

    spec = P(axis, *([None] * (args[0].ndim - 1)))
    vec = P(None)
    in_specs = tuple(spec if a.ndim > 1 else vec for a in args)
    out_specs = spec if n_outs == 1 else (spec,) * n_outs
    return jax.shard_map(
        lambda *a: fn(*a), mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(*args)
