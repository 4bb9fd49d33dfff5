"""Fused Pallas TPU kernel for the IPOT solver.

One grid program per *block of TB batch items* (usually the whole batch):
the cost matrices, transport plans, and scaling vectors all stay
VMEM-resident across the full `iterations × k` proximal-point updates — one
kernel launch instead of ~50 chained HLO loop bodies re-reading HBM each
iteration.

Design notes (each earned by a measured failure, PERFORMANCE.md "IPOT
kernel"):
- v1 ran one batch item per grid program → 50·B *serialized* tiny updates,
  8× slower than the batched XLA scan. Items are now blocked.
- Batched `dot_general` matvecs lower to per-item loops in Mosaic; the
  updates are instead broadcast-multiply + axis reductions (pure VPU).
- The x-side vectors live as [TB, 1, M] and the y-side as [TB, N, 1], so
  every reduce keeps its axis layout — no cross-lane relayouts, no
  transposes, no >2D gathers (all Mosaic-unsupported or slow).
- Node axes pad only to the 8-sublane multiple, not 128 lanes — real node
  counts are ≤32 and full-lane padding inflates the matrices 64×.

Numerics/semantics identical to `ops.ot.ipot` (reference `model_ot.py:32-63`):
float32 throughout, padded nodes masked with the 1e4 offset trick, transport
plan returned transposed [B, N, M].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_event_tpu.ops.ot import MASK_BIG
from clip_event_tpu.ops.pallas_util import interpret_off_tpu
from clip_event_tpu.ops.pallas_util import round_up as _round_up


def _ipot_kernel(
    ct_ref, xpad_ref, ypad_ref, xlen_ref, ylen_ref, t_ref, *, beta, iterations, k
):
    Ct = ct_ref[...]  # [TB, N, M] float32 (cost, pre-transposed)
    x_keep = 1.0 - xpad_ref[...]  # [TB, 1, M] — 1 at real nodes
    y_keep = 1.0 - ypad_ref[...]  # [TB, N, 1]
    x_len = xlen_ref[...]  # [TB, 1, M] (node count, broadcast)
    y_len = ylen_ref[...]  # [TB, N, 1]

    joint_keep = y_keep * x_keep  # [TB, N, M]
    A = jnp.exp(-Ct / beta) * joint_keep
    T = joint_keep
    sigma = x_keep / x_len  # [TB, 1, M]
    x_mask = (1.0 - x_keep) * MASK_BIG  # [TB, 1, M]
    y_mask = (1.0 - y_keep) * MASK_BIG  # [TB, N, 1]

    def outer(_, carry):
        T, sigma = carry
        Q = A * T  # [TB, N, M]
        delta = jnp.zeros_like(y_mask)

        def inner(_, carry):
            sigma, _ = carry
            q_sig = jnp.sum(Q * sigma, axis=2, keepdims=True)  # [TB, N, 1]
            delta = 1.0 / (y_len * q_sig + y_mask)  # [TB, N, 1]
            d_q = jnp.sum(delta * Q, axis=1, keepdims=True)  # [TB, 1, M]
            sigma = 1.0 / (x_len * d_q + x_mask)  # [TB, 1, M]
            return sigma, delta

        sigma, delta = jax.lax.fori_loop(0, k, inner, (sigma, delta))
        T = delta * Q * sigma  # [TB, N, M]
        return T, sigma

    T, _ = jax.lax.fori_loop(0, iterations, outer, (T, sigma))
    t_ref[...] = T * joint_keep


def _pick_block_b(batch: int, mp: int, np_: int) -> int:
    """Largest batch-block whose VMEM working set (~6 f32 [N, M] matrices per
    item: Ct, A, T, Q, joint_keep + slack) stays under ~6 MB. Node counts are
    small, so this is normally the whole batch → a single grid program."""
    # physical VMEM footprint: lanes always tile to 128 even for narrow M
    per_item = 6 * np_ * _round_up(mp, 128) * 4
    for tb in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if tb <= batch and tb * per_item < 6 * 1024 * 1024:
            return tb
    return 1


@functools.partial(
    jax.jit, static_argnames=("beta", "iterations", "k", "interpret")
)
def ipot_pallas(
    cost: jnp.ndarray,
    x_len: jnp.ndarray,
    x_pad: jnp.ndarray,
    y_len: jnp.ndarray,
    y_pad: jnp.ndarray,
    beta: float = 0.5,
    iterations: int = 50,
    k: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for `ops.ot.ipot`: cost [B, M, N] → plan [B, N, M] float32.

    Pads node axes to the 8-sublane multiple and B to the block size; padded
    nodes are flagged in the pad masks so they contribute nothing (same
    mechanism the solver already uses for ragged graphs).
    """
    interpret = interpret_off_tpu(interpret)
    B, M, N = cost.shape
    Mp, Np = _round_up(M, 8), _round_up(N, 8)
    tb = _pick_block_b(B, Mp, Np)
    Bp = _round_up(B, tb)

    cost_t = jnp.zeros((Bp, Np, Mp), jnp.float32).at[:B, :N, :M].set(
        jnp.swapaxes(cost.astype(jnp.float32), 1, 2)
    )
    x_pad_p = jnp.ones((Bp, 1, Mp), jnp.float32).at[:B, 0, :M].set(x_pad.astype(jnp.float32))
    y_pad_p = jnp.ones((Bp, Np, 1), jnp.float32).at[:B, :N, 0].set(y_pad.astype(jnp.float32))
    # padded batch rows get length 1 (all their nodes are masked anyway) so
    # 1/len stays finite; real rows keep their exact count — a zero count
    # divides by zero exactly like the reference (`model_ot.py:36-37`)
    x_len_b = jnp.ones((Bp, 1, Mp), jnp.float32).at[:B].set(
        jnp.broadcast_to(x_len.astype(jnp.float32)[:, None, None], (B, 1, Mp))
    )
    y_len_b = jnp.ones((Bp, Np, 1), jnp.float32).at[:B].set(
        jnp.broadcast_to(y_len.astype(jnp.float32)[:, None, None], (B, Np, 1))
    )

    kernel = functools.partial(_ipot_kernel, beta=beta, iterations=iterations, k=k)
    flops_per_item = iterations * k * 2 * 2 * Mp * Np  # two matvecs per inner step
    out = pl.pallas_call(
        kernel,
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, Np, Mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, Mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Np, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, Mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Np, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, Np, Mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Np, Mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=Bp * flops_per_item,
            bytes_accessed=Bp * (Mp * Np * 8 + Mp * 4 + Np * 4),
            transcendentals=Bp * Mp * Np,
        ),
        interpret=interpret,
    )(cost_t, x_pad_p, y_pad_p, x_len_b, y_len_b)
    return out[:B, :N, :M]
