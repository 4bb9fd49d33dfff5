"""Fused Pallas TPU kernel for the IPOT solver.

One grid program per batch item: the cost matrix, transport plan, and both
scaling vectors stay VMEM-resident across all `iterations × k` proximal-point
updates — one kernel launch instead of ~50 chained HLO loop bodies
re-reading HBM. Matrices are tiny (M, N ≤ 128 after padding), so each
update is a couple of VPU element-wise ops plus two skinny MXU matmuls.

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

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ipot_kernel(
    xlen_ref, ylen_ref, c_ref, xpad_ref, ypad_ref, t_ref, *, beta, iterations, k
):
    b = pl.program_id(0)
    C = c_ref[0]  # [M, N] float32
    x_keep = 1.0 - xpad_ref[0]  # [1, M] — 1 at real nodes
    y_keep = 1.0 - ypad_ref[0]  # [1, N]
    x_len = xlen_ref[b]
    y_len = ylen_ref[b]

    joint_keep = y_keep.T @ x_keep  # [N, M] outer product of {0,1}
    A = jnp.exp(-C.T / beta) * joint_keep
    T = joint_keep
    sigma = x_keep / x_len  # [1, M]
    x_mask = (1.0 - x_keep) * MASK_BIG  # [1, M]
    y_mask = (1.0 - y_keep) * MASK_BIG  # [1, N]

    def outer(_, carry):
        T, sigma = carry
        Q = A * T  # [N, M]
        delta = jnp.zeros_like(y_mask)

        def inner(_, carry):
            sigma, _ = carry
            q_sig = jnp.dot(Q, sigma.T, preferred_element_type=jnp.float32)  # [N, 1]
            delta = 1.0 / (y_len * q_sig.T + y_mask)  # [1, N]
            d_q = jnp.dot(delta, Q, preferred_element_type=jnp.float32)  # [1, M]
            sigma = 1.0 / (x_len * d_q + x_mask)  # [1, M]
            return sigma, delta

        sigma, delta = jax.lax.fori_loop(0, k, inner, (sigma, delta))
        T = delta.T * Q * sigma
        return T, sigma

    T, _ = jax.lax.fori_loop(0, iterations, outer, (T, sigma))
    t_ref[0] = T * joint_keep


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

    Pads M and N to the 128 lane width; padded nodes are flagged in the pad
    masks so they contribute nothing (same mechanism the solver already uses
    for ragged graphs).
    """
    B, M, N = cost.shape
    Mp, Np = _round_up(max(M, 8), _LANE), _round_up(max(N, 8), _LANE)

    cost_p = jnp.zeros((B, Mp, Np), jnp.float32).at[:, :M, :N].set(cost.astype(jnp.float32))
    x_pad_p = jnp.ones((B, 1, Mp), jnp.float32).at[:, 0, :M].set(x_pad.astype(jnp.float32))
    y_pad_p = jnp.ones((B, 1, Np), jnp.float32).at[:, 0, :N].set(y_pad.astype(jnp.float32))

    kernel = functools.partial(_ipot_kernel, beta=beta, iterations=iterations, k=k)
    flops_per_item = iterations * k * 2 * 2 * Mp * Np  # two matvecs per inner step
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # x_len, whole [B] array
            pl.BlockSpec(memory_space=pltpu.SMEM),  # y_len
            pl.BlockSpec((1, Mp, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Np, Mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, Mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * flops_per_item,
            bytes_accessed=B * (Mp * Np * 8 + Mp * 4 + Np * 4),
            transcendentals=B * Mp * Np,
        ),
        interpret=interpret,
    )(
        x_len.astype(jnp.float32),
        y_len.astype(jnp.float32),
        cost_p,
        x_pad_p,
        y_pad_p,
    )
    return out[:, :N, :M]
