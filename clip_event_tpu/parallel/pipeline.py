"""Pipeline parallelism over the transformer layer stacks ("pp").

TPU-native addition — the reference has NO pipeline parallelism (its only
parallelism is DDP data parallelism, `train.py:222-225`; SURVEY §2.7 lists
pp as explicitly absent). Here the towers' stacked [L, ...] parameter layout
makes pp natural: the L axis is sharded over a 'pp' mesh axis (each device
holds L/pp contiguous layers), and the forward runs a GPipe schedule inside
`jax.shard_map` — manual over 'pp' only, so GSPMD keeps auto-sharding the
batch over 'dp' inside the pipeline body:

  tick t:  stage 0 injects microbatch t; every stage runs its L/pp layers on
           its current activation block; activations rotate stage→stage+1 via
           `ppermute` over ICI; the last stage collects finished microbatches.

M microbatches drain in M + pp - 1 ticks (bubble fraction (pp-1)/(M+pp-1)).
The whole loop is a `lax.scan`, so jax autodiff produces the reverse
pipeline for the backward (ppermute transposes to the inverse rotation) —
no hand-written backward schedule. Per-device parameter HBM divides by pp;
activations stay one microbatch wide per stage.

When to use: CLIP towers fit one chip, so dp (+tp for ViT-L/14) is the
first-choice scaling story; pp exists for the regime dp/tp can't reach —
param-dominated memory at tiny per-chip batches, or meshes whose second
axis has slow ICI (pp's point-to-point ppermute tolerates slow links far
better than tp's all-reduces). Correctness is proven on the virtual CPU
mesh (`tests/test_pipeline.py`) and jitted in the driver dry run; no real
multi-chip timing is possible on this one-chip host.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clip_event_tpu.parallel.mesh import DATA_AXIS

PIPE_AXIS = "pp"


def make_mesh_pp(pp: int, dp: Optional[int] = None) -> Mesh:
    """(dp × pp) mesh; dp defaults to n_devices // pp."""
    devices = jax.devices()
    if dp is None:
        dp = len(devices) // pp
    return Mesh(np.asarray(devices[: dp * pp]).reshape(dp, pp), (DATA_AXIS, PIPE_AXIS))


def _is_stacked_transformer_leaf(path, leaf, pp: int) -> bool:
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    if not any(k in ("transformer", "text_transformer") for k in keys):
        return False
    shape = getattr(leaf, "shape", None)
    return bool(shape) and shape[0] % pp == 0


def pipeline_param_shardings(params, mesh: Mesh):
    """NamedSharding pytree: every stacked transformer leaf partitioned on its
    leading L axis over 'pp' (when divisible); everything else — embeddings,
    projections, LayerNorm finals, the ResNet tower — replicates."""
    pp = dict(mesh.shape).get(PIPE_AXIS, 1)

    def one(path, leaf):
        if pp > 1 and _is_stacked_transformer_leaf(path, leaf, pp):
            return NamedSharding(mesh, P(PIPE_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params_pp(params, mesh: Mesh):
    """device_put the params with the pipeline layer-sharded layout."""
    return jax.device_put(params, pipeline_param_shardings(params, mesh))


def _pick_microbatches(batch: int, requested: int) -> int:
    """Largest divisor of `batch` ≤ requested (static shapes: trace-time)."""
    m = max(1, min(requested, batch))
    while batch % m:
        m -= 1
    return m


def pipelined_transformer(
    x: jnp.ndarray,
    stacked_params: dict,
    num_heads: int,
    attn_bias: Optional[jnp.ndarray],
    mesh: Mesh,
    microbatches: int = 4,
    remat=False,
    unroll=None,
    impl=None,
    ln=None,
) -> jnp.ndarray:
    """GPipe forward/backward over the 'pp' mesh axis.

    Drop-in for `layers.transformer` when the stacked params' L axis is
    sharded over 'pp' (`shard_params_pp`). x: [B, S, W]; the dp sharding of
    the batch (if any) passes straight through — shard_map here is manual
    over 'pp' ONLY, and GSPMD keeps partitioning the per-stage compute over
    'dp' inside the body.
    """
    from clip_event_tpu.models import layers as L

    pp = dict(mesh.shape).get(PIPE_AXIS, 1)
    Ltot = jax.tree.leaves(stacked_params)[0].shape[0]
    if pp == 1 or Ltot % pp:
        raise ValueError(f"layers={Ltot} not divisible by pp={pp}")
    B, S, W = x.shape
    M = _pick_microbatches(B, microbatches)
    mb = B // M

    dp = dict(mesh.shape).get(DATA_AXIS, 1)
    kind, amesh = (impl, None) if isinstance(impl, str) or impl is None else impl
    if kind == "pallas":
        # inside the pp-manual body the fused kernel can be called directly
        # only when nothing else needs partitioning; with dp>1 the custom
        # call would block GSPMD's batch sharding, so use the einsum path
        # (which GSPMD partitions over dp) — see tests/test_pipeline.py
        inner_impl = ("pallas", None) if dp == 1 else "xla"
    else:
        inner_impl = "xla"
    # same reasoning for the fused LN kernels
    lkind = ln if isinstance(ln, str) or ln is None else ln[0]
    inner_ln = ("pallas", None) if lkind == "pallas" and dp == 1 else "xla"

    def body(x_full, params_local):
        idx = jax.lax.axis_index(PIPE_AXIS)
        xs = x_full.reshape(M, mb, S, W)

        def stage(h):
            return L._scan_transformer(
                h, params_local, num_heads, attn_bias,
                remat=remat, unroll=unroll, impl=inner_impl, ln=inner_ln,
            )

        varying = lambda a: jax.lax.pcast(a, (PIPE_AXIS,), to="varying")  # noqa: E731
        state = varying(jnp.zeros((mb, S, W), x_full.dtype))
        buf = varying(jnp.zeros((M, mb, S, W), x_full.dtype))

        def tick(carry, t):
            state, buf = carry
            # stage 0 injects microbatch t (clamped reads in the drain tail
            # recompute xs[M-1]; those results never reach the last stage)
            inject = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            state = jnp.where(idx == 0, inject, state)
            out = stage(state)
            # the last stage finishes microbatch t-(pp-1) at tick t
            m_out = t - (pp - 1)
            j = jnp.clip(m_out, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(buf, j, 0, keepdims=False)
            write = jnp.logical_and(idx == pp - 1, m_out >= 0)
            buf = jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(write, out, cur), j, 0
            )
            state = jax.lax.ppermute(
                out, PIPE_AXIS, [(i, (i + 1) % pp) for i in range(pp)]
            )
            return (state, buf), None

        (state, buf), _ = jax.lax.scan(
            tick, (state, buf), jnp.arange(M + pp - 1)
        )
        # results live on the last stage only; broadcast so every stage
        # returns the (pp-invariant) full output
        out = jax.lax.psum(
            jnp.where(idx == pp - 1, buf, jnp.zeros_like(buf)), PIPE_AXIS
        )
        return out.reshape(B, S, W)

    pspec = jax.tree.map(lambda _: P(PIPE_AXIS), stacked_params)
    return jax.shard_map(
        body,
        mesh=mesh,
        axis_names={PIPE_AXIS},
        in_specs=(P(), pspec),
        out_specs=P(),
    )(x, stacked_params)
