"""Pipeline parallelism over the transformer layer stacks ("pp").

TPU-native addition — the reference has NO pipeline parallelism (its only
parallelism is DDP data parallelism, `train.py:222-225`; SURVEY §2.7 lists
pp as explicitly absent). Here the towers' stacked [L, ...] parameter layout
makes pp natural: the L axis is sharded over a 'pp' mesh axis (each device
holds L/pp contiguous layers), and the forward runs a GPipe schedule inside
`jax.shard_map`. With the fused pallas kernels requested and the batch
divisible by dp the shard_map is manual over BOTH {pp, dp} — each device's
body sees its local batch shard, so the kernels run directly on it;
otherwise it is manual over 'pp' only and GSPMD keeps auto-sharding the
batch over 'dp' inside the pipeline body (einsum attention — a pallas
custom call cannot be GSPMD-partitioned):

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
    sharded over 'pp' (`shard_params_pp`). x: [B, S, W]. Dispatch on the
    batch axis: with pallas kernels requested and B divisible by dp the
    shard_map goes manual over {pp, dp} (`manual_dp` — local shards, kernels
    active, microbatches split the PER-DEVICE batch); otherwise manual over
    'pp' only, with GSPMD partitioning the per-stage compute over 'dp'
    inside the body (einsum attention).
    """
    from clip_event_tpu.models import layers as L

    pp = dict(mesh.shape).get(PIPE_AXIS, 1)
    Ltot = jax.tree.leaves(stacked_params)[0].shape[0]
    if pp == 1 or Ltot % pp:
        raise ValueError(f"layers={Ltot} not divisible by pp={pp}")
    B, S, W = x.shape

    dp = dict(mesh.shape).get(DATA_AXIS, 1)
    kind, amesh = (impl, None) if isinstance(impl, str) or impl is None else impl
    lkind = ln if isinstance(ln, str) or ln is None else ln[0]
    # GSPMD cannot partition a pallas custom call, so a kernel inside a
    # pp-manual/dp-auto body would block the batch sharding. The fix is to
    # make the batch axis MANUAL too: shard_map over {pp, dp} hands each
    # device its local [B/dp] shard and the fused kernels run directly on
    # it (bitwise-identical per-example math — the tower has no cross-batch
    # collectives). Requires the global batch to divide dp; otherwise fall
    # back to dp-auto with the einsum path (GSPMD partitions that).
    manual_dp = dp > 1 and B % dp == 0 and (kind == "pallas" or lkind == "pallas")
    local_B = B // dp if manual_dp else B
    M = _pick_microbatches(local_B, microbatches)
    mb = local_B // M

    if kind == "pallas":
        inner_impl = ("pallas", None) if dp == 1 or manual_dp else "xla"
    else:
        inner_impl = "xla"
    # same dispatch rule for the fused LN kernels
    inner_ln = ("pallas", None) if lkind == "pallas" and (dp == 1 or manual_dp) else "xla"
    manual_axes = (PIPE_AXIS, DATA_AXIS) if manual_dp else (PIPE_AXIS,)
    # vma checking is off on the manual-dp path for the same reason as
    # ops/attention_pallas.sharded_attention: pallas_call bodies don't
    # track varying-mesh-axes (interpret mode rejects the mixed avals).
    check_vma = not manual_dp

    def body(x_full, params_local):
        idx = jax.lax.axis_index(PIPE_AXIS)
        xs = x_full.reshape(M, mb, S, W)

        def stage(h):
            return L._scan_transformer(
                h, params_local, num_heads, attn_bias,
                remat=remat, unroll=unroll, impl=inner_impl, ln=inner_ln,
            )

        varying = (  # noqa: E731
            (lambda a: jax.lax.pcast(a, manual_axes, to="varying"))
            if check_vma
            else (lambda a: a)
        )
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
        return out.reshape(local_B, S, W)

    pspec = jax.tree.map(lambda _: P(PIPE_AXIS), stacked_params)
    xspec = P(DATA_AXIS) if manual_dp else P()
    return jax.shard_map(
        body,
        mesh=mesh,
        axis_names=set(manual_axes),
        in_specs=(xspec, pspec),
        out_specs=xspec,
        check_vma=check_vma,
    )(x, stacked_params)
