"""Functional building blocks shared by the vision and text towers.

Params are plain pytrees (nested dicts of jnp arrays); every function is pure
and jit-safe. Transformer layers are *stacked* along a leading L axis and run
under `lax.scan` — one compiled block instead of L unrolled copies, which is
the XLA-friendly formulation (reference keeps L separate torch modules,
`model_clip.py:203-211`).

Numerics: LayerNorm always runs in float32 ("fp32 island", reference
`model_clip.py:157-163`); matmuls run in the caller's compute dtype with
float32 accumulation (`preferred_element_type`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


def layer_norm(x: jnp.ndarray, params: dict, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis, computed in float32, cast back."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) — CLIP's GELU approximation."""
    return x * jax.nn.sigmoid(1.702 * x)


def linear(x: jnp.ndarray, w, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """y = x @ w (+ b). Weights are stored input-major ([in, out]).

    Accepts either a plain array or an int8 `ops.quant.QuantWeight` (the
    inference-quantized form) — quantized weights route through the
    s8×s8→s32 MXU path."""
    from clip_event_tpu.ops.quant import QuantWeight, quantized_linear

    if isinstance(w, QuantWeight):
        return quantized_linear(x, w, b)
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


# Attention implementation switch: "xla" (einsum, default) or "pallas"
# (fused VMEM-resident kernel, ops.attention_pallas). Set BEFORE tracing the
# train/eval step — jit caches the traced choice.
#
# IMPORTANT: the global is resolved ONCE at the top of `transformer` and then
# threaded down as an explicit static argument. It must never be read inside
# a `jax.checkpoint`-wrapped function: checkpoint caches the traced jaxpr
# keyed on (function, avals, static args), so a hidden global read bakes in
# whichever impl traced FIRST for every later remat trace in the process —
# the bug that made the round-1 kernel benchmarks silently measure the XLA
# graph twice ("exact parity").
_ATTENTION_IMPL = "xla"
_ATTENTION_MESH = None  # jax.sharding.Mesh for multi-chip shard_map wrapping


def set_attention_impl(impl: str, mesh=None) -> None:
    """Select the attention implementation (and, for "pallas" on a multi-chip
    mesh, the mesh to shard_map the kernel over — GSPMD cannot partition a
    pallas custom call by itself)."""
    global _ATTENTION_IMPL, _ATTENTION_MESH
    if impl not in ("xla", "pallas"):
        raise ValueError("attention impl must be 'xla' or 'pallas'")
    _ATTENTION_IMPL = impl
    _ATTENTION_MESH = mesh


def _resolve_impl():
    """The global impl as a hashable static value: "xla" or ("pallas", mesh).

    Under Megatron tensor parallelism (a 'tp' mesh axis of size > 1) the
    kernel runs head-group-parallel via `sharded_attention_tp` when the
    per-device dims conform (decided per call site in
    `multi_head_attention`, which knows the shapes); non-conforming shapes
    fall back to the einsum path, which GSPMD partitions correctly.
    """
    if _ATTENTION_IMPL != "pallas":
        return "xla"
    mesh = _ATTENTION_MESH
    if mesh is not None and mesh.devices.size == 1:
        mesh = None
    return ("pallas", mesh)


def _absmax(x: jnp.ndarray) -> jnp.ndarray:
    """Scalar abs-max in f32 (static int8 activation calibration)."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


# LayerNorm implementation switch: "xla" (jnp, default) or "pallas" (fused
# one-read kernels, ops.ln_pallas — the per-block LNs run as single VMEM
# passes and the mid-block residual add folds into ln_2's read). Resolved in
# `transformer` and threaded down as a STATIC argument for the same
# remat-cache reason as the attention impl above.
_LN_IMPL = "xla"
_LN_MESH = None


def set_ln_impl(impl: str, mesh=None) -> None:
    """Select the LayerNorm implementation for the transformer blocks (and,
    for "pallas" on a multi-chip mesh, the mesh to shard_map the kernels
    over). Call BEFORE tracing the step — jit caches the traced choice."""
    global _LN_IMPL, _LN_MESH
    if impl not in ("xla", "pallas"):
        raise ValueError("ln impl must be 'xla' or 'pallas'")
    _LN_IMPL = impl
    _LN_MESH = mesh


def _resolve_ln():
    """The global LN impl as a hashable static value: "xla" or ("pallas",
    mesh-or-None)."""
    if _LN_IMPL != "pallas":
        return "xla"
    mesh = _LN_MESH
    if mesh is not None and mesh.devices.size == 1:
        mesh = None
    return ("pallas", mesh)


_LN_FALLBACK_WARNED: set = set()


def _ln_fallback_warn(reason: str) -> None:
    """Surface (once per reason per process) that a use_pallas_ln request is
    being ignored for the current config — the fallback is benign (the
    kernel is measured slower anyway, PERFORMANCE.md) but should not be
    silent for future sweeps. Fires at trace time, not per step."""
    if reason in _LN_FALLBACK_WARNED:
        return
    _LN_FALLBACK_WARNED.add(reason)
    import logging

    logging.getLogger(__name__).warning(
        "use_pallas_ln requested but the pallas LN kernels will NOT run: %s "
        "(falling back to the XLA LayerNorm)", reason
    )


def _block_ln_plan(ln, x, sp, act_stats):
    """Decide the LN path for one residual block: "xla", or ("pallas",
    shard_args-or-None). Falls back to XLA when the width isn't 128-lane
    tiled, under sequence parallelism (the stream's sequence axis is
    tp-sharded — the row-parallel kernel would need a different shard_map),
    during calibration passes, or when the batch doesn't divide the mesh."""
    kind, mesh = (ln, None) if isinstance(ln, str) else ln
    if kind != "pallas":
        return "xla"
    if sp is not None:
        _ln_fallback_warn("sequence parallelism shards the stream's "
                          "sequence axis over tp")
        return "xla"
    if act_stats is not None:
        return "xla"  # calibration pass — intentional, transient
    if x.shape[-1] % 128:
        _ln_fallback_warn(f"width {x.shape[-1]} is not 128-lane tiled")
        return "xla"
    if mesh is None:
        return ("pallas", None)
    from clip_event_tpu.parallel.mesh import DATA_AXIS, data_axes, data_size

    if DATA_AXIS not in mesh.axis_names or x.shape[0] % data_size(mesh):
        _ln_fallback_warn(
            f"batch {x.shape[0]} does not divide the mesh's data axes "
            f"({dict(mesh.shape)})"
        )
        return "xla"
    axes = data_axes(mesh)
    return ("pallas", (mesh, axes if len(axes) > 1 else axes[0]))


def _ln_apply(x, p, plan):
    """LayerNorm by a `_block_ln_plan` decision."""
    if plan == "xla":
        return layer_norm(x, p)
    from clip_event_tpu.ops.ln_pallas import layer_norm_pallas, sharded_ln

    _, shard = plan
    if shard is None:
        return layer_norm_pallas(x, p["scale"], p["bias"])
    mesh, axis = shard
    return sharded_ln(
        lambda t, s, b: layer_norm_pallas(t, s, b),
        (x, p["scale"], p["bias"]), mesh, axis,
    )


def _add_ln_apply(res, delta, p, plan):
    """(res + delta, LayerNorm(res + delta)) by a `_block_ln_plan` decision —
    the fused kernel folds the residual add into the LN's single read."""
    if plan == "xla":
        x = res + delta
        return x, layer_norm(x, p)
    from clip_event_tpu.ops.ln_pallas import add_layer_norm_pallas, sharded_ln

    _, shard = plan
    if shard is None:
        return add_layer_norm_pallas(res, delta, p["scale"], p["bias"])
    mesh, axis = shard
    return sharded_ln(
        lambda r, d, s, b: add_layer_norm_pallas(r, d, s, b),
        (res, delta, p["scale"], p["bias"]), mesh, axis, n_outs=2,
    )


def multi_head_attention(
    x: jnp.ndarray,
    params: dict,
    num_heads: int,
    attn_bias: Optional[jnp.ndarray] = None,
    impl: Optional[str] = None,
    act_stats: Optional[dict] = None,
) -> jnp.ndarray:
    """Self-attention with packed QKV projection.

    x: [B, S, W]; params: qkv_w [W, 3W], qkv_b [3W], out_w [W, W], out_b [W].
    attn_bias: optional additive [S, S] mask (e.g. causal -inf upper triangle).
    """
    B, S, W = x.shape
    head_dim = W // num_heads
    scale = head_dim**-0.5
    if impl is None:
        impl = _resolve_impl()
    kind, mesh = (impl, None) if isinstance(impl, str) else impl
    if act_stats is not None:
        act_stats["qkv_w"] = _absmax(x)

    qkv = linear(x, params["qkv_w"], params["qkv_b"])  # [B, S, 3W]

    from clip_event_tpu.ops.attention_pallas import (
        fused_attention_supported,
        head_grid_supported,
    )

    tp = (
        dict(zip(mesh.axis_names, mesh.devices.shape)).get("tp", 1)
        if mesh is not None
        else 1
    )
    if kind == "pallas" and tp > 1:
        # Megatron tp: run the kernel head-group-parallel over (dp, tp) when
        # the per-device dims conform; otherwise einsum (GSPMD-partitioned).
        from clip_event_tpu.ops.attention_pallas import (
            fused_attention_qkv,
            fused_attention_qkv_headgrid,
            sharded_attention_tp,
        )
        from clip_event_tpu.parallel.mesh import DATA_AXIS, data_axes, data_size

        dp = data_size(mesh) if DATA_AXIS in mesh.axis_names else 0
        wl, hl = W // tp, num_heads // tp
        kernel_fn = None
        if W % tp == 0 and num_heads % tp == 0 and dp > 0 and B % dp == 0:
            if fused_attention_supported(S, wl, hl):
                kernel_fn = fused_attention_qkv
            elif head_grid_supported(S, wl, hl):
                kernel_fn = fused_attention_qkv_headgrid
        if kernel_fn is None:
            kind = "xla"
        else:
            axes = data_axes(mesh)
            out = sharded_attention_tp(
                kernel_fn, qkv, attn_bias, num_heads, scale, mesh,
                axes if len(axes) > 1 else axes[0], "tp",
            )
            out = checkpoint_name(out, "attn_core_out")
            if act_stats is not None:
                act_stats["out_w"] = _absmax(out)
            return linear(out, params["out_w"], params["out_b"])

    if kind == "pallas" and not fused_attention_supported(S, W, num_heads):
        # whole-width block doesn't fit VMEM (ViT-L/14 vision S=257,
        # ViT-B/16 vision S=197): use the head-gridded kernel (H× smaller
        # working set), or the einsum path if even one head is too big
        kind = "pallas_hg" if head_grid_supported(S, W, num_heads) else "xla"

    if kind in ("pallas", "pallas_hg"):
        # Fused VMEM-resident attention core: consumes the packed projection
        # directly (heads sliced inside the kernel), returns the concatenated
        # [B, S, W] the out-projection wants — no HLO transposes, no
        # logits/probs HBM round trip.
        from clip_event_tpu.ops.attention_pallas import (
            fused_attention_qkv,
            fused_attention_qkv_headgrid,
            sharded_attention,
        )
        from clip_event_tpu.parallel.mesh import DATA_AXIS, data_axes

        kernel_fn = fused_attention_qkv if kind == "pallas" else fused_attention_qkv_headgrid
        if mesh is not None and DATA_AXIS in mesh.axis_names and B % mesh.devices.size == 0:
            axes = data_axes(mesh)
            out = sharded_attention(
                kernel_fn, qkv, attn_bias, num_heads, scale, mesh,
                axes if len(axes) > 1 else axes[0],
            )
        else:
            out = kernel_fn(qkv, attn_bias, num_heads, scale)
        out = checkpoint_name(out, "attn_core_out")
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            return t.reshape(B, S, num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        if attn_bias is not None:
            logits = logits + attn_bias.astype(logits.dtype)
        weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, W)
        out = checkpoint_name(out, "attn_core_out")
    if act_stats is not None:
        act_stats["out_w"] = _absmax(out)
    return linear(out, params["out_w"], params["out_b"])


def residual_block(
    x: jnp.ndarray,
    params: dict,
    num_heads: int,
    attn_bias: Optional[jnp.ndarray] = None,
    impl: str = "xla",
    act_stats: Optional[dict] = None,
    sp=None,
    ln: str = "xla",
) -> jnp.ndarray:
    """Pre-LN transformer block: MHA + QuickGELU MLP, both residual.

    `act_stats`: when a dict is passed, the scalar abs-max of every dense
    input is recorded into it, nested to mirror the param tree
    ({"attn": {qkv_w, out_w}, "mlp": {fc_w, proj_w}}) — the calibration
    hook for static int8 activation scales (`ops/quant.py`). None (the
    default) leaves the hot path untouched.

    `sp`: optional NamedSharding for the residual stream (Megatron sequence
    parallelism — see `set_sequence_parallel`). Applied after each residual
    add, so the LayerNorm passes and residual arithmetic run with the
    sequence axis sharded over tp; GSPMD turns the row-parallel projections'
    psum into a reduce-scatter and all-gathers before the column-parallel
    ones. Identity in math."""

    def _c(t):
        return t if sp is None else jax.lax.with_sharding_constraint(t, sp)

    if act_stats is not None:
        act_stats["attn"] = {}
        act_stats["mlp"] = {}
    ln_plan = _block_ln_plan(ln, x, sp, act_stats)
    a = multi_head_attention(
        _ln_apply(x, params["ln_1"], ln_plan), params["attn"], num_heads,
        attn_bias, impl, None if act_stats is None else act_stats["attn"],
    )
    if ln_plan == "xla":
        x = _c(x + a)
        h = layer_norm(x, params["ln_2"])
    else:
        x, h = _add_ln_apply(x, a, params["ln_2"], ln_plan)
    if act_stats is not None:
        act_stats["mlp"]["fc_w"] = _absmax(h)
    h = linear(h, params["mlp"]["fc_w"], params["mlp"]["fc_b"])
    h = quick_gelu(h)
    if act_stats is not None:
        act_stats["mlp"]["proj_w"] = _absmax(h)
    h = linear(h, params["mlp"]["proj_w"], params["mlp"]["proj_b"])
    return _c(x + h)


# Scan-unroll policy for the layer stack. Full unroll wins ~8-15% on the
# isolated tower gradient but LOSES ~4% on the full train step and doubles
# compile time (PERFORMANCE.md "Scan unroll"), so the default stays 1.
# Resolved in `transformer` (never inside the checkpointed block — see the
# attention-impl cache note above).
_SCAN_UNROLL = 1


def set_scan_unroll(unroll) -> None:
    """1 (rolled scan, fastest compile), an int factor, or "full"."""
    global _SCAN_UNROLL
    _SCAN_UNROLL = unroll


# Sequence-parallel context: a NamedSharding for the transformer residual
# stream ([B, S, W] → P(batch_axes, 'tp', None)), or None. Under Megatron
# tensor parallelism the LayerNorms and residual adds are otherwise
# replicated work — every tp device computes the full [B, S, W] stream.
# Constraining the stream's SEQUENCE axis over 'tp' at the block boundaries
# (Megatron sequence parallelism, Korthikanti et al. 2022) makes GSPMD run
# them 1/tp-sized: the row-parallel out/proj matmuls' all-reduce becomes a
# reduce-scatter and the column-parallel qkv/fc matmuls re-gather — same
# collective bytes, tp× less LN/residual compute and activation memory.
# Like the attention impl, resolved ONCE in `transformer` and threaded down
# as a static argument (NamedSharding is hashable) — never read inside the
# checkpointed block.
_SEQUENCE_PARALLEL = None


def set_sequence_parallel(mesh=None) -> None:
    """Enable (mesh with a >1 'tp' axis) or disable (None) Megatron sequence
    parallelism for every subsequent transformer trace. Call BEFORE tracing
    the step — jit caches the traced choice."""
    global _SEQUENCE_PARALLEL
    if mesh is None:
        _SEQUENCE_PARALLEL = None
        return
    from jax.sharding import NamedSharding, PartitionSpec

    from clip_event_tpu.parallel.mesh import data_axes
    from clip_event_tpu.parallel.sharding import TENSOR_AXIS

    if (
        TENSOR_AXIS not in mesh.axis_names
        or dict(zip(mesh.axis_names, mesh.devices.shape))[TENSOR_AXIS] <= 1
    ):
        raise ValueError("sequence parallelism requires a 'tp' mesh axis of size > 1")
    axes = data_axes(mesh)
    batch = axes if len(axes) > 1 else axes[0]
    _SEQUENCE_PARALLEL = NamedSharding(
        mesh, PartitionSpec(batch, TENSOR_AXIS, None)
    )


# Pipeline-parallel context: (mesh with a 'pp' axis, microbatch count).
# Set by train.py when config "pp" > 1; `transformer` then runs the stacked
# layers through the GPipe schedule in `parallel.pipeline` for every stack
# whose L axis divides pp (others fall back to the plain scan — their
# params replicate over pp by `pipeline_param_shardings`' same rule).
_PIPELINE = None


def set_pipeline(mesh=None, microbatches: int = 4) -> None:
    """Enable (mesh with a 'pp' axis) or disable (None) pipeline parallelism.

    Like `set_attention_impl`, call BEFORE tracing the step — jit caches the
    traced choice."""
    global _PIPELINE
    if mesh is None:
        _PIPELINE = None
        return
    from clip_event_tpu.parallel.pipeline import PIPE_AXIS

    if PIPE_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh has no '{PIPE_AXIS}' axis: {mesh.axis_names}")
    _PIPELINE = (mesh, int(microbatches))


# remat mode → jax.checkpoint policy. True/'full' recomputes everything
# (minimum memory); 'dots' saves every matmul output (no matmul recompute,
# max memory); 'dots_nobatch' excludes the batched attention einsums;
# 'attn' saves only each block's attention-core output ([B, S, W] per layer
# — small) so the backward never re-runs the attention forward.
_REMAT_POLICIES = {
    "full": lambda: jax.checkpoint_policies.nothing_saveable,
    "dots": lambda: jax.checkpoint_policies.dots_saveable,
    "dots_nobatch": lambda: jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    "attn": lambda: jax.checkpoint_policies.save_only_these_names("attn_core_out"),
}


def transformer(
    x: jnp.ndarray,
    stacked_params: dict,
    num_heads: int,
    attn_bias: Optional[jnp.ndarray] = None,
    remat=False,
    unroll=None,
    impl: Optional[str] = None,
    ln=None,
) -> jnp.ndarray:
    """Run a stack of residual blocks via lax.scan over the leading L axis.

    `remat`: False (save all activations), True/'full' (recompute each block
    in the backward pass — O(one layer) activation memory, the standard TPU
    HBM/FLOPs trade), or a policy name from `_REMAT_POLICIES` for selective
    saving.

    The attention impl is resolved HERE (global default) and passed down as a
    static argument so `jax.checkpoint`'s jaxpr cache is keyed on it.

    Under an active pipeline context (`set_pipeline`) the stack instead runs
    the GPipe schedule over the 'pp' mesh axis whenever the L axis divides
    the pp degree (`parallel.pipeline.pipelined_transformer`).
    """
    if impl is None:
        impl = _resolve_impl()
    if ln is None:
        ln = _resolve_ln()
    if _PIPELINE is not None and x.ndim == 3:
        mesh, microbatches = _PIPELINE
        pp = dict(mesh.shape).get("pp", 1)
        n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
        if pp > 1 and n_layers % pp == 0:
            from clip_event_tpu.parallel.pipeline import pipelined_transformer

            return pipelined_transformer(
                x, stacked_params, num_heads, attn_bias, mesh,
                microbatches=microbatches, remat=remat, unroll=unroll,
                impl=impl, ln=ln,
            )
    return _scan_transformer(
        x, stacked_params, num_heads, attn_bias,
        remat=remat, unroll=unroll, impl=impl, ln=ln,
    )


def _scan_transformer(
    x: jnp.ndarray,
    stacked_params: dict,
    num_heads: int,
    attn_bias: Optional[jnp.ndarray] = None,
    remat=False,
    unroll=None,
    impl=None,
    ln=None,
) -> jnp.ndarray:
    """The plain stacked-layer scan (no pipeline dispatch) — also the
    per-stage body `parallel.pipeline` runs on each device's local layers."""
    if impl is None:
        impl = _resolve_impl()
    if ln is None:
        ln = _resolve_ln()
    if unroll is None:
        unroll = _SCAN_UNROLL
    if unroll == "full":
        unroll = jax.tree.leaves(stacked_params)[0].shape[0]
    # sequence-parallel residual-stream sharding applies only to the batched
    # 3-D stream (never inside a pipeline stage's shard_map, whose mesh has
    # no 'tp' axis — set_sequence_parallel rejects such meshes up front)
    sp = _SEQUENCE_PARALLEL if x.ndim == 3 and _PIPELINE is None else None
    block = residual_block
    if remat:
        mode = "full" if remat is True else str(remat)
        if mode not in _REMAT_POLICIES:
            raise ValueError(f"remat mode {mode!r}; options: {list(_REMAT_POLICIES)}")
        block = jax.checkpoint(
            residual_block, policy=_REMAT_POLICIES[mode](),
            static_argnums=(2, 4, 6, 7),
        )

    def body(h, layer_params):
        return block(
            h, layer_params, num_heads, attn_bias, impl, None, sp, ln
        ), None

    if sp is not None:
        x = jax.lax.with_sharding_constraint(x, sp)
    out, _ = jax.lax.scan(body, x, stacked_params, unroll=unroll)
    return out


def transformer_with_act_stats(
    x: jnp.ndarray,
    stacked_params: dict,
    num_heads: int,
    attn_bias: Optional[jnp.ndarray] = None,
):
    """`transformer` forward that ALSO returns per-layer dense-input abs-max
    stats via scan ys — a dict mirroring the stacked param tree
    ({"attn": {qkv_w: [L], out_w: [L]}, "mlp": {fc_w: [L], proj_w: [L]}}),
    the calibration pass for static int8 activation scales. Always the XLA
    attention path, no remat. Forward output is identical to
    `transformer(..., impl="xla")` (`tests/test_quant.py` asserts it)."""

    def body(h, layer_params):
        stats: dict = {}
        h = residual_block(h, layer_params, num_heads, attn_bias, "xla", stats)
        return h, stats

    out, stats = jax.lax.scan(body, x, stacked_params)
    return out, stats


def causal_mask(seq_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask: 0 on/below diagonal, -inf above."""
    mask = jnp.triu(jnp.full((seq_len, seq_len), -jnp.inf, dtype=dtype), k=1)
    return mask


# ------------------------------------------------------------------ init


def init_layer_norm(width: int) -> dict:
    return {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))}


def init_transformer(rng: jax.Array, layers: int, width: int) -> dict:
    """Reference init scheme (`model_clip.py:365-372`), stacked along L."""
    proj_std = (width**-0.5) * ((2 * layers) ** -0.5)
    attn_std = width**-0.5
    fc_std = (2 * width) ** -0.5
    keys = jax.random.split(rng, 4)

    def stack_ln():
        return {
            "scale": jnp.ones((layers, width)),
            "bias": jnp.zeros((layers, width)),
        }

    return {
        "attn": {
            "qkv_w": attn_std * jax.random.normal(keys[0], (layers, width, 3 * width)),
            "qkv_b": jnp.zeros((layers, 3 * width)),
            "out_w": proj_std * jax.random.normal(keys[1], (layers, width, width)),
            "out_b": jnp.zeros((layers, width)),
        },
        "ln_1": stack_ln(),
        "mlp": {
            "fc_w": fc_std * jax.random.normal(keys[2], (layers, width, 4 * width)),
            "fc_b": jnp.zeros((layers, 4 * width)),
            "proj_w": proj_std * jax.random.normal(keys[3], (layers, 4 * width, width)),
            "proj_b": jnp.zeros((layers, width)),
        },
        "ln_2": stack_ln(),
    }
