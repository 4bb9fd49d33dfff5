"""Tensor-parallel parameter sharding over a (dp, tp) mesh.

Megatron-style column/row partitioning of every transformer stack, expressed
purely as GSPMD sharding annotations — XLA inserts the reduce-scatter /
all-gather collectives over ICI; the model code doesn't change:

  qkv_w  [L, W, 3W]  → P(None, None, 'tp')   (column parallel)
  qkv_b  [L, 3W]     → P(None, 'tp')
  out_w  [L, W, W]   → P(None, 'tp', None)   (row parallel)
  fc_w   [L, W, 4W]  → P(None, None, 'tp')
  fc_b   [L, 4W]     → P(None, 'tp')
  proj_w [L, 4W, W]  → P(None, 'tp', None)
  token_embedding [V, W] → P('tp', None)     (vocab parallel)

Everything else (LayerNorms, positional embeddings, projections, the whole
ResNet tower) replicates. This is the stretch parallelism for ViT-L/14+
(SURVEY §2.7); batches stay sharded over 'dp' only.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clip_event_tpu.parallel.mesh import DATA_AXIS

TENSOR_AXIS = "tp"

# leaf-name → PartitionSpec inside any stacked transformer subtree
_TRANSFORMER_RULES = {
    "qkv_w": P(None, None, TENSOR_AXIS),
    "qkv_b": P(None, TENSOR_AXIS),
    "out_w": P(None, TENSOR_AXIS, None),
    "out_b": P(),
    "fc_w": P(None, None, TENSOR_AXIS),
    "fc_b": P(None, TENSOR_AXIS),
    "proj_w": P(None, TENSOR_AXIS, None),
    "proj_b": P(),
}


def make_mesh_2d(dp: Optional[int] = None, tp: int = 1, dcn: int = 1) -> Mesh:
    """(dp × tp) mesh; dp defaults to n_devices // (tp·dcn).

    `dcn>1` prepends a slice axis — mesh (dcn, dp, tp) — so the
    data-parallel gradient reduction decomposes hierarchically (ICI within
    each slice, DCN across slices; see `mesh.DCN_AXIS`) while the Megatron
    tp collectives stay strictly intra-slice on the innermost (fastest) axis.
    """
    import numpy as np

    from clip_event_tpu.parallel.mesh import DCN_AXIS

    devices = jax.devices()
    dcn = int(dcn)
    if dp is None:
        dp = len(devices) // (tp * dcn)
    if dcn <= 1:
        devices = np.asarray(devices[: dp * tp]).reshape(dp, tp)
        return Mesh(devices, (DATA_AXIS, TENSOR_AXIS))
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    if len(slice_ids) > 1:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp, tp), dcn_mesh_shape=(dcn, 1),
            devices=devices[: dcn * dp * tp],
        ).reshape(dcn, dp, tp)
    else:
        dev_array = np.asarray(devices[: dcn * dp * tp]).reshape(dcn, dp, tp)
    return Mesh(dev_array, (DCN_AXIS, DATA_AXIS, TENSOR_AXIS))


def _spec_for_path(path) -> P:
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    in_transformer = any(k in ("transformer", "text_transformer") for k in keys)
    leaf = keys[-1]
    if in_transformer and leaf in _TRANSFORMER_RULES:
        return _TRANSFORMER_RULES[leaf]
    if leaf == "token_embedding":
        return P(TENSOR_AXIS, None)
    return P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params` (tp rules when the mesh has
    a 'tp' axis of size > 1, otherwise fully replicated)."""
    has_tp = TENSOR_AXIS in mesh.axis_names and mesh.shape[TENSOR_AXIS] > 1

    def one(path, leaf):
        spec = _spec_for_path(path) if has_tp else P()
        # drop annotations that don't divide the axis (e.g. tiny test configs)
        if has_tp and spec != P():
            shape = getattr(leaf, "shape", None)
            tp = mesh.shape[TENSOR_AXIS]
            for dim, name in enumerate(spec):
                if name == TENSOR_AXIS and (shape is None or shape[dim] % tp != 0):
                    spec = P()
                    break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh):
    """device_put the params with tensor-parallel layout."""
    return jax.device_put(params, param_shardings(params, mesh))


def _dp_leaf_sharding(leaf, mesh: Mesh, dp: int, min_size: int) -> NamedSharding:
    """The shared ZeRO partitioning rule for one leaf: keep any existing spec
    dims (tp annotations), then add the DATA axis on the LARGEST
    still-unsharded dimension divisible by dp. Scalars, small leaves
    (< min_size elements), and leaves with no divisible dim replicate.
    Deterministic in the leaf SHAPE alone, so a param and its same-shaped
    Adam moments always land on the same dim (shard-local updates)."""
    shape = getattr(leaf, "shape", None)
    if shape is None or dp <= 1:
        return NamedSharding(mesh, P())
    current = getattr(leaf, "sharding", None)
    if isinstance(current, NamedSharding) and current.mesh == mesh:
        spec = list(current.spec) + [None] * (len(shape) - len(current.spec))
    else:
        spec = [None] * len(shape)
    def _axes(entry):
        return entry if isinstance(entry, tuple) else (entry,)

    if any(DATA_AXIS in _axes(e) for e in spec if e is not None):
        # already dp-sharded (e.g. moments that inherited FSDP param
        # shardings through optimizer.init) — keep as-is
        return NamedSharding(mesh, P(*spec))
    size = 1
    for d in shape:
        size *= d
    if size < min_size:
        return NamedSharding(mesh, P(*spec))
    candidates = [
        (shape[d], d)
        for d in range(len(shape))
        if spec[d] is None and shape[d] % dp == 0
    ]
    if candidates:
        _, d = max(candidates)
        spec[d] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def zero_opt_shardings(opt_state, mesh: Mesh, min_size: int = 1024):
    """ZeRO-1 optimizer-state sharding: a NamedSharding pytree for `opt_state`
    that partitions every large moment leaf over the DATA axis.

    The reference replicates Adam moments on every rank (torch DDP keeps a
    full optimizer per GPU); on TPU the moments are 2× the fp32 params —
    the single biggest static HBM consumer after activations. Sharding them
    over `dp` divides that cost by the dp degree; under jit the moment
    update then runs shard-local and GSPMD all-gathers only the final
    parameter *update* (one param-sized gather per step over ICI), which is
    exactly the ZeRO-1 communication shape.
    """
    dp = dict(mesh.shape).get(DATA_AXIS, 1)
    return jax.tree.map(
        lambda leaf: _dp_leaf_sharding(leaf, mesh, dp, min_size), opt_state
    )


def shard_opt_state_zero(opt_state, mesh: Mesh, min_size: int = 1024):
    """device_put the optimizer state with ZeRO-1 dp-sharded moments."""
    return jax.device_put(
        opt_state, zero_opt_shardings(opt_state, mesh, min_size=min_size)
    )


def fsdp_param_shardings(params, mesh: Mesh, min_size: int = 1024):
    """ZeRO-3/FSDP parameter sharding: every large param leaf partitioned
    over the DATA axis by the same largest-divisible-dim rule as the
    ZeRO-1 moments (`_dp_leaf_sharding`), composing with tp annotations.

    Under jit, GSPMD inserts the per-use all-gather of each weight INSIDE
    the layer `lax.scan` (the stacked [L, ...] leaves shard a non-scan dim,
    so the gather follows the per-iteration dynamic-slice) and the backward
    dual reduce-scatters the gradient — grads land sharded, the Adam update
    runs shard-local, and per-device param HBM divides by dp. This is the
    full FSDP communication shape: one all-gather per weight per direction
    per step over ICI instead of a replicated copy per chip. The reference
    has no counterpart (torch DDP replicates, SURVEY §2.7 lists ZeRO/FSDP
    as explicitly absent).
    """
    dp = dict(mesh.shape).get(DATA_AXIS, 1)
    return jax.tree.map(
        lambda leaf: _dp_leaf_sharding(leaf, mesh, dp, min_size), params
    )


def shard_params_fsdp(params, mesh: Mesh, min_size: int = 1024):
    """device_put the params with FSDP dp-sharded layout (keeps tp dims)."""
    return jax.device_put(
        params, fsdp_param_shardings(params, mesh, min_size=min_size)
    )
