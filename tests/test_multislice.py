"""Multi-slice (DCN-hybrid) data parallelism on the virtual 8-device mesh.

`dcn_dp > 1` prepends a 'dcn' mesh axis outside dp (and tp): the batch
shards over dcn×dp and GSPMD decomposes the gradient reduction
hierarchically (ICI within a slice, DCN across slices). The reference's
DDP/NCCL world has no counterpart (SURVEY §2.4 — flat NCCL ring); this is
the jax-native multi-pod scaling recipe. These tests prove the hybrid mesh
is numerically identical to flat dp, that the batch/ZeRO layouts land on
the intended axes, and that the train.py config key works end-to-end.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from clip_event_tpu.engine.train_step import loss_fn  # noqa: E402
from clip_event_tpu.models import init_params  # noqa: E402
from clip_event_tpu.parallel.mesh import (  # noqa: E402
    DATA_AXIS,
    DCN_AXIS,
    batch_sharding,
    data_size,
    make_mesh,
    replicate,
    shard_batch,
)
from clip_event_tpu.parallel.sharding import make_mesh_2d, shard_params  # noqa: E402
from tests.test_model_parity import TINY_VIT  # noqa: E402
from tests.test_train_step import _make_batch  # noqa: E402


def test_hybrid_mesh_shape_and_batch_spec():
    mesh = make_mesh(dcn=2)
    assert mesh.shape == {DCN_AXIS: 2, DATA_AXIS: 4}
    assert data_size(mesh) == 8
    assert batch_sharding(mesh).spec == P((DCN_AXIS, DATA_AXIS))
    # flat mesh keeps the 1-D spec (no behavior change for dcn=1)
    flat = make_mesh()
    assert batch_sharding(flat).spec == P(DATA_AXIS)
    with pytest.raises(ValueError):
        make_mesh(dcn=3)  # does not divide 8


def test_shard_batch_splits_over_both_axes():
    mesh = make_mesh(dcn=2)
    batch = {
        "image": np.zeros((8, 4, 4, 3), np.float32),
        "index_pos": np.zeros((3,), np.int32),  # 3 % 8 != 0 → replicated
    }
    out = shard_batch(batch, mesh)
    img_shards = {s.data.shape for s in out["image"].addressable_shards}
    assert img_shards == {(1, 4, 4, 3)}  # 8 rows / (2 dcn × 4 dp)
    assert out["index_pos"].sharding.is_fully_replicated


def test_dcn_grads_match_flat_dp():
    """Same batch, same params: grads over the (dcn=2, dp=4) mesh equal the
    flat dp=8 mesh's — the hierarchical reduction changes the collective
    decomposition, not the math."""
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(1), cfg)
    batch = _make_batch(cfg, seed=9)

    grad_fn = jax.jit(
        jax.value_and_grad(
            lambda p, b: loss_fn(p, b, cfg, "ce", True, False, False, jnp.float32)[0]
        )
    )

    flat = make_mesh()
    loss_ref, grads_ref = grad_fn(
        replicate(params, flat), shard_batch(batch, flat)
    )

    mesh = make_mesh(dcn=2)
    loss_dcn, grads_dcn = grad_fn(
        replicate(params, mesh), shard_batch(batch, mesh)
    )

    np.testing.assert_allclose(float(loss_ref), float(loss_dcn), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_dcn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_dcn_composes_with_tp():
    """(dcn=2, dp=2, tp=2): Megatron weight sharding on the innermost axis
    under a hybrid mesh still matches unsharded execution."""
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(2), cfg)
    batch = _make_batch(cfg, seed=10)

    grad_fn = jax.jit(
        jax.value_and_grad(
            lambda p, b: loss_fn(p, b, cfg, "ce", True, False, False, jnp.float32)[0]
        )
    )
    loss_ref, grads_ref = grad_fn(params, batch)

    mesh = make_mesh_2d(tp=2, dcn=2)
    assert mesh.shape == {DCN_AXIS: 2, DATA_AXIS: 2, "tp": 2}
    params_tp = shard_params(params, mesh)
    batch_tp = shard_batch(batch, mesh)
    loss_tp, grads_tp = grad_fn(params_tp, batch_tp)

    np.testing.assert_allclose(float(loss_ref), float(loss_tp), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_zero_moments_stay_intra_slice():
    """ZeRO-1 under a hybrid mesh shards moments over the intra-slice dp
    axis ONLY — the per-step update all-gather must ride ICI, never DCN."""
    import optax

    from clip_event_tpu.parallel.sharding import zero_opt_shardings

    params = init_params(jax.random.PRNGKey(3), TINY_VIT)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    mesh = make_mesh(dcn=2)
    shardings = zero_opt_shardings(opt_state, mesh)
    specs = {
        s.spec
        for s in jax.tree.leaves(shardings)
        if isinstance(s, NamedSharding)
    }
    assert any(DATA_AXIS in _flat_axes(sp) for sp in specs)
    assert not any(DCN_AXIS in _flat_axes(sp) for sp in specs)


def _flat_axes(spec):
    out = []
    for e in spec:
        if e is None:
            continue
        out.extend(e) if isinstance(e, tuple) else out.append(e)
    return out


def test_pallas_sharded_attention_over_hybrid_mesh():
    """The shard_map-wrapped attention kernel accepts the (dcn, dp) axis
    tuple: output matches the einsum path on the hybrid mesh."""
    from clip_event_tpu.models import layers as L

    W, H, S, B = 64, 2, 16, 8
    tt = L.init_transformer(jax.random.PRNGKey(4), 2, W)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(B, S, W)), jnp.float32)
    bias = L.causal_mask(S)
    mesh = make_mesh(dcn=2)

    ref = np.asarray(L.transformer(x, tt, H, bias, impl="xla"))
    out = np.asarray(L.transformer(x, tt, H, bias, impl=("pallas", mesh)))
    np.testing.assert_allclose(ref, out, atol=3e-5, rtol=1e-4)


def test_config_validates_dcn_dp():
    from clip_event_tpu.config import ConfigError, validate_config

    base = {"task": "t", "posneg_descriptions_json": "x",
            "image_caption_json": ["x"], "image_dir": ["x"], "ckpt_dir": "x",
            "constrastive_loss": "ce", "batch_size": 2, "lr": 1e-4,
            "optimizer": "adam", "max_epoch": 1}
    assert validate_config(dict(base))["dcn_dp"] == 1
    assert validate_config(dict(base, dcn_dp=2))["dcn_dp"] == 2
    with pytest.raises(ConfigError):
        validate_config(dict(base, dcn_dp=0))
    with pytest.raises(ConfigError):
        validate_config(dict(base, dcn_dp=2, pp=2))


@pytest.mark.slow
def test_train_cli_dcn_end_to_end(tmp_path):
    """`train.py --cfg` with dcn_dp=2 trains on the (dcn=2, dp=4) hybrid
    mesh end-to-end and checkpoints."""
    import json
    import os
    import subprocess
    import sys

    from tests.fixtures import make_voa_fixture

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    voa = make_voa_fixture(str(tmp_path / "voa"), num_docs=16)
    cfg = {
        "task": "dcnsmoke",
        "constrastive_loss": "ce",
        "posneg_descriptions_json": voa["descriptions_json"],
        "image_caption_json": [voa["mapping_json"]],
        "image_dir": [voa["image_dir"]],
        "ckpt_dir": str(tmp_path / "ckpt"),
        "tb_log_dir": str(tmp_path / "logs"),
        "max_epoch": 1,
        "batch_size": 8,
        "lr": 1e-4,
        "optimizer": "adam",
        "lr_scheduler": "none",
        "compute_dtype": "float32",
        "remat": False,
        "dcn_dp": 2,
        "num_workers": 2,
        "model": {
            "embed_dim": 64, "image_resolution": 32, "vision_layers": 2,
            "vision_width": 64, "vision_patch_size": 16, "context_length": 77,
            "vocab_size": 49408, "transformer_width": 64,
            "transformer_heads": 2, "transformer_layers": 2,
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "train.py", "--cfg", str(cfg_path)],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "mesh: dcn=2 x dp=4" in proc.stderr + proc.stdout
    assert (tmp_path / "ckpt" / "dcnsmoke" / "dcnsmoke_0").exists()
