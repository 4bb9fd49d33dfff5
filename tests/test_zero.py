"""ZeRO-1/ZeRO-3 state-sharding tests (virtual 8-device CPU mesh).

The reference replicates the full Adam state on every rank (torch DDP keeps
one optimizer per GPU, `train.py:222-225`) and SURVEY §2.7 lists ZeRO/FSDP
as explicitly absent; `parallel/sharding.py::zero_opt_shardings` (moments
over dp) and `fsdp_param_shardings` (params too) are the TPU-native
additions, with the step's output layout pinned via
`with_sharding_constraint`. These tests prove (a) the math is unchanged,
(b) the state really is dp-sharded and STAYS sharded across steps (and for
ZeRO-1 that params stay replicated), and (c) a sharded state checkpoints
and restores.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding  # noqa: E402

from clip_event_tpu.engine.train_step import (  # noqa: E402
    create_train_state,
    make_train_step,
)
from clip_event_tpu.models import init_params  # noqa: E402
from clip_event_tpu.parallel import make_mesh, replicate, shard_batch  # noqa: E402
from clip_event_tpu.parallel.mesh import DATA_AXIS  # noqa: E402
from clip_event_tpu.parallel.sharding import (  # noqa: E402
    fsdp_param_shardings,
    shard_opt_state_zero,
    shard_params_fsdp,
    zero_opt_shardings,
)
from tests.test_model_parity import TINY_VIT  # noqa: E402
from tests.test_train_step import _make_batch, _optimizer  # noqa: E402


def _spec_axes(leaf):
    s = getattr(leaf, "sharding", None)
    if not isinstance(s, NamedSharding):
        return set()
    axes = set()
    for part in s.spec:
        for ax in part if isinstance(part, tuple) else (part,):
            if ax is not None:
                axes.add(ax)
    return axes


def _zero_state_and_step(cfg, opt, mesh, min_size=1024):
    state = create_train_state(replicate(init_params(jax.random.PRNGKey(0), cfg), mesh), opt)
    state = state._replace(
        opt_state=shard_opt_state_zero(state.opt_state, mesh, min_size=min_size)
    )
    shardings = jax.tree.map(lambda x: x.sharding, state)
    step = make_train_step(cfg, opt, donate=False, state_shardings=shardings)
    return state, step


def test_zero_step_matches_replicated():
    """3 optimizer steps with dp-sharded moments must produce the same params
    as the replicated-moment step (sharding is layout, not math). Tolerance:
    the moment layout changes GSPMD's gradient-psum reduction order by an
    ulp, and Adam's rsqrt amplifies last-ulp input differences toward ±lr
    (same effect test_dp_sharded_step_matches_single_device documents), so
    params are compared at a small fraction of one update (lr=1e-3)."""
    cfg = TINY_VIT
    opt = _optimizer()
    mesh = make_mesh(8)
    batch = _make_batch(cfg, seed=3)

    state_r = create_train_state(
        replicate(init_params(jax.random.PRNGKey(0), cfg), mesh), opt
    )
    state_r = state_r._replace(opt_state=replicate(state_r.opt_state, mesh))
    step_r = make_train_step(cfg, opt, donate=False)

    state_z, step_z = _zero_state_and_step(cfg, opt, mesh)

    for _ in range(3):
        state_r, m_r = step_r(state_r, shard_batch(batch, mesh))
        state_z, m_z = step_z(state_z, shard_batch(batch, mesh))
        assert bool(m_r["finite"]) and bool(m_z["finite"])

    np.testing.assert_allclose(float(m_r["loss"]), float(m_z["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_r.params), jax.tree.leaves(state_z.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_zero_moments_sharded_params_replicated_across_steps():
    """Moment leaves carry the dp axis with per-device shards 1/dp the global
    size, and the layout survives the step (the with_sharding_constraint
    pin); params never pick up a dp dimension."""
    cfg = TINY_VIT
    opt = _optimizer()
    mesh = make_mesh(8)
    state, step = _zero_state_and_step(cfg, opt, mesh)
    batch = _make_batch(cfg, seed=4)

    def check(state):
        sharded = 0
        for leaf in jax.tree.leaves(state.opt_state):
            if DATA_AXIS in _spec_axes(leaf):
                sharded += 1
                local = leaf.addressable_shards[0].data.size
                assert local * mesh.devices.size == leaf.size
        assert sharded > 0, "no moment leaf is dp-sharded"
        for leaf in jax.tree.leaves(state.params):
            assert DATA_AXIS not in _spec_axes(leaf)

    check(state)
    for _ in range(2):
        state, metrics = step(state, shard_batch(batch, mesh))
        assert bool(metrics["finite"])
        check(state)


def test_zero_shardings_compose_with_tp():
    """On a (dp x tp) mesh a tp-sharded moment keeps its tp dim and gains dp
    on another dim; already-replicated large leaves gain dp on their largest
    divisible dim."""
    from clip_event_tpu.parallel.sharding import make_mesh_2d, shard_params

    cfg = TINY_VIT
    opt = _optimizer()
    mesh = make_mesh_2d(dp=4, tp=2)
    params = shard_params(init_params(jax.random.PRNGKey(0), cfg), mesh)
    state = create_train_state(params, opt)
    shardings = zero_opt_shardings(state.opt_state, mesh, min_size=64)

    saw_both = False
    for tmpl, sh in zip(
        jax.tree.leaves(state.opt_state), jax.tree.leaves(shardings)
    ):
        axes_before = _spec_axes(tmpl)
        axes_after = set()
        for part in sh.spec:
            for ax in part if isinstance(part, tuple) else (part,):
                if ax is not None:
                    axes_after.add(ax)
        # never loses an existing (tp) annotation
        assert axes_before <= axes_after | {DATA_AXIS}
        if "tp" in axes_after and DATA_AXIS in axes_after:
            saw_both = True
    assert saw_both, "no moment leaf combines tp and dp sharding"


def test_zero_composes_with_grad_accum_and_multi_step():
    """The state_shardings pin works through BOTH alternate dispatch modes
    train.py can combine with "zero": gradient accumulation (K microbatches
    → one optimizer step) and the K-steps-fused lax.scan dispatch. Moments
    stay dp-sharded across the call in each."""
    from clip_event_tpu.engine.train_step import make_accum_step, make_multi_step

    cfg = TINY_VIT
    opt = _optimizer()
    mesh = make_mesh(8)
    batch = _make_batch(cfg, seed=9)
    stacked = jax.tree.map(lambda x: np.stack([x, x]), batch)

    def sharded_moments(state):
        return sum(
            DATA_AXIS in _spec_axes(l) for l in jax.tree.leaves(state.opt_state)
        )

    def fresh_state():
        state = create_train_state(
            replicate(init_params(jax.random.PRNGKey(0), cfg), mesh), opt
        )
        state = state._replace(
            opt_state=shard_opt_state_zero(state.opt_state, mesh)
        )
        return state, jax.tree.map(lambda x: x.sharding, state)

    state, shardings = fresh_state()
    n0 = sharded_moments(state)
    assert n0 > 0
    accum = make_accum_step(
        cfg, opt, 2, donate=False, state_shardings=shardings
    )
    state, metrics = accum(state, stacked)
    assert bool(metrics["finite"]) and int(state.step) == 1
    assert sharded_moments(state) == n0

    state, shardings = fresh_state()
    multi, _ = make_multi_step(
        cfg, opt, 2, donate=False, state_shardings=shardings
    )
    state, metrics = multi(state, stacked)
    assert bool(np.asarray(metrics["finite"]).all()) and int(state.step) == 2
    assert sharded_moments(state) == n0


def test_zero_checkpoint_roundtrip(tmp_path):
    """A dp-sharded optimizer state saves and restores to the same values."""
    from clip_event_tpu.engine.checkpoint import restore_checkpoint, save_checkpoint

    cfg = TINY_VIT
    opt = _optimizer()
    mesh = make_mesh(8)
    state, step = _zero_state_and_step(cfg, opt, mesh)
    batch = _make_batch(cfg, seed=5)
    state, _ = step(state, shard_batch(batch, mesh))

    path = save_checkpoint(str(tmp_path), "tiny", 0, state.params,
                           state.opt_state, step=1)
    assert path is not None
    params_template = jax.eval_shape(lambda: init_params(jax.random.PRNGKey(0), cfg))
    params, opt_state, meta = restore_checkpoint(
        path, params_template=params_template, optimizer=opt
    )
    assert int(meta["step"]) == 1
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(opt_state)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0, rtol=0
        )


def _fsdp_state_and_step(cfg, opt, mesh, min_size=1024):
    params = shard_params_fsdp(
        replicate(init_params(jax.random.PRNGKey(0), cfg), mesh), mesh,
        min_size=min_size,
    )
    state = create_train_state(params, opt)
    state = state._replace(
        opt_state=shard_opt_state_zero(state.opt_state, mesh, min_size=min_size)
    )
    shardings = jax.tree.map(lambda x: x.sharding, state)
    step = make_train_step(cfg, opt, donate=False, state_shardings=shardings)
    return state, step


def test_fsdp_step_matches_replicated():
    """3 optimizer steps with dp-sharded params AND moments (ZeRO-3) produce
    the same params as the replicated step, modulo the same reduction-order
    ulp tolerance the ZeRO-1 test documents."""
    cfg = TINY_VIT
    opt = _optimizer()
    mesh = make_mesh(8)
    batch = _make_batch(cfg, seed=6)

    state_r = create_train_state(
        replicate(init_params(jax.random.PRNGKey(0), cfg), mesh), opt
    )
    state_r = state_r._replace(opt_state=replicate(state_r.opt_state, mesh))
    step_r = make_train_step(cfg, opt, donate=False)

    state_f, step_f = _fsdp_state_and_step(cfg, opt, mesh, min_size=64)

    for _ in range(3):
        state_r, m_r = step_r(state_r, shard_batch(batch, mesh))
        state_f, m_f = step_f(state_f, shard_batch(batch, mesh))
        assert bool(m_r["finite"]) and bool(m_f["finite"])

    np.testing.assert_allclose(float(m_r["loss"]), float(m_f["loss"]), rtol=1e-5)
    # after 3 Adam steps (sign-amplified rounding) the reduce-scattered vs
    # replicated grads legitimately differ by a few float32 ulps per step
    for a, b in zip(jax.tree.leaves(state_r.params), jax.tree.leaves(state_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_fsdp_params_and_moments_sharded_across_steps():
    """Param leaves carry the dp axis with 1/dp-size per-device shards, the
    layout survives steps, and each moment shards the SAME dim as its param
    (the deterministic shape rule → shard-local Adam updates)."""
    cfg = TINY_VIT
    opt = _optimizer()
    mesh = make_mesh(8)
    state, step = _fsdp_state_and_step(cfg, opt, mesh, min_size=64)
    batch = _make_batch(cfg, seed=7)

    def check(state):
        sharded = 0
        for leaf in jax.tree.leaves(state.params):
            if DATA_AXIS in _spec_axes(leaf):
                sharded += 1
                local = leaf.addressable_shards[0].data.size
                assert local * mesh.devices.size == leaf.size
        assert sharded > 0, "no param leaf is dp-sharded"

    check(state)
    # moments mirror the param dim choice: collect spec-by-shape from params
    by_shape = {}
    for leaf in jax.tree.leaves(state.params):
        by_shape.setdefault(leaf.shape, leaf.sharding.spec)
    for leaf in jax.tree.leaves(state.opt_state):
        spec = by_shape.get(getattr(leaf, "shape", None))
        if spec is not None and DATA_AXIS in _spec_axes(leaf):
            assert leaf.sharding.spec == spec, (
                f"moment {leaf.shape} sharded {leaf.sharding.spec}, "
                f"param {spec}"
            )
    for _ in range(2):
        state, metrics = step(state, shard_batch(batch, mesh))
        assert bool(metrics["finite"])
        check(state)


def test_fsdp_step_emits_weight_gathers():
    """The compiled FSDP step contains the per-use weight all-gathers that
    define the ZeRO-3 communication shape — strictly more all-gather ops
    than the replicated baseline (whose gathers are only the InfoNCE
    feature gathers). The gradient side shows as all-reduce here because
    the CPU pipeline lacks XLA's all-reduce→reduce-scatter rewrite; on TPU
    GSPMD emits reduce-scatter for the dp-sharded grad outputs."""
    import collections
    import re

    cfg = TINY_VIT
    opt = _optimizer()
    mesh = make_mesh(8)
    batch = shard_batch(_make_batch(cfg, seed=8), mesh)

    def counts(step, state):
        txt = step.lower(state, batch).compile().as_text()
        return collections.Counter(
            re.findall(r"(all-gather|reduce-scatter|all-reduce)\b", txt)
        )

    state_r = create_train_state(
        replicate(init_params(jax.random.PRNGKey(0), cfg), mesh), opt
    )
    state_r = state_r._replace(opt_state=replicate(state_r.opt_state, mesh))
    ops_r = counts(make_train_step(cfg, opt, donate=False), state_r)

    state_f, step_f = _fsdp_state_and_step(cfg, opt, mesh, min_size=64)
    ops_f = counts(step_f, state_f)

    assert ops_f["all-gather"] > ops_r["all-gather"], (
        f"FSDP step has no extra weight gathers: {dict(ops_f)} "
        f"vs replicated {dict(ops_r)}"
    )


def test_fsdp_shardings_compose_with_tp():
    """On a (dp x tp) mesh a tp-sharded param keeps its tp dim and gains dp
    on another dim."""
    from clip_event_tpu.parallel.sharding import make_mesh_2d, shard_params

    cfg = TINY_VIT
    opt = _optimizer()
    mesh = make_mesh_2d(dp=4, tp=2)
    params = shard_params(init_params(jax.random.PRNGKey(0), cfg), mesh)
    shardings = fsdp_param_shardings(params, mesh, min_size=64)

    saw_both = False
    for tmpl, sh in zip(jax.tree.leaves(params), jax.tree.leaves(shardings)):
        axes_before = _spec_axes(tmpl)
        axes_after = set()
        for part in sh.spec:
            for ax in part if isinstance(part, tuple) else (part,):
                if ax is not None:
                    axes_after.add(ax)
        assert axes_before <= axes_after | {DATA_AXIS}
        if "tp" in axes_after and DATA_AXIS in axes_after:
            saw_both = True
    assert saw_both, "no param leaf combines tp and dp sharding"


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["zero", "fsdp"])
def test_train_cli_zero_and_resume(tmp_path, mode):
    """`"zero"`/`"fsdp"` through the real train.py CLI on a forced 8-device
    CPU backend, including resume from the run's checkpoint (restored
    params/moments get re-placed dp-sharded)."""
    from tests.fixtures import make_voa_fixture

    # batch_size must be divisible by dp=8, so the corpus needs ≥ 8 instances
    voa = make_voa_fixture(str(tmp_path / "voa"), num_docs=16)
    base = {
        "task": "zero",
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
        "num_workers": 2,
        mode: True,
        "model": {
            "embed_dim": 64, "image_resolution": 32, "vision_layers": 2,
            "vision_width": 64, "vision_patch_size": 16, "context_length": 77,
            "vocab_size": 49408, "transformer_width": 64, "transformer_heads": 1,
            "transformer_layers": 2,
        },
    }
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=8").strip(),
    )
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_path = tmp_path / "cfg0.json"
    cfg_path.write_text(json.dumps(base))
    proc = subprocess.run([sys.executable, "train.py", "--cfg", str(cfg_path)],
                          capture_output=True, text=True, timeout=600,
                          cwd=cwd, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ZeRO-1: optimizer moments sharded over dp=8" in proc.stderr, \
        proc.stderr[-3000:]
    if mode == "fsdp":
        assert "FSDP: params sharded over dp=8" in proc.stderr, \
            proc.stderr[-3000:]
    ckpt0 = tmp_path / "ckpt" / "zero" / "zero_0"
    assert ckpt0.exists()

    resume_cfg = dict(base, begin_ckpt=str(ckpt0), max_epoch=2)
    cfg_path2 = tmp_path / "cfg1.json"
    cfg_path2.write_text(json.dumps(resume_cfg))
    proc = subprocess.run([sys.executable, "train.py", "--cfg", str(cfg_path2)],
                          capture_output=True, text=True, timeout=600,
                          cwd=cwd, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (tmp_path / "ckpt" / "zero" / "zero_1").exists()


def test_cross_topology_resume(tmp_path):
    """A checkpoint saved under one topology (dp=8, ZeRO-1 moments) restores
    and continues under a DIFFERENT one (dp=2 x tp=4, FSDP params + ZeRO
    moments) bit-exactly.

    `save_checkpoint` gathers every leaf to canonical host arrays (the
    sharded layout is never persisted), so elastic resume — fewer chips, a
    different mesh shape, a different sharding mode — is just the normal
    restore + re-shard path. This pins that contract: the resumed run on the
    new mesh matches a run whose state moved to the new mesh live, with no
    checkpoint round trip in between.
    """
    from clip_event_tpu.engine.checkpoint import restore_checkpoint, save_checkpoint
    from clip_event_tpu.parallel.sharding import make_mesh_2d, shard_params_fsdp

    cfg = TINY_VIT
    opt = _optimizer()

    # --- source topology: flat dp=8, ZeRO-1 moments
    mesh_a = make_mesh(8)
    state_a, step_a = _zero_state_and_step(cfg, opt, mesh_a)
    for seed in (20, 21):
        state_a, metrics = step_a(state_a, shard_batch(_make_batch(cfg, seed=seed), mesh_a))
        assert bool(metrics["finite"])
    path = save_checkpoint(str(tmp_path), "elastic", 0, state_a.params,
                           state_a.opt_state, step=int(state_a.step))
    assert path is not None

    # --- target topology: (dp=2 x tp=4), FSDP params + ZeRO moments
    mesh_b = make_mesh_2d(dp=2, tp=4)

    def place_on_b(params_host, opt_host, step_count):
        params = shard_params_fsdp(
            jax.device_put(
                params_host, jax.tree.map(lambda _: NamedSharding(mesh_b, jax.sharding.PartitionSpec()), params_host)
            ),
            mesh_b,
        )
        opt_template = opt.init(params)

        def _reshard(t, x):
            s = getattr(t, "sharding", None)
            if not (isinstance(s, NamedSharding) and s.mesh == mesh_b):
                s = NamedSharding(mesh_b, jax.sharding.PartitionSpec())
            return jax.device_put(np.asarray(x), s)

        opt_state = shard_opt_state_zero(
            jax.tree.map(_reshard, opt_template, opt_host), mesh_b
        )
        state = create_train_state(params, opt)._replace(
            opt_state=opt_state, step=jnp.asarray(step_count, jnp.int32)
        )
        shardings = jax.tree.map(lambda x: x.sharding, state)
        return state, make_train_step(cfg, opt, donate=False, state_shardings=shardings)

    # resumed path: through the orbax checkpoint
    template = jax.eval_shape(lambda: init_params(jax.random.PRNGKey(0), cfg))
    params_r, opt_r, meta = restore_checkpoint(path, params_template=template, optimizer=opt)
    assert int(meta["step"]) == 2
    resumed, step_b = place_on_b(params_r, opt_r, meta["step"])

    # live path: the same state moved host->mesh_b with no checkpoint
    host_params = jax.tree.map(np.asarray, state_a.params)
    host_opt = jax.tree.map(np.asarray, state_a.opt_state)
    live, _ = place_on_b(host_params, host_opt, int(state_a.step))

    for seed in (22, 23):
        batch = shard_batch(_make_batch(cfg, seed=seed), mesh_b)
        resumed, m_r = step_b(resumed, batch)
        live, m_l = step_b(live, batch)
        assert bool(m_r["finite"]) and bool(m_l["finite"])

    assert int(resumed.step) == int(live.step) == 4
    for a, b in zip(jax.tree.leaves(resumed.params), jax.tree.leaves(live.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(resumed.opt_state), jax.tree.leaves(live.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored state really is sharded on the new mesh
    assert any(DATA_AXIS in _spec_axes(l) for l in jax.tree.leaves(resumed.params))
