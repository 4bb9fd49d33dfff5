"""Training-step tests on the virtual 8-device CPU mesh.

Checks: loss decreases, the data-parallel sharded step equals the
single-device step bit-for-bit-ish (GSPMD collectives preserve the math),
the alignment (OT) branch trains, and the NaN guard freezes updates.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from clip_event_tpu.data.labels import build_label_layout  # noqa: E402
from clip_event_tpu.engine.optim import build_optimizer, build_schedule  # noqa: E402
from clip_event_tpu.engine.train_step import (  # noqa: E402
    create_train_state,
    make_train_step,
)
from clip_event_tpu.models import init_params  # noqa: E402
from clip_event_tpu.parallel import make_mesh, replicate, shard_batch  # noqa: E402
from tests.test_model_parity import TINY_VIT  # noqa: E402

B, P, G = 8, 1, 2
D = P + G


def _make_batch(cfg, seed=0, alignment=False, num_obj=3, num_ent=4):
    rng = np.random.default_rng(seed)
    layout = build_label_layout(B, P, G, "ce", True)
    batch = {
        "image": rng.normal(size=(B, cfg.image_resolution, cfg.image_resolution, 3)).astype(np.float32),
        "text": rng.integers(1, cfg.vocab_size - 2, size=(B * D, cfg.context_length)).astype(np.int32),
        "labels_per_image": layout.labels_per_image,
        "labels_per_text": layout.labels_per_text,
        "index_pos": layout.index_pos,
    }
    batch["text"][:, -1] = cfg.vocab_size - 1  # EOT
    if alignment:
        batch["object_image"] = rng.normal(
            size=(B, num_obj, cfg.image_resolution, cfg.image_resolution, 3)
        ).astype(np.float32)
        batch["entity_text"] = rng.integers(
            1, cfg.vocab_size - 2, size=(B, num_ent, cfg.context_length)
        ).astype(np.int32)
        batch["object_mask"] = np.ones((B, num_obj), np.int32)
        batch["entity_mask"] = (rng.random((B, num_ent)) < 0.8).astype(np.int32)
        batch["entity_mask"][:, 0] = 1
    return batch


def _optimizer():
    return build_optimizer("adam", build_schedule("none", 1e-3, 10))


def test_loss_decreases():
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = _optimizer()
    step = make_train_step(cfg, opt, donate=False)
    state = create_train_state(params, opt)
    batch = _make_batch(cfg)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert bool(metrics["finite"])
        # pre-clip global grad norm is logged every step (training health)
        assert float(metrics["grad_norm"]) > 0.0
    assert losses[-1] < losses[0]


def test_dp_sharded_step_matches_single_device():
    """Gradients from the 8-way batch-sharded computation must equal the
    single-device gradients (GSPMD's all-gather/psum change nothing
    mathematically). Adam *updates* amplify epsilon differences to ±2·lr via
    sign(grad), so we compare losses and raw gradients, not post-Adam params."""
    from clip_event_tpu.engine.train_step import loss_fn
    import jax.numpy as jnp

    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(1), cfg)
    batch = _make_batch(cfg, seed=1)

    grad_fn = jax.jit(
        jax.value_and_grad(
            lambda p, b: loss_fn(p, b, cfg, "ce", True, False, False, jnp.float32)[0]
        )
    )
    loss1, grads1 = grad_fn(params, batch)

    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    params8 = replicate(params, mesh)
    loss8, grads8 = grad_fn(params8, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads1), jax.tree.leaves(grads8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-4)


def test_alignment_branch_trains():
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(2), cfg)
    opt = _optimizer()
    step = make_train_step(cfg, opt, alignment=True, donate=False)
    state = create_train_state(params, opt)
    batch = _make_batch(cfg, seed=2, alignment=True)
    state, metrics = step(state, batch)
    assert "loss_ot" in metrics
    assert np.isfinite(float(metrics["loss_ot"]))
    assert bool(metrics["finite"])


def test_nan_guard_freezes_update():
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(3), cfg)
    opt = _optimizer()
    step = make_train_step(cfg, opt, donate=False)
    state = create_train_state(params, opt)
    batch = _make_batch(cfg, seed=3)
    batch["image"][0, 0, 0, 0] = np.nan
    old_leaf = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    state, metrics = step(state, batch)
    assert not bool(metrics["finite"])
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(state.params)[0]), old_leaf)


def _add_bbox_channel(batch, cfg, rng, R=3):
    batch["bbox"] = rng.uniform(0, 0.5, size=(B, R, 4)).astype(np.float32)
    batch["bbox"][..., 2:] += 0.4
    batch["bbox_mask"] = np.ones((B, R), np.int32)
    batch["bbox_desc_text"] = rng.integers(
        1, cfg.vocab_size - 2, size=(B, R, cfg.context_length)
    ).astype(np.int32)
    batch["bbox_label_text"] = batch["bbox_desc_text"].copy()
    return batch


def test_multi_step_stacked_batches():
    """make_multi_step over a [K, ...] batch stack equals K sequential steps,
    with the FULL loss surface enabled (alignment + multiattention): one code
    path for benchmarking and full-featured training."""
    from clip_event_tpu.engine.train_step import make_multi_step

    cfg = TINY_VIT
    opt = _optimizer()
    params = init_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(99)
    batches = [
        _add_bbox_channel(_make_batch(cfg, seed=s, alignment=True), cfg, rng)
        for s in (10, 11, 12)
    ]
    kwargs = dict(alignment=True, multiattention="desc_type", donate=False, remat=False)

    # sequential reference
    step = make_train_step(cfg, opt, **kwargs)
    state_seq = create_train_state(params, opt)
    seq_metrics = []
    for b in batches:
        state_seq, m = step(state_seq, b)
        seq_metrics.append(m)

    # fused: stack batches on the leading axis
    stacked = {
        k: np.stack([b[k] for b in batches]) for k in batches[0]
    }
    many, _ = make_multi_step(cfg, opt, 3, **kwargs)
    state_fused = create_train_state(params, opt)
    state_fused, metrics_k = many(state_fused, stacked)
    # full per-step metrics dict, not just totals
    for key in ("loss", "loss_ot", "loss_bbox", "loss_arg", "finite"):
        assert key in metrics_k, key
        np.testing.assert_allclose(
            np.asarray(metrics_k[key]),
            [float(m[key]) for m in seq_metrics],
            rtol=1e-5, atol=1e-7,
        )
    for a, b in zip(jax.tree.leaves(state_seq.params), jax.tree.leaves(state_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_multi_step_fixed_batch():
    from clip_event_tpu.engine.train_step import make_multi_step

    cfg = TINY_VIT
    opt = _optimizer()
    params = init_params(jax.random.PRNGKey(8), cfg)
    batch = _make_batch(cfg, seed=13)
    _, many_fixed = make_multi_step(cfg, opt, 4, donate=False, remat=False)
    state = create_train_state(params, opt)
    state, metrics_k = many_fixed(state, batch)
    losses = np.asarray(metrics_k["loss"])
    assert losses.shape == (4,)
    assert losses[-1] < losses[0]  # it trains


def test_accum_step_matches_manual_average():
    """make_accum_step(K) must equal: average the K microbatch gradients,
    apply ONE optimizer update — with the FULL loss surface enabled and
    every metric the K-average of the per-microbatch metrics."""
    import optax

    from clip_event_tpu.engine.train_step import loss_fn, make_accum_step

    cfg = TINY_VIT
    # SGD: its update is LINEAR in the gradient, so the comparison is not
    # subject to Adam's sign(g) epsilon amplification (see the dp test above)
    opt = build_optimizer("sgd", build_schedule("none", 1e-3, 10))
    params = init_params(jax.random.PRNGKey(21), cfg)
    rng = np.random.default_rng(77)
    K = 3
    batches = [
        _add_bbox_channel(_make_batch(cfg, seed=s, alignment=True), cfg, rng)
        for s in (30, 31, 32)
    ]
    kwargs = dict(alignment=True, multiattention="desc_type", remat=False)

    # manual reference: K independent grads → mean → one update
    def gfn(p, b):
        return jax.value_and_grad(loss_fn, has_aux=True)(
            p, b, cfg, "ce", True, True, False, jnp.float32, False,
            "desc_type", "mean", 1,
        )

    outs = [gfn(params, b) for b in batches]
    grads = jax.tree.map(lambda *g: sum(g) * (1.0 / K), *[o[1] for o in outs])
    opt_state = opt.init(params)
    updates, _ = opt.update(grads, opt_state, params)
    manual_params = optax.apply_updates(params, updates)
    manual_metrics = {
        "loss": np.mean([float(o[0][0]) for o in outs]),
        "loss_ot": np.mean([float(o[0][1]["loss_ot"]) for o in outs]),
    }

    accum = make_accum_step(cfg, opt, K, donate=False, **kwargs)
    state = create_train_state(params, opt)
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    new_state, metrics = accum(state, stacked)

    assert bool(metrics["finite"])
    np.testing.assert_allclose(float(metrics["loss"]), manual_metrics["loss"], rtol=1e-5)
    np.testing.assert_allclose(float(metrics["loss_ot"]), manual_metrics["loss_ot"], rtol=1e-5)
    assert int(new_state.step) == 1  # K microbatches = ONE optimizer step
    for a, b in zip(jax.tree.leaves(manual_params), jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_accum_step_nan_guard():
    """A NaN in ANY microbatch must freeze the whole accumulated update."""
    from clip_event_tpu.engine.train_step import make_accum_step

    cfg = TINY_VIT
    opt = _optimizer()
    params = init_params(jax.random.PRNGKey(22), cfg)
    b0, b1 = _make_batch(cfg, seed=40), _make_batch(cfg, seed=41)
    b1["image"][0, 0, 0, 0] = np.nan  # poison the SECOND microbatch
    stacked = {k: np.stack([b0[k], b1[k]]) for k in b0}
    accum = make_accum_step(cfg, opt, 2, donate=False)
    state = create_train_state(params, opt)
    old_leaf = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    state, metrics = accum(state, stacked)
    assert not bool(metrics["finite"])
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(state.params)[0]), old_leaf)


def test_sim_entity_chunked_matches_unchunked():
    """alignment_chunks runs the object/entity encodes in sequential slices;
    results must be identical (and non-dividing chunk counts fall back)."""
    from clip_event_tpu.models import clip as clip_model
    from tests.test_model_parity import TINY_VIT

    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    B, N, M = 2, 4, 3
    obj = rng.normal(size=(B, N, cfg.image_resolution, cfg.image_resolution, 3)).astype(np.float32)
    ent = rng.integers(1, cfg.vocab_size - 2, size=(B, M, cfg.context_length)).astype(np.int32)
    ent[..., -1] = cfg.vocab_size - 1

    img1, txt1 = clip_model.sim_entity(params, cfg, obj, ent, chunks=1)
    img2, txt2 = clip_model.sim_entity(params, cfg, obj, ent, chunks=2)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(txt1), np.asarray(txt2), atol=1e-5)
    # chunks=4 with M=3 entity slots → effective count rounds to the axis
    # length (3 single-node slices); still equal
    img3, txt3 = clip_model.sim_entity(params, cfg, obj, ent, chunks=4)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(txt1), np.asarray(txt3), atol=1e-5)
