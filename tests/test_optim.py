"""LR schedule parity vs the reference torch schedulers, and optimizer
semantics (torch Adam-with-L2 / SGD-momentum equivalence)."""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, reference_available

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from clip_event_tpu.engine.optim import build_optimizer, build_schedule  # noqa: E402


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("name", ["warmup", "warmupmultisteplr"])
def test_warmup_schedules_match_reference(name, monkeypatch):
    torch = pytest.importorskip("torch")
    # reference utils.py pulls in utils_MPIAdapter → mpi4py; stub it out.
    # Scoped via monkeypatch: a bare sys.modules.setdefault leaked the stub
    # (MPI = None) into later tests, flipping test_cluster_azure_branches
    # onto the has-mpi4py path in full-suite order (round-4 verdict).
    import types

    if "mpi4py" not in sys.modules:
        stub = types.ModuleType("mpi4py")
        stub.MPI = None
        monkeypatch.setitem(sys.modules, "mpi4py", stub)
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import utils as ref_utils
    finally:
        sys.path.remove(REFERENCE_DIR)

    base_lr, max_epoch = 1e-3, 30
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    if name == "warmup":
        ref_sched = ref_utils.WarmupCosineLR(opt, max_epoch, warmup_epochs=5)
        ours = build_schedule("warmup", base_lr, max_epoch, warmup_epochs=5)
    else:
        ref_sched = ref_utils.WarmupMultiStepLR(
            opt, milestones=[10, 20], gamma=0.1, warmup_epochs=5
        )
        ours = build_schedule(
            "warmupmultisteplr", base_lr, max_epoch, lr_steps=[10, 20],
            lr_gamma=0.1, warmup_epochs=5,
        )

    for e in range(max_epoch):
        ref_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(float(ours(e)), ref_lr, rtol=1e-5, err_msg=f"epoch {e}")
        ref_sched.step()


def test_multistep_and_cosine_schedules():
    s = build_schedule("multisteplr", 1.0, 30, lr_steps=[2, 4], lr_gamma=0.1)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(2)) == pytest.approx(0.1)
    assert float(s(4)) == pytest.approx(0.01)

    c = build_schedule("cosineannealinglr", 1.0, 10)
    assert float(c(0)) == pytest.approx(1.0)
    assert float(c(10)) == pytest.approx(0.0, abs=1e-6)


def test_adam_matches_torch_l2_weight_decay():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(4)]

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([p], lr=1e-3, weight_decay=0.01)
    for g in grads:
        topt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        topt.step()

    opt = build_optimizer("adam", build_schedule("none", 1e-3, 1), weight_decay=0.01,
                          grad_clip_norm=None)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}

    np.testing.assert_allclose(np.asarray(params["w"]), p.detach().numpy(), atol=1e-6)


def test_sgd_matches_torch_momentum():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    w0 = rng.normal(size=(4,)).astype(np.float32)
    grads = [rng.normal(size=(4,)).astype(np.float32) for _ in range(3)]

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([p], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in grads:
        topt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        topt.step()

    opt = build_optimizer("sgd", build_schedule("none", 0.1, 1), weight_decay=0.01,
                          momentum=0.9, grad_clip_norm=None)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}

    np.testing.assert_allclose(np.asarray(params["w"]), p.detach().numpy(), atol=1e-6)


def test_schedule_traceable_under_jit():
    s = build_schedule("warmup", 1e-3, 30)

    @jax.jit
    def f(step):
        return s(step)

    assert np.isfinite(float(f(jnp.asarray(3))))


def test_moment_dtype_bf16_adam():
    """moment_dtype='bfloat16' stores Adam's mu in bf16 (nu stays f32 — its
    rsqrt amplifies low-bit loss), the layout survives updates, and the
    trajectory tracks the f32-moment optimizer closely."""
    rng = np.random.default_rng(2)
    w0 = rng.normal(size=(64,)).astype(np.float32)
    grads = [0.1 * rng.normal(size=(64,)).astype(np.float32) for _ in range(5)]

    def run(moment_dtype):
        opt = build_optimizer("adam", build_schedule("none", 1e-3, 1),
                              grad_clip_norm=None, moment_dtype=moment_dtype)
        params = {"w": jnp.asarray(w0)}
        state = opt.init(params)
        for g in grads:
            updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
            params = {"w": params["w"] + updates["w"]}
        return params, state

    params_bf, state_bf = run("bfloat16")
    params_f32, _ = run(None)

    mus = [l for l in jax.tree.leaves(state_bf) if l.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment leaf in the Adam state"
    # bf16 has ~3 decimal digits; 5 steps of lr=1e-3 updates differ < 1e-4
    np.testing.assert_allclose(
        np.asarray(params_bf["w"]), np.asarray(params_f32["w"]), atol=1e-4
    )


def test_moment_dtype_bf16_sgd():
    opt = build_optimizer("sgd", build_schedule("none", 1e-2, 1), momentum=0.9,
                          grad_clip_norm=None, moment_dtype="bfloat16")
    params = {"w": jnp.zeros(8, jnp.float32)}
    state = opt.init(params)
    updates, state = opt.update({"w": jnp.ones(8, jnp.float32)}, state, params)
    assert any(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(state)), \
        "SGD momentum buffer not stored in bf16"
    assert updates["w"].dtype == jnp.float32  # update math stays f32


def test_moment_dtype_checkpoint_roundtrip(tmp_path):
    """bf16 moments survive orbax save/restore (the typed restore templates
    come from optimizer.init, which carries the reduced dtype)."""
    from clip_event_tpu.engine.checkpoint import restore_checkpoint, save_checkpoint

    opt = build_optimizer("adam", build_schedule("none", 1e-3, 1),
                          moment_dtype="bfloat16")
    params = {"w": jnp.linspace(0, 1, 16, dtype=jnp.float32)}
    state = opt.init(params)
    updates, state = opt.update({"w": jnp.ones(16, jnp.float32)}, state, params)

    path = save_checkpoint(str(tmp_path), "mdtype", 0, params, state, step=1)
    r_params, r_state, meta = restore_checkpoint(path, params, opt)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(r_state)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
