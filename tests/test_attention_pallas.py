"""Fused packed-QKV Pallas attention vs the jnp reference path (interpret
mode on CPU). The kernel consumes [B, S, 3W] and returns the concatenated
[B, S, W] head outputs; the reference below is the exact split/transpose
einsum formulation the XLA path uses."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from clip_event_tpu.models import layers as L  # noqa: E402
from clip_event_tpu.ops.attention_pallas import fused_attention_qkv  # noqa: E402


def _ref_attention_qkv(qkv, bias, num_heads, scale):
    B, S, W3 = qkv.shape
    W = W3 // 3
    D = W // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    to_heads = lambda t: t.reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)
    q, k, v = to_heads(q), to_heads(k), to_heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
    if bias is not None:
        logits = logits + bias
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.transpose(0, 2, 1, 3).reshape(B, S, W)


@pytest.mark.parametrize("B,S,W,H", [(3, 77, 128, 2), (2, 50, 192, 3), (5, 16, 64, 1)])
def test_forward_matches_reference(B, S, W, H):
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * W)).astype(np.float32))
    scale = (W // H) ** -0.5
    ref = np.asarray(_ref_attention_qkv(qkv, None, H, scale))
    ours = np.asarray(fused_attention_qkv(qkv, None, H, scale, True))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_forward_with_causal_bias():
    rng = np.random.default_rng(1)
    B, S, W, H = 4, 77, 128, 4
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * W)).astype(np.float32))
    bias = jnp.asarray(np.asarray(L.causal_mask(S)))
    scale = (W // H) ** -0.5
    ref = np.asarray(_ref_attention_qkv(qkv, bias, H, scale))
    ours = np.asarray(fused_attention_qkv(qkv, bias, H, scale, True))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_batch_not_divisible_by_block():
    """Odd batch sizes pad up to the block size inside the wrapper."""
    rng = np.random.default_rng(4)
    B, S, W, H = 7, 23, 64, 2
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * W)).astype(np.float32))
    scale = (W // H) ** -0.5
    ref = np.asarray(_ref_attention_qkv(qkv, None, H, scale))
    ours = np.asarray(fused_attention_qkv(qkv, None, H, scale, True))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_gradients_match_reference():
    rng = np.random.default_rng(2)
    B, S, W, H = 3, 50, 96, 3
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * W)).astype(np.float32))
    bias = jnp.asarray(np.asarray(L.causal_mask(S)))
    scale = (W // H) ** -0.5
    w = jnp.asarray(rng.normal(size=(B, S, W)).astype(np.float32))

    def loss_ref(qkv):
        return jnp.sum(_ref_attention_qkv(qkv, bias, H, scale) * w)

    def loss_ours(qkv):
        return jnp.sum(fused_attention_qkv(qkv, bias, H, scale, True) * w)

    g_ref = jax.grad(loss_ref)(qkv)
    g_ours = jax.grad(loss_ours)(qkv)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), atol=1e-4, rtol=1e-4)


def test_remat_cache_keyed_on_impl():
    """jax.checkpoint caches traced jaxprs keyed on (fn, avals, static args).
    The impl must be a static argument — when it was read as a hidden global
    inside the checkpointed block, whichever impl traced FIRST was silently
    baked into every later remat trace (the round-1 'exact parity' bug)."""
    rng = np.random.default_rng(5)
    W, H, S = 64, 2, 16
    tt = L.init_transformer(jax.random.PRNGKey(0), 2, W)
    x = jnp.asarray(rng.normal(size=(2, S, W)).astype(np.float32))
    bias = L.causal_mask(S)

    def build(impl):
        def f(p, xx):
            out = L.transformer(xx, p, H, bias, remat=True, impl=impl)
            return jnp.sum(out**2)

        return jax.jit(jax.grad(f, argnums=1)).lower(tt, x).as_text()

    hlo_xla = build("xla")  # traces (and caches) the xla remat jaxpr FIRST
    hlo_pallas = build(("pallas", None))
    # the buggy global-read version returned the SAME (cached xla) graph here
    assert hlo_xla != hlo_pallas
    # and the cache keying must be stable in both directions
    assert build("xla") == hlo_xla


def test_sharded_train_step_matches_xla():
    """Full train step on the 8-device dp mesh: the shard_map-wrapped kernel
    path must produce the same loss and params as the einsum path (GSPMD
    alone would replicate the pallas custom call)."""
    import jax.numpy as jnp
    from clip_event_tpu.data.labels import build_label_layout
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import create_train_state, make_train_step
    from clip_event_tpu.models import CLIPConfig, init_params
    from clip_event_tpu.parallel import make_mesh, replicate, shard_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")

    cfg = CLIPConfig(64, 32, 2, 64, 16, 16, 512, 64, 2, 2)
    rng = np.random.default_rng(0)
    B = 8
    layout = build_label_layout(B, 1, 1, "ce", True)
    text = rng.integers(1, 500, size=(B * 2, 16)).astype(np.int32)
    text[:, -1] = 511
    batch = {
        "image": rng.normal(size=(B, 32, 32, 3)).astype(np.float32),
        "text": text,
        "labels_per_image": layout.labels_per_image,
        "labels_per_text": layout.labels_per_text,
        "index_pos": layout.index_pos,
    }
    opt = build_optimizer("adam", build_schedule("none", 1e-3, 2))
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8)

    results = {}
    for impl in ("xla", "pallas"):
        L.set_attention_impl(impl, mesh if impl == "pallas" else None)
        try:
            step = make_train_step(cfg, opt, loss_type="ce", donate=False)
            state = create_train_state(replicate(params, mesh), opt)
            state = state._replace(opt_state=replicate(state.opt_state, mesh))
            s2, m = step(state, shard_batch(batch, mesh))
            results[impl] = (float(m["loss"]), np.asarray(jax.tree.leaves(s2.params)[0]))
        finally:
            L.set_attention_impl("xla")
    assert np.isclose(results["xla"][0], results["pallas"][0], atol=1e-5)
    np.testing.assert_allclose(results["xla"][1], results["pallas"][1], atol=1e-5)


def test_mha_layer_pallas_matches_xla():
    """The full multi_head_attention layer agrees between impls, including
    the packed-QKV lane layout handed to the kernel."""
    rng = np.random.default_rng(3)
    B, S, W, H = 2, 16, 64, 2
    x = jnp.asarray(rng.normal(size=(B, S, W)).astype(np.float32))
    params = {
        "qkv_w": jnp.asarray(rng.normal(size=(W, 3 * W)).astype(np.float32) * 0.05),
        "qkv_b": jnp.asarray(rng.normal(size=(3 * W,)).astype(np.float32) * 0.05),
        "out_w": jnp.asarray(rng.normal(size=(W, W)).astype(np.float32) * 0.05),
        "out_b": jnp.zeros(W),
    }
    bias = L.causal_mask(S)
    ref = np.asarray(L.multi_head_attention(x, params, H, bias))

    from clip_event_tpu.ops import attention_pallas

    orig = attention_pallas.fused_attention_qkv

    def patched(qkv, b, h, scale, interpret=False):
        return orig(qkv, b, h, scale, True)  # interpret mode on CPU

    L.set_attention_impl("pallas")
    attention_pallas.fused_attention_qkv = patched
    try:
        ours = np.asarray(L.multi_head_attention(x, params, H, bias))
    finally:
        attention_pallas.fused_attention_qkv = orig
        L.set_attention_impl("xla")
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_vmem_support_predicate_and_fallback():
    """Shapes whose 1-item whole-width block exceeds VMEM are rejected by
    the predicate (ViT-L/14 vision: S=257, W=1024, H=16); the layer then
    dispatches to the head-gridded kernel (or einsum as last resort) and
    must match the einsum numerics without crashing."""
    from clip_event_tpu.models import layers as L
    from clip_event_tpu.ops.attention_pallas import (
        _pick_block_b,
        fused_attention_supported,
    )

    assert fused_attention_supported(77, 512, 8)      # text tower
    assert fused_attention_supported(50, 768, 12)     # ViT-B/32 vision
    assert not fused_attention_supported(257, 1024, 16)  # ViT-L/14 vision
    with pytest.raises(ValueError):
        _pick_block_b(4, 257, 1024, 16)

    # the layer must not crash for unsupported shapes with pallas selected
    rng = np.random.default_rng(1)
    B, S, W, H = 2, 257, 1024, 16
    x = jnp.asarray(rng.normal(size=(B, S, W)), jnp.float32)
    params = {
        "qkv_w": jnp.asarray(rng.normal(size=(W, 3 * W)) * 0.02, jnp.float32),
        "qkv_b": jnp.zeros(3 * W),
        "out_w": jnp.asarray(rng.normal(size=(W, W)) * 0.02, jnp.float32),
        "out_b": jnp.zeros(W),
    }
    ref = np.asarray(L.multi_head_attention(x, params, H, None, impl="xla"))
    L.set_attention_impl("pallas")
    try:
        ours = np.asarray(L.multi_head_attention(x, params, H, None))
    finally:
        L.set_attention_impl("xla")
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


class TestHeadGridded:
    """Head-gridded variant (one head per grid program) for sequences whose
    whole-width block exceeds VMEM — ViT-L/14 S=257, ViT-B/16 S=197."""

    def _inputs(self, B=3, S=29, W=256, H=4, seed=7):
        rng = np.random.default_rng(seed)
        qkv = jnp.asarray(rng.normal(size=(B, S, 3 * W)), jnp.float32)
        return qkv, rng

    def _reference(self, qkv, bias, H, scale):
        B, S, W3 = qkv.shape
        W = W3 // 3
        q, k, v = jnp.split(qkv, 3, axis=-1)
        to_heads = lambda t: t.reshape(B, S, H, W // H).transpose(0, 2, 1, 3)
        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        if bias is not None:
            logits = logits + bias
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        return out.transpose(0, 2, 1, 3).reshape(B, S, W)

    def test_forward_matches_reference(self):
        from clip_event_tpu.ops.attention_pallas import fused_attention_qkv_headgrid

        qkv, _ = self._inputs()
        scale = (256 // 4) ** -0.5
        ref = np.asarray(self._reference(qkv, None, 4, scale))
        ours = np.asarray(
            fused_attention_qkv_headgrid(qkv, None, 4, scale, True)
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)

    def test_forward_with_bias_and_padding(self):
        from clip_event_tpu.models.layers import causal_mask
        from clip_event_tpu.ops.attention_pallas import (
            _hg_pick_tb,
            fused_attention_qkv_headgrid,
        )

        # S=257 forces tb<=4 (VMEM budget, liveness-calibrated picker), so
        # B=5 genuinely exercises the batch-padding branch in both fwd and bwd
        assert 1 < _hg_pick_tb(5, 257, 2) <= 4
        assert 5 % _hg_pick_tb(5, 257, 2) != 0
        qkv, rng = self._inputs(B=5, S=257, W=128, H=2)
        bias = causal_mask(257)
        scale = 64**-0.5
        ref = np.asarray(self._reference(qkv, bias, 2, scale))
        ours = np.asarray(fused_attention_qkv_headgrid(qkv, bias, 2, scale, True))
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)

        cot = jnp.asarray(rng.normal(size=(5, 257, 128)), jnp.float32)
        g_ref = jax.grad(
            lambda q: jnp.sum(self._reference(q, bias, 2, scale) * cot)
        )(qkv)
        g_ours = jax.grad(
            lambda q: jnp.sum(
                fused_attention_qkv_headgrid(q, bias, 2, scale, True) * cot
            )
        )(qkv)
        np.testing.assert_allclose(
            np.asarray(g_ours), np.asarray(g_ref), atol=1e-4, rtol=1e-4
        )

    def test_gradients_match_reference(self):
        from clip_event_tpu.ops.attention_pallas import fused_attention_qkv_headgrid

        qkv, rng = self._inputs(B=2, S=11, W=128, H=2)
        scale = 64**-0.5
        cot = jnp.asarray(rng.normal(size=(2, 11, 128)), jnp.float32)

        ref_grad = jax.grad(
            lambda q: jnp.sum(self._reference(q, None, 2, scale) * cot)
        )(qkv)
        our_grad = jax.grad(
            lambda q: jnp.sum(
                fused_attention_qkv_headgrid(q, None, 2, scale, True) * cot
            )
        )(qkv)
        np.testing.assert_allclose(
            np.asarray(our_grad), np.asarray(ref_grad), atol=1e-4, rtol=1e-4
        )

    def test_layer_dispatch_uses_headgrid_for_large_seq(self):
        """ViT-L/14-shaped attention under impl=pallas must take the
        head-gridded kernel (not einsum) and match the einsum numerics."""
        from clip_event_tpu.models import layers as L
        from clip_event_tpu.ops.attention_pallas import head_grid_supported

        assert head_grid_supported(257, 1024, 16)
        assert head_grid_supported(197, 768, 12)

        rng = np.random.default_rng(2)
        B, S, W, H = 2, 257, 1024, 16
        x = jnp.asarray(rng.normal(size=(B, S, W)) * 0.1, jnp.float32)
        params = {
            "qkv_w": jnp.asarray(rng.normal(size=(W, 3 * W)) * 0.02, jnp.float32),
            "qkv_b": jnp.zeros(3 * W),
            "out_w": jnp.asarray(rng.normal(size=(W, W)) * 0.02, jnp.float32),
            "out_b": jnp.zeros(W),
        }
        ref = np.asarray(L.multi_head_attention(x, params, H, None, impl="xla"))

        # the head-gridded kernel must actually be invoked (a silent einsum
        # fallback would pass the numeric check — the 'exact parity' trap)
        from clip_event_tpu.ops import attention_pallas

        calls = []
        orig = attention_pallas.fused_attention_qkv_headgrid

        def counting(qkv, b, h, scale, interpret=False):
            calls.append(qkv.shape)
            return orig(qkv, b, h, scale, interpret)

        L.set_attention_impl("pallas")
        attention_pallas.fused_attention_qkv_headgrid = counting
        try:
            ours = np.asarray(L.multi_head_attention(x, params, H, None))
        finally:
            attention_pallas.fused_attention_qkv_headgrid = orig
            L.set_attention_impl("xla")
        assert calls, "head-gridded kernel was not invoked"
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("B,S,W,H,causal", [(3, 77, 128, 2, True), (2, 50, 192, 3, False)])
def test_megakernel_matches_unfused_chain(B, S, W, H, causal):
    """fused_ln_qkv_attention == LayerNorm -> linear -> attention core."""
    from clip_event_tpu.ops.attention_pallas import fused_ln_qkv_attention

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(B, S, W)).astype(np.float32))
    ln = {"scale": jnp.asarray(1 + 0.1 * rng.normal(size=W).astype(np.float32)),
          "bias": jnp.asarray(0.1 * rng.normal(size=W).astype(np.float32))}
    w = jnp.asarray((W ** -0.5) * rng.normal(size=(W, 3 * W)).astype(np.float32))
    b = jnp.asarray(0.1 * rng.normal(size=3 * W).astype(np.float32))
    bias = L.causal_mask(S) if causal else None
    scale = (W // H) ** -0.5

    qkv = L.linear(L.layer_norm(x, ln), w, b)
    ref = np.asarray(_ref_attention_qkv(qkv, bias, H, scale))
    got = np.asarray(fused_ln_qkv_attention(
        x, ln["scale"], ln["bias"], w, b, bias, H, scale, interpret=True
    ))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_env_override_validation(monkeypatch):
    """CLIP_EVENT_ATTN_TB[_FWD] / _LIVENESS overrides are validated at read
    time with clear errors (advisor round 3: int('0')/non-numeric previously
    raised ZeroDivisionError/ValueError mid-trace)."""
    from clip_event_tpu.ops.attention_pallas import (
        _forced_tb,
        _liveness,
        _pick_block_b,
    )

    monkeypatch.setenv("CLIP_EVENT_ATTN_TB", "0")
    with pytest.raises(ValueError, match="must be >= 1"):
        _pick_block_b(8, 77, 512, 8)
    monkeypatch.setenv("CLIP_EVENT_ATTN_TB", "four")
    with pytest.raises(ValueError, match="not an integer"):
        _forced_tb(fwd=False)
    monkeypatch.setenv("CLIP_EVENT_ATTN_TB", "4")
    assert _pick_block_b(8, 77, 512, 8) == 4
    # setting only the bwd var leaves the FORWARD unforced (asymmetry)
    assert _forced_tb(fwd=True) is None

    monkeypatch.setenv("CLIP_EVENT_ATTN_LIVENESS", "abc")
    with pytest.raises(ValueError, match="not a float"):
        _liveness()
    monkeypatch.setenv("CLIP_EVENT_ATTN_LIVENESS", "1.5")
    with pytest.raises(ValueError, match=r"in \(0, 1\]"):
        _liveness()
    monkeypatch.setenv("CLIP_EVENT_ATTN_LIVENESS", "1.0")
    assert _liveness() == 1.0
    # disabling calibration can only shrink (or keep) the picked block
    monkeypatch.delenv("CLIP_EVENT_ATTN_TB")
    monkeypatch.delenv("CLIP_EVENT_ATTN_TB_FWD", raising=False)
    calibrated_off = _pick_block_b(512, 77, 512, 8)
    monkeypatch.delenv("CLIP_EVENT_ATTN_LIVENESS")
    assert calibrated_off <= _pick_block_b(512, 77, 512, 8)


def test_ln_fallback_warns_once(caplog):
    """A use_pallas_ln request that cannot run logs one warning per reason
    (advisor round 3: the silent fallback hid that the kernels never ran)."""
    import logging

    from clip_event_tpu.models.layers import _LN_FALLBACK_WARNED, _block_ln_plan

    _LN_FALLBACK_WARNED.clear()
    x = jnp.zeros((4, 8, 96))  # 96 % 128 != 0
    with caplog.at_level(logging.WARNING, "clip_event_tpu.models.layers"):
        assert _block_ln_plan("pallas", x, None, None) == "xla"
        assert _block_ln_plan("pallas", x, None, None) == "xla"
    msgs = [r for r in caplog.records if "pallas LN kernels will NOT run" in r.message]
    assert len(msgs) == 1 and "128-lane" in msgs[0].message
    # xla requests and calibration passes stay silent
    caplog.clear()
    with caplog.at_level(logging.WARNING, "clip_event_tpu.models.layers"):
        assert _block_ln_plan("xla", x, None, None) == "xla"
        assert _block_ln_plan("pallas", x, None, {"k": []}) == "xla"
    assert not caplog.records
    _LN_FALLBACK_WARNED.clear()
