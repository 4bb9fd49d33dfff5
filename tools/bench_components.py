"""Component-level TPU benchmark: where does the train step's time go, and
which variant wins?

Runs a matrix of experiments in ONE process (TPU attach + compile amortized)
and prints a table.

Timing methodology (hard-won, see PERFORMANCE.md):
  * identical scan iterations get CSE'd — thread a data dependency through
    the carry;
  * summing one gradient leaf DCEs the rest of the backward — consume the
    whole tree;
  * on the remote axon platform `block_until_ready` does NOT reliably block
    (dispatches queue; it returns before execution completes), so every
    timed region CHAINS calls through a carried value and ends with an
    explicit host fetch (`float(...)`) — queue depth then cannot hide work.

Usage (TPU must be otherwise idle — it is single-client here):
    python tools/bench_components.py                # default experiment set
    python tools/bench_components.py step text vision matmul unroll
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 256
D = 3
STEPS = 10
CALLS = 3


def _bench_chain(make_call, iters_per_call=STEPS, calls=CALLS):
    """make_call: scalar-carry device value -> scalar-carry device value.
    Chains `calls` invocations (each internally `iters_per_call` iterations)
    and syncs once at the end with a host fetch. Returns seconds/iteration."""
    import jax.numpy as jnp

    c = make_call(jnp.zeros((), jnp.float32))  # compile + warmup
    c = jnp.asarray(float(c), jnp.float32)  # hard sync
    t0 = time.perf_counter()
    for _ in range(calls):
        c = make_call(c)
    float(c)  # hard sync
    return (time.perf_counter() - t0) / (calls * iters_per_call)


def _tower_grad_bench(name, params, batch_x, fwd_fn, steps=STEPS):
    """Per-iteration time of value_and_grad(tower loss), K iters fused in one
    dispatch, carry-chained across dispatches."""
    import jax
    import jax.numpy as jnp

    def loss(p, x, c):
        out = fwd_fn(p, x, c)
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    grad_fn = jax.value_and_grad(loss)

    @jax.jit
    def many(p, x, c0):
        def body(carry, _):
            val, grads = grad_fn(p, x, carry)
            gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
            return carry + val * 1e-6 + gsum * 1e-12, None

        c, _ = jax.lax.scan(body, c0, None, length=steps)
        return c

    dt = _bench_chain(lambda c: many(params, batch_x, c), steps)
    print(f"{name:<44s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def bench_matmul():
    """Achievable MXU rate for the exact hot matmul shapes."""
    import jax
    import jax.numpy as jnp

    shapes = [
        ("text fc   [59136,512]x[512,2048]", (59136, 512), (512, 2048)),
        ("text qkv  [59136,512]x[512,1536]", (59136, 512), (512, 1536)),
        ("vis fc    [12800,768]x[768,3072]", (12800, 768), (768, 3072)),
        ("peak      [8192,8192]x[8192,8192]", (8192, 8192), (8192, 8192)),
    ]
    rng = np.random.default_rng(0)
    # ≥500 chained iterations: the tail host-fetch RTT (~24 ms) otherwise
    # inflates sub-ms rows by up to 3× (PERFORMANCE.md timing traps)
    iters, calls = 50, 10
    for name, sa, sb in shapes:
        a = jnp.asarray(rng.normal(size=sa), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=sb), jnp.bfloat16)

        @jax.jit
        def many(a, b, c0):
            def body(c, _):
                out = jnp.dot(a + c * 1e-12, b, preferred_element_type=jnp.float32)
                return jnp.mean(out) * 1e-9 + c, None

            c, _ = jax.lax.scan(body, c0, None, length=iters)
            return c

        dt = _bench_chain(lambda c, _a=a, _b=b: many(_a, _b, c), iters, calls)
        fl = 2 * sa[0] * sa[1] * sb[1]
        print(f"{name:<44s} {dt * 1e3:8.3f} ms  {fl / dt / 1e12:7.1f} TF/s", flush=True)


def bench_quantgemm():
    """Isolated quantized-GEMM comparison at the hot CLIP linear shapes:
    bf16 dot vs the XLA int8 composition (dynamic row quant → s8 dot →
    rescale) vs the fused Pallas kernel (ops/quant_pallas.py) across its
    block-size sweep. The measured conclusion (PERFORMANCE.md "Int8 W8A8"):
    int8-XLA BEATS bf16 at K=768, and the fused kernel loses ~40% at every
    block size — its per-block VPU quantize serializes against the MXU dot,
    while XLA overlaps them across ops."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.ops import quant_pallas as qp
    from clip_event_tpu.ops.quant import quantize_weight, quantized_linear

    shapes = [
        ("vis qkv  [12800,768]x[768,2304]", 12800, 768, 2304),
        ("vis fc   [12800,768]x[768,3072]", 12800, 768, 3072),
        ("text qkv [19712,512]x[512,1536]", 19712, 512, 1536),
    ]
    rng = np.random.default_rng(0)
    # sub-ms kernels: amortize the tunnel's ~15-20 ms tail-fetch RTT over
    # many iterations or it reads as a +0.5 ms/iter inflation
    iters, calls = 50, 10
    for name, m, k, n in shapes:
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
        qw = quantize_weight(w)
        wb = w.astype(jnp.bfloat16)
        fl = 2 * m * k * n

        def run(fn):
            @jax.jit
            def many(x_, c0):
                def body(c, _):
                    y = fn(x_ * (1 + c * 1e-12))
                    return c + jnp.sum(y.astype(jnp.float32)) * 1e-12, None

                c, _ = jax.lax.scan(body, c0, None, length=iters)
                return c

            return _bench_chain(lambda c: many(x, c), iters, calls)

        dt = run(lambda x_: jnp.dot(x_, wb))
        print(f"{name} bf16      {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF/s", flush=True)
        dt = run(lambda x_: quantized_linear(x_, qw))  # auto == xla composition
        print(f"{name} int8-xla  {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF/s", flush=True)

        for tm, tn in ((512, 256), (1024, 256), (512, 512), (1024, 512)):
            if n % tn or qp._block_bytes(tm, tn, k) >= qp._VMEM_BUDGET:
                continue
            orig = qp._pick_blocks
            qp._pick_blocks = lambda *a, _tm=tm, _tn=tn: (_tm, _tn)
            try:
                dt = run(lambda x_: qp.quantized_matmul(x_, qw.q, qw.scale))
                print(
                    f"{name} pallas tm={tm} tn={tn}  {dt*1e3:7.3f} ms  "
                    f"{fl/dt/1e12:6.1f} TF/s",
                    flush=True,
                )
            finally:
                qp._pick_blocks = orig


def _text_inputs(cfg):
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 49000, size=(B * D, cfg.context_length)).astype(np.int32)
    tokens[:, -1] = cfg.vocab_size - 1
    return tokens


def _image_inputs(cfg):
    rng = np.random.default_rng(0)
    return rng.normal(size=(B, cfg.image_resolution, cfg.image_resolution, 3)).astype(np.float32)


def bench_text(variants=("remat", "noremat", "dots", "dots_nobatch", "pallas")):
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.models import VIT_B32, init_params
    from clip_event_tpu.models import clip as clip_model
    from clip_event_tpu.models import layers

    cfg = VIT_B32
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(_text_inputs(cfg))

    def make_fwd(remat):
        def fwd(p, x, c):
            out = clip_model.encode_text(
                p, cfg, x, compute_dtype=jnp.bfloat16, remat=remat
            )
            return out * (1 + c * 1e-12)

        return fwd

    table = {
        "remat": ("text grad, remat=nothing_saveable", True),
        "noremat": ("text grad, no remat", False),
        "dots": ("text grad, remat=dots_saveable", "dots"),
        "dots_nobatch": ("text grad, remat=dots_nobatch", "dots_nobatch"),
    }
    for key, (label, mode) in table.items():
        if key in variants:
            try:
                _tower_grad_bench(label, params, tokens, make_fwd(mode))
            except Exception as e:
                print(f"{label:<44s} FAILED: {type(e).__name__}", flush=True)
    if "pallas" in variants:
        # The impl switch must cover BOTH the forward trace and jax.checkpoint's
        # backward recompute re-trace (which happens after fwd returns) — set it
        # for the whole bench, never inside the traced function.
        layers.set_attention_impl("pallas")
        try:
            for label, mode in (
                ("text grad, remat + pallas attention", True),
                ("text grad, remat=attn + pallas", "attn"),
                ("text grad, no remat + pallas", False),
            ):
                try:
                    _tower_grad_bench(label, params, tokens, make_fwd(mode))
                except Exception as e:
                    print(f"{label:<44s} FAILED: {type(e).__name__}", flush=True)
        finally:
            layers.set_attention_impl("xla")


def bench_vision():
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.models import VIT_B32, init_params
    from clip_event_tpu.models import clip as clip_model

    cfg = VIT_B32
    params = init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(_image_inputs(cfg))

    def make_fwd(remat):
        def fwd(p, x, c):
            return clip_model.encode_image(
                p, cfg, x + c * 1e-12, compute_dtype=jnp.bfloat16, remat=remat
            )

        return fwd

    for label, mode in (
        ("vision grad, remat", True),
        ("vision grad, no remat", False),
        ("vision grad, remat=dots_nobatch", "dots_nobatch"),
    ):
        try:
            _tower_grad_bench(label, params, images, make_fwd(mode))
        except Exception as e:
            print(f"{label:<44s} FAILED: {type(e).__name__}", flush=True)

    from clip_event_tpu.models import layers

    layers.set_attention_impl("pallas")
    try:
        for label, mode in (
            ("vision grad, remat + pallas attention", True),
            ("vision grad, no remat + pallas", False),
        ):
            try:
                _tower_grad_bench(label, params, images, make_fwd(mode))
            except Exception as e:
                print(f"{label:<44s} FAILED: {type(e).__name__}", flush=True)
    finally:
        layers.set_attention_impl("xla")


def bench_visionsplit():
    """Decompose the ViT stack (B=256, S=50, W=768): full block vs MLP-only
    vs attention-only vs matmul skeleton, plus the patch-conv embedding —
    locates the vision tower's non-matmul time (theoretical matmul bound is
    ~1/3 of the measured tower grad)."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.models import VIT_B32, init_params
    from clip_event_tpu.models import clip as clip_model
    from clip_event_tpu.models import layers

    cfg = VIT_B32
    L, W, H = cfg.vision_layers, cfg.vision_width, cfg.vision_width // 64
    tt = layers.init_transformer(jax.random.PRNGKey(0), L, W)
    rng = np.random.default_rng(0)
    S = cfg.grid_size**2 + 1
    x = jnp.asarray(rng.normal(size=(B, S, W)), jnp.bfloat16)

    def scan_stack(block):
        def fwd(p, xx, c):
            def body(h, lp):
                return block(h, lp), None

            out, _ = jax.lax.scan(body, xx * (1 + c * 1e-12), p)
            return out

        return fwd

    remat = lambda f: jax.checkpoint(f, policy=jax.checkpoint_policies.nothing_saveable)

    @remat
    def full_block(h, lp):
        return layers.residual_block(h, lp, H, None, impl="xla")

    @remat
    def full_block_pallas(h, lp):
        return layers.residual_block(h, lp, H, None, impl=("pallas", None))

    @remat
    def mlp_only(h, lp):
        hh = layers.layer_norm(h, lp["ln_2"])
        hh = layers.linear(hh, lp["mlp"]["fc_w"], lp["mlp"]["fc_b"])
        hh = layers.quick_gelu(hh)
        hh = layers.linear(hh, lp["mlp"]["proj_w"], lp["mlp"]["proj_b"])
        return h + hh

    @remat
    def attn_only(h, lp):
        return h + layers.multi_head_attention(
            layers.layer_norm(h, lp["ln_1"]), lp["attn"], H, None, impl="xla"
        )

    @remat
    def attn_only_pallas(h, lp):
        return h + layers.multi_head_attention(
            layers.layer_norm(h, lp["ln_1"]), lp["attn"], H, None,
            impl=("pallas", None),
        )

    @remat
    def matmuls_only(h, lp):
        q = layers.linear(h, lp["attn"]["qkv_w"], lp["attn"]["qkv_b"])
        q = q[..., :W]
        q = layers.linear(q, lp["attn"]["out_w"], lp["attn"]["out_b"])
        hh = layers.linear(h + q, lp["mlp"]["fc_w"], lp["mlp"]["fc_b"])
        hh = layers.linear(hh, lp["mlp"]["proj_w"], lp["mlp"]["proj_b"])
        return h + hh

    for name, block in (
        ("vit stack: full block (xla attn)", full_block),
        ("vit stack: full block (pallas attn)", full_block_pallas),
        ("vit stack: mlp half only", mlp_only),
        ("vit stack: attention half (xla)", attn_only),
        ("vit stack: attention half (pallas)", attn_only_pallas),
        ("vit stack: matmul skeleton only", matmuls_only),
    ):
        try:
            _tower_grad_bench(name, tt, x, scan_stack(block))
        except Exception as e:
            print(f"{name:<44s} FAILED: {type(e).__name__}", flush=True)

    # the patch embedding (conv-as-matmul) + pre/post plumbing around the stack
    params = init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(_image_inputs(cfg))

    def embed_only(p, im, c):
        from clip_event_tpu.models import vit

        return vit.patch_embed(
            (im + c * 1e-12).astype(jnp.bfloat16),
            p["visual"]["patch_embed_w"],
            cfg.vision_patch_size,
        )

    try:
        _tower_grad_bench("vit patch embed only", params, images, embed_only)
    except Exception as e:
        print(f"{'vit patch embed only':<44s} FAILED: {type(e).__name__}", flush=True)


def bench_step(impls=("xla", "pallas")):
    """Full train step (the bench.py configuration), per attention impl."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.data.labels import build_label_layout
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import create_train_state, make_multi_step
    from clip_event_tpu.models import VIT_B32, init_params
    from clip_event_tpu.models import layers

    cfg = VIT_B32
    layout = build_label_layout(B, 1, D - 1, "ce", True)
    batch = {
        "image": _image_inputs(cfg),
        "text": _text_inputs(cfg),
        "labels_per_image": layout.labels_per_image,
        "labels_per_text": layout.labels_per_text,
        "index_pos": layout.index_pos,
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    optimizer = build_optimizer("adam", build_schedule("none", 1e-6, 30))
    params = init_params(jax.random.PRNGKey(0), cfg)

    for impl in impls:
        layers.set_attention_impl(impl)
        try:
            _, run_k = make_multi_step(cfg, optimizer, STEPS, loss_type="ce",
                                       overbatch=True, compute_dtype=jnp.bfloat16,
                                       remat=True, donate=False)
            state0 = create_train_state(params, optimizer)

            # chain the state itself; sync once at the end via the step counter
            holder = {"state": state0}

            def call(c):
                s, m = run_k(holder["state"], batch)
                holder["state"] = s
                return m["loss"][-1] + c * 0

            dt = _bench_chain(call, STEPS)
            label = f"full train step (remat, bf16, B=256, {impl})"
            print(f"{label:<44s} {dt * 1e3:8.2f} ms/step "
                  f"({B * D / dt:,.0f} pairs/s)", flush=True)
        except Exception as e:
            print(f"full train step ({impl}) FAILED: {type(e).__name__}: {e}", flush=True)
        finally:
            layers.set_attention_impl("xla")


def bench_unroll():
    """scan unroll factor over the text transformer stack (remat on)."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.models import VIT_B32
    from clip_event_tpu.models import layers

    cfg = VIT_B32
    tt = layers.init_transformer(
        jax.random.PRNGKey(0), cfg.transformer_layers, cfg.transformer_width
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(B * D, cfg.context_length, cfg.transformer_width)),
        jnp.bfloat16,
    )
    bias = layers.causal_mask(cfg.context_length)

    for impl in ("xla", ("pallas", None)):
        tag = "xla" if impl == "xla" else "pallas"
        for unroll in (1, 4, 12):
            def fwd(p, xx, c, _u=unroll, _i=impl):
                return layers.transformer(
                    xx * (1 + c * 1e-12), p, cfg.transformer_heads, bias,
                    remat=True, unroll=_u, impl=_i,
                )

            try:
                _tower_grad_bench(
                    f"text stack grad, remat, {tag}, unroll={unroll}", tt, x, fwd
                )
            except Exception as e:
                print(f"text stack {tag} unroll={unroll:<2d} FAILED: {type(e).__name__}",
                      flush=True)


def bench_textsplit():
    """Decompose the text stack: full block vs MLP-only vs attention-only vs
    LN-free — locates the ~100 ms/iter of non-matmul time."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.models import VIT_B32
    from clip_event_tpu.models import layers

    cfg = VIT_B32
    L, W, H = cfg.transformer_layers, cfg.transformer_width, cfg.transformer_heads
    tt = layers.init_transformer(jax.random.PRNGKey(0), L, W)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B * D, cfg.context_length, W)), jnp.bfloat16)
    bias = layers.causal_mask(cfg.context_length)

    def scan_stack(block):
        def fwd(p, xx, c):
            def body(h, lp):
                return block(h, lp), None

            out, _ = jax.lax.scan(
                body,
                xx * (1 + c * 1e-12),
                p,
            )
            return out

        return fwd

    remat = lambda f: jax.checkpoint(f, policy=jax.checkpoint_policies.nothing_saveable)

    @remat
    def full_block(h, lp):
        return layers.residual_block(h, lp, H, bias)

    @remat
    def mlp_only(h, lp):
        hh = layers.layer_norm(h, lp["ln_2"])
        hh = layers.linear(hh, lp["mlp"]["fc_w"], lp["mlp"]["fc_b"])
        hh = layers.quick_gelu(hh)
        hh = layers.linear(hh, lp["mlp"]["proj_w"], lp["mlp"]["proj_b"])
        return h + hh

    @remat
    def attn_only(h, lp):
        return h + layers.multi_head_attention(
            layers.layer_norm(h, lp["ln_1"]), lp["attn"], H, bias
        )

    @remat
    def matmuls_only(h, lp):
        """The block's matmuls with no LN / softmax / gelu — the pure-MXU
        skeleton (numerically meaningless, shape-identical)."""
        q = layers.linear(h, lp["attn"]["qkv_w"], lp["attn"]["qkv_b"])
        q = q[..., :W]
        q = layers.linear(q, lp["attn"]["out_w"], lp["attn"]["out_b"])
        hh = layers.linear(h + q, lp["mlp"]["fc_w"], lp["mlp"]["fc_b"])
        hh = layers.linear(hh, lp["mlp"]["proj_w"], lp["mlp"]["proj_b"])
        return h + hh

    for name, block in (
        ("text stack: full block", full_block),
        ("text stack: mlp half only", mlp_only),
        ("text stack: attention half only", attn_only),
        ("text stack: matmul skeleton only", matmuls_only),
    ):
        try:
            _tower_grad_bench(name, tt, x, scan_stack(block))
        except Exception as e:
            print(f"{name:<44s} FAILED: {type(e).__name__}", flush=True)


def bench_ln():
    """Quantify the fp32-LN-island share of the stack gradient: full block
    vs bf16-LN (no fp32 upcast) vs LN-free (identity — the ceiling). Decides
    whether a reduced-precision LN "speed mode" is worth shipping, and puts
    a measured number on the LN part of the ~30-40% above-matmul-floor gap
    (PERFORMANCE.md round-2 decompositions)."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.models import VIT_B32
    from clip_event_tpu.models import layers

    cfg = VIT_B32
    H = cfg.transformer_heads
    rng = np.random.default_rng(0)

    def ln_bf16(x, lp):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return y * lp["scale"].astype(x.dtype) + lp["bias"].astype(x.dtype)

    def make_block(ln):
        def block(h, lp):
            h = h + layers.multi_head_attention(ln(h, lp["ln_1"]), lp["attn"], H, bias)
            hh = ln(h, lp["ln_2"])
            hh = layers.linear(hh, lp["mlp"]["fc_w"], lp["mlp"]["fc_b"])
            hh = layers.quick_gelu(hh)
            hh = layers.linear(hh, lp["mlp"]["proj_w"], lp["mlp"]["proj_b"])
            return h + hh

        return jax.checkpoint(
            block, policy=jax.checkpoint_policies.nothing_saveable
        )

    def scan_stack(block):
        def fwd(p, xx, c):
            def body(h, lp):
                return block(h, lp), None

            out, _ = jax.lax.scan(body, xx * (1 + c * 1e-12), p)
            return out

        return fwd

    for tower, L, W, S, Bt in (
        ("text", cfg.transformer_layers, cfg.transformer_width,
         cfg.context_length, B * D),
        ("vision", cfg.vision_layers, cfg.vision_width, 50, B),
    ):
        tt = layers.init_transformer(jax.random.PRNGKey(0), L, W)
        x = jnp.asarray(rng.normal(size=(Bt, S, W)), jnp.bfloat16)
        bias = layers.causal_mask(S) if tower == "text" else None
        for name, ln in (
            (f"{tower} stack grad: fp32-island LN (default)", layers.layer_norm),
            (f"{tower} stack grad: bf16 LN", ln_bf16),
            (f"{tower} stack grad: LN-free ceiling", lambda x, lp: x),
        ):
            try:
                _tower_grad_bench(name, tt, x, scan_stack(make_block(ln)))
            except Exception as e:
                print(f"{name:<44s} FAILED: {type(e).__name__}", flush=True)
        # the fused one-pass Pallas LN kernels (ops/ln_pallas.py), through the
        # real residual_block path (fresh closures per variant — trace-cache
        # trap, PERFORMANCE.md)
        for name, ln_static in (
            (f"{tower} stack grad: residual_block xla LN", "xla"),
            (f"{tower} stack grad: residual_block pallas LN", ("pallas", None)),
        ):
            def real_block(h, lp, _ln=ln_static):
                return layers.residual_block(h, lp, H, bias, "xla", None, None, _ln)

            blk = jax.checkpoint(
                real_block, policy=jax.checkpoint_policies.nothing_saveable
            )
            try:
                _tower_grad_bench(name, tt, x, scan_stack(blk))
            except Exception as e:
                print(f"{name:<44s} FAILED: {type(e).__name__}", flush=True)


def bench_textwidth():
    """Text ENCODE throughput vs static width (the serving-side view of
    context_cap / length_buckets): ViT-B/32 text tower forward at widths
    77/48/32/16, B=1024, bf16. The carry threads through text_projection so
    scan iterations can't be CSE'd (timing traps, PERFORMANCE.md)."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.models import VIT_B32, init_params
    from clip_event_tpu.models import clip as clip_model

    cfg = VIT_B32
    params = jax.device_put(init_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    Bt = 1024
    for w in (77, 48, 32, 16):
        tokens = rng.integers(1, cfg.vocab_size - 2, size=(Bt, w)).astype(np.int32)
        tokens[:, -1] = cfg.vocab_size - 1
        tokens = jnp.asarray(tokens)

        @jax.jit
        def many(p, t, c0):
            def body(c, _):
                p2 = dict(p, text_projection=p["text_projection"] * (1 + c * 1e-12))
                f = clip_model.encode_text(p2, cfg, t, compute_dtype=jnp.bfloat16)
                return c + jnp.sum(f.astype(jnp.float32) ** 2) * 1e-9, None

            c, _ = jax.lax.scan(body, c0, None, length=STEPS)
            return c

        dt = _bench_chain(lambda c, _m=many, _t=tokens: _m(params, _t, c))
        print(
            f"text encode B={Bt} width={w:<3d} {dt * 1e3:8.2f} ms/iter "
            f"({Bt / dt:,.0f} texts/s)",
            flush=True,
        )


def bench_latency():
    """Image-encode latency (BASELINE.md 'image-encode p50 latency' gate).

    Two numbers per batch size: end-to-end per-call p50 (includes the
    host→TPU dispatch, which on this tunneled sandbox adds ~80–100 ms — on a
    directly-attached host it is ~10 µs), and chip-only time (K iterations
    chained in one dispatch, divided by K)."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.engine.train_step import make_eval_encoders
    from clip_event_tpu.models import VIT_B32, init_params

    from clip_event_tpu.models import layers

    from clip_event_tpu.ops.quant import calibrate_act_scales, quantize_params

    cfg = VIT_B32
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    stats = calibrate_act_scales(
        params, cfg,
        [rng.normal(size=(8, 224, 224, 3)).astype(np.float32)],
        [],
    )
    sparams = quantize_params(params, act_stats=stats, towers=("visual",))
    layers.set_attention_impl("pallas")  # flagship path
    try:
        for label, p in (("bf16", params), ("int8-static", sparams)):
            # fresh jitted encoder per variant (trace caches don't key on
            # anything distinguishing the pytrees' quantization mode beyond
            # their structure — which here differs, but stay uniform)
            image_fn, _ = make_eval_encoders(cfg, compute_dtype=jnp.bfloat16)
            for bs in (1, 8, 64):
                x = jnp.asarray(rng.normal(size=(bs, 224, 224, 3)), jnp.float32)

                # end-to-end: one dispatch per call, hard host fetch each call
                f = jax.jit(lambda p_, xx: image_fn(p_, xx))
                float(np.asarray(f(p, x)).sum())  # compile + warm
                times = []
                for _ in range(20):
                    t0 = time.perf_counter()
                    float(np.asarray(f(p, x)).sum())
                    times.append(time.perf_counter() - t0)
                p50 = sorted(times)[len(times) // 2]

                # chip-only: K chained iterations in one dispatch
                K = 20

                @jax.jit
                def many(p_, xx, c0):
                    def body(c, _):
                        out = image_fn(p_, xx * (1 + c * 1e-12))
                        return c + jnp.sum(out.astype(jnp.float32)) * 1e-9, None

                    c, _ = jax.lax.scan(body, c0, None, length=K)
                    return c

                dt = _bench_chain(lambda c, _p=p: many(_p, x, c), K)
                print(
                    f"image encode [{label}] B={bs:<3d} e2e p50 {p50 * 1e3:8.2f} ms/call"
                    f"   chip-only {dt * 1e3:8.2f} ms/call"
                    f"   ({bs / dt:8.1f} img/s)",
                    flush=True,
                )
    finally:
        layers.set_attention_impl("xla")


def bench_quant():
    """Int8 W8A8 inference vs bf16, both towers (serving/eval path).

    Chip-only chained timing of the jitted eval encoders at ViT-B/32 scale.
    v5e's MXU peaks 2× higher at s8×s8→s32 than bf16; the realized win is
    bounded by the non-matmul share (LN, softmax, quantize/dequantize ops)."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.engine.train_step import make_eval_encoders
    from clip_event_tpu.models import VIT_B32, init_params
    from clip_event_tpu.models import layers
    from clip_event_tpu.ops import quant
    from clip_event_tpu.ops.quant import quantize_params

    from clip_event_tpu.models import VIT_B16, VIT_L14
    from clip_event_tpu.ops.quant import calibrate_act_scales

    # BENCH_QUANT_MODEL env: ViT-B/32 (default) | ViT-B/16 | ViT-L/14
    cfg = {
        "ViT-B/32": VIT_B32, "ViT-B/16": VIT_B16, "ViT-L/14": VIT_L14,
    }[os.environ.get("BENCH_QUANT_MODEL", "ViT-B/32")]
    res = cfg.image_resolution
    params = init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params)
    rng = np.random.default_rng(0)
    cal_imgs = rng.normal(size=(16, res, res, 3)).astype(np.float32)
    cal_toks = np.zeros((16, 77), np.int32)
    cal_toks[:, 0] = 49406
    cal_toks[:, 1:10] = rng.integers(1, 49000, (16, 9))
    cal_toks[:, 10] = 49407
    stats = calibrate_act_scales(params, cfg, [cal_imgs], [cal_toks])
    sparams = quantize_params(params, act_stats=stats)
    K = 10

    layers.set_attention_impl("pallas")
    try:
        for tag, bs in (("image", 64), ("image", 256), ("text", 256), ("text", 1024)):
            if tag == "image":
                x = jnp.asarray(rng.normal(size=(bs, res, res, 3)), jnp.float32)
            else:
                toks = np.zeros((bs, 77), np.int32)
                toks[:, 0] = 49406
                toks[:, 1:10] = rng.integers(1, 49000, (bs, 9))
                toks[:, 10] = 49407
                x = jnp.asarray(toks)

            row = {}
            for label, p, gemm in (
                ("bf16", params, "xla"),
                ("int8-xla", qparams, "xla"),
                ("int8-static", sparams, "xla"),
                ("int8-pallas", qparams, "pallas"),
            ):
                # quantized_linear reads the GEMM impl at trace time, and the
                # jit trace-cache does NOT key on it — int8-xla and
                # int8-pallas take identical pytrees, so reusing one encoder
                # across labels silently reuses the first label's compiled
                # trace. Build FRESH jitted encoders per label.
                quant.set_gemm_impl(gemm)
                image_fn, text_fn = make_eval_encoders(
                    cfg, compute_dtype=jnp.bfloat16
                )
                fn = image_fn if tag == "image" else text_fn

                @jax.jit
                def many(p_, xx, c0):
                    def body(c, _):
                        if tag == "image":
                            out = fn(p_, xx * (1 + c * 1e-12))
                        else:
                            # tokens are ints: thread the dependency through
                            # a dummy additive zero derived from the carry
                            out = fn(p_, xx + (c * 0).astype(xx.dtype))
                        return c + jnp.sum(out.astype(jnp.float32)) * 1e-9, None

                    c, _ = jax.lax.scan(body, c0, None, length=K)
                    return c

                dt = _bench_chain(lambda c, _m=many, _p=p: _m(_p, x, c), K)
                row[label] = dt
                print(
                    f"{tag} encode B={bs:<5d} {label}: {dt * 1e3:8.2f} ms/call"
                    f"  ({bs / dt:9.1f} items/s)",
                    flush=True,
                )
            print(
                f"{tag} encode B={bs:<5d} speedups vs bf16: "
                f"xla {row['bf16'] / row['int8-xla']:.2f}x  "
                f"static {row['bf16'] / row['int8-static']:.2f}x  "
                f"pallas {row['bf16'] / row['int8-pallas']:.2f}x",
                flush=True,
            )
    finally:
        layers.set_attention_impl("xla")
        quant.set_gemm_impl("auto")


def bench_ot():
    """IPOT solver: XLA lax.scan loop vs the fused Pallas kernel, at the
    alignment-config shapes (B images, max_entities=16 text nodes, top-10
    object nodes; `config.py` caps)."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.ops.ot import optimal_transport_dist

    rng = np.random.default_rng(0)
    M, N, E = 16, 10, 512
    txt = jnp.asarray(rng.normal(size=(B, M, E)), jnp.float32)
    img = jnp.asarray(rng.normal(size=(B, N, E)), jnp.float32)
    txt_pad = jnp.asarray(rng.random((B, M)) < 0.3).at[:, 0].set(False)
    img_pad = jnp.asarray(rng.random((B, N)) < 0.3).at[:, 0].set(False)

    for name, use_pallas in (
        ("ipot dist fwd, xla scan", False),
        ("ipot dist fwd, pallas", True),
    ):
        @jax.jit
        def many(t, i, c0, _up=use_pallas):
            def body(c, _):
                d = optimal_transport_dist(
                    t * (1 + c * 1e-12), i, txt_pad, img_pad,
                    safe=True, use_pallas=_up,
                )
                return c + jnp.sum(d) * 1e-9, None

            c, _ = jax.lax.scan(body, c0, None, length=STEPS)
            return c

        try:
            dt = _bench_chain(lambda c: many(txt, img, c), STEPS)
            print(f"{name:<44s} {dt * 1e3:8.2f} ms/iter", flush=True)
        except Exception as e:
            print(f"{name:<44s} FAILED: {type(e).__name__}: {e}", flush=True)


def bench_megakernel():
    """Forward-only whole-block fusion break-even (PERFORMANCE.md lever 3):
    LN1 + QKV matmul + attention core as ONE pallas kernel (weights VMEM-
    resident) vs the unfused ln→linear→attention-kernel chain, over the full
    12-layer stack at both towers' shapes. Decides whether the full
    dW-accumulating megakernel is worth building."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.models import VIT_B32, layers
    from clip_event_tpu.ops.attention_pallas import (
        fused_attention_qkv,
        fused_ln_qkv_attention,
        megakernel_supported,
    )

    cfg = VIT_B32
    rng = np.random.default_rng(0)
    shapes = [
        ("text", B * D, cfg.context_length, cfg.transformer_width,
         cfg.transformer_heads, True),
        ("vision", B, (cfg.image_resolution // cfg.vision_patch_size) ** 2 + 1,
         cfg.vision_width, cfg.vision_heads, False),
    ]
    for tower, b, S, W, H, causal in shapes:
        if not megakernel_supported(S, W, H):
            print(f"megakernel {tower}: unsupported (VMEM)", flush=True)
            continue
        L_layers = cfg.transformer_layers if tower == "text" else cfg.vision_layers
        tt = layers.init_transformer(jax.random.PRNGKey(0), L_layers, W)
        tt = jax.tree.map(lambda a: a.astype(jnp.bfloat16), tt)
        x = jnp.asarray(rng.normal(size=(b, S, W)), jnp.bfloat16)
        bias = layers.causal_mask(S) if causal else None
        scale = (W // H) ** -0.5

        def unfused_layer(h, lp):
            qkv = layers.linear(layers.layer_norm(h, lp["ln_1"]),
                                lp["attn"]["qkv_w"], lp["attn"]["qkv_b"])
            return fused_attention_qkv(qkv, bias, H, scale)

        def mega_layer(h, lp):
            return fused_ln_qkv_attention(
                h, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                lp["attn"]["qkv_w"], lp["attn"]["qkv_b"], bias, H, scale,
            )

        for name, layer in ((f"{tower}: ln+qkv+core unfused", unfused_layer),
                            (f"{tower}: ln+qkv+core megakernel", mega_layer)):
            @jax.jit
            def many(p, xx, c0, _l=layer):
                def body(h, lp):
                    return _l(h, lp).astype(xx.dtype), None

                def iter_body(c, _):
                    x0 = xx * (1 + c * 1e-12).astype(xx.dtype)
                    out, _n = jax.lax.scan(body, x0, p)
                    return c + jnp.sum(out.astype(jnp.float32)) * 1e-9, None

                c, _ = jax.lax.scan(iter_body, c0, None, length=STEPS)
                return c

            try:
                dt = _bench_chain(lambda c, _m=many: _m(tt, x, c), STEPS)
                print(f"{name:<44s} {dt * 1e3:8.2f} ms/iter (12-layer fwd)",
                      flush=True)
            except Exception as e:
                print(f"{name:<44s} FAILED: {type(e).__name__}: {e}", flush=True)


def bench_alignment():
    """Full train step with the OT-alignment branch ON (object + entity
    channels), B=256: the sim_entity object-tower re-encode dominates. Also
    probes the default object cap (51 crops/image) for OOM. BENCH_OBJ
    overrides the benched crop count."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.data.labels import build_label_layout
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import create_train_state, make_multi_step
    from clip_event_tpu.models import VIT_B32, init_params
    from clip_event_tpu.models import layers

    cfg = VIT_B32
    rng = np.random.default_rng(0)
    layout = build_label_layout(B, 1, D - 1, "ce", True)
    M = 16  # max_entities default cap
    optimizer = build_optimizer("adam", build_schedule("none", 1e-6, 30))
    params = init_params(jax.random.PRNGKey(0), cfg)
    layers.set_attention_impl("pallas")
    try:
        for N in (int(os.environ.get("BENCH_OBJ", 11)),):
            ent = rng.integers(1, 49000, size=(B, M, cfg.context_length)).astype(np.int32)
            ent[..., -1] = cfg.vocab_size - 1
            batch = {
                "image": jnp.asarray(_image_inputs(cfg)),
                "text": jnp.asarray(_text_inputs(cfg)),
                "labels_per_image": jnp.asarray(layout.labels_per_image),
                "labels_per_text": jnp.asarray(layout.labels_per_text),
                "index_pos": jnp.asarray(layout.index_pos),
                "object_image": jnp.asarray(
                    rng.normal(
                        size=(B, N, cfg.image_resolution, cfg.image_resolution, 3)
                    ).astype(np.float32)
                ),
                "entity_text": jnp.asarray(ent),
                "entity_mask": jnp.asarray(rng.random((B, M)) < 0.4),
                "object_mask": jnp.asarray(rng.random((B, N)) < 0.4),
            }
            steps = 3  # the object tower makes each step ~N× heavier
            _, run_k = make_multi_step(
                cfg, optimizer, steps, loss_type="ce", overbatch=True,
                alignment=True, use_pallas_ot=False,
                alignment_chunks=int(os.environ.get("BENCH_ALIGN_CHUNKS", 4)),
                compute_dtype=jnp.bfloat16, remat=True, donate=False,
            )
            state0 = create_train_state(params, optimizer)
            holder = {"state": state0}

            def call(c):
                s, m = run_k(holder["state"], batch)
                holder["state"] = s
                return m["loss"][-1] + c * 0

            try:
                dt = _bench_chain(call, steps, calls=2)
                label = f"align step (B={B}, N={N} crops, M={M})"
                print(f"{label:<44s} {dt * 1e3:8.2f} ms/step "
                      f"({B * D / dt:,.0f} pairs/s)", flush=True)
            except Exception as e:
                print(f"align step N={N} FAILED: {type(e).__name__}: {e}",
                      flush=True)
    finally:
        layers.set_attention_impl("xla")


def bench_multiattention():
    """Full train step with the event/argument local-attention branch ON
    (`multiattention`, reference model_clip.py:430-488): contrastive loss +
    bbox-windowed grid-token InfoNCE over R=max_bboxes detections. Benches
    the default 'desc' mode and the heavier 'desc_type' (R extra text
    encodes/image for the role-type labels). BENCH_BBOXES overrides R."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.data.labels import build_label_layout
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import create_train_state, make_multi_step
    from clip_event_tpu.models import VIT_B32, init_params
    from clip_event_tpu.models import layers

    cfg = VIT_B32
    rng = np.random.default_rng(0)
    layout = build_label_layout(B, 1, D - 1, "ce", True)
    R = int(os.environ.get("BENCH_BBOXES", 8))  # max_bboxes default cap
    optimizer = build_optimizer("adam", build_schedule("none", 1e-6, 30))
    params = init_params(jax.random.PRNGKey(0), cfg)

    def _role_tokens():
        t = rng.integers(1, 49000, size=(B, R, cfg.context_length)).astype(np.int32)
        t[..., -1] = cfg.vocab_size - 1
        return jnp.asarray(t)

    batch = {
        "image": jnp.asarray(_image_inputs(cfg)),
        "text": jnp.asarray(_text_inputs(cfg)),
        "labels_per_image": jnp.asarray(layout.labels_per_image),
        "labels_per_text": jnp.asarray(layout.labels_per_text),
        "index_pos": jnp.asarray(layout.index_pos),
        # sort corner pairs per coordinate → [x1, y1, x2, y2] with x1<=x2, y1<=y2
        "bbox": jnp.asarray(
            np.sort(rng.random((B, R, 2, 2)).astype(np.float32), axis=2).reshape(
                B, R, 4
            )
        ),
        "bbox_mask": jnp.asarray((rng.random((B, R)) < 0.6).astype(np.int32)),
        "bbox_desc_text": _role_tokens(),
        "bbox_label_text": _role_tokens(),
    }
    layers.set_attention_impl("pallas")
    try:
        for mode in ("desc", "desc_type"):
            steps = 3  # R text encodes/image make each step several× heavier
            _, run_k = make_multi_step(
                cfg, optimizer, steps, loss_type="ce", overbatch=True,
                multiattention=mode, compute_dtype=jnp.bfloat16, remat=True,
                donate=False,
            )
            holder = {"state": create_train_state(params, optimizer)}

            def call(c):
                s, m = run_k(holder["state"], batch)
                holder["state"] = s
                return m["loss"][-1] + c * 0

            try:
                dt = _bench_chain(call, steps, calls=2)
                label = f"multiattn step ({mode}, B={B}, R={R})"
                print(f"{label:<44s} {dt * 1e3:8.2f} ms/step "
                      f"({B * D / dt:,.0f} pairs/s)", flush=True)
            except Exception as e:
                print(f"multiattn step mode={mode} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
    finally:
        layers.set_attention_impl("xla")


def bench_dedupe():
    """Dedupe-encode throughput: the full train step on a template-corpus
    text batch (B·D rows drawn from U distinct descriptions) with the plain
    layout vs the deduped (unique+inverse gather) layout, and the
    multiattention step with the role/label channels deduped to the label
    vocabulary. Loss/grad equality is covered by tests/test_dedupe.py; this
    measures what the exactness buys. BENCH_DEDUPE_UNIQUE sweeps U."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.data.dedupe import dedupe_rows
    from clip_event_tpu.data.labels import build_label_layout
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import create_train_state, make_multi_step
    from clip_event_tpu.models import VIT_B32, init_params
    from clip_event_tpu.models import layers

    cfg = VIT_B32
    rng = np.random.default_rng(0)
    layout = build_label_layout(B, 1, D - 1, "ce", True)
    optimizer = build_optimizer("adam", build_schedule("none", 1e-6, 30))
    params = init_params(jax.random.PRNGKey(0), cfg)
    steps = STEPS

    def _texts_from_vocab(n_rows, n_unique, seed=1):
        r = np.random.default_rng(seed)
        vocab = r.integers(1, 49000, size=(n_unique, cfg.context_length)).astype(np.int32)
        vocab[:, -1] = cfg.vocab_size - 1
        return vocab[r.integers(0, n_unique, size=n_rows)]

    base = {
        "image": jnp.asarray(_image_inputs(cfg)),
        "labels_per_image": jnp.asarray(layout.labels_per_image),
        "labels_per_text": jnp.asarray(layout.labels_per_text),
        "index_pos": jnp.asarray(layout.index_pos),
    }
    uniques = os.environ.get("BENCH_DEDUPE_UNIQUE", "96,192,384")
    layers.set_attention_impl("pallas")
    try:
        _, run_k = make_multi_step(
            cfg, optimizer, steps, loss_type="ce", overbatch=True,
            compute_dtype=jnp.bfloat16, remat=True, donate=False,
        )

        def run_case(label, batch):
            holder = {"state": create_train_state(params, optimizer)}

            def call(c):
                s, m = run_k(holder["state"], batch)
                holder["state"] = s
                return m["loss"][-1] + c * 0

            dt = _bench_chain(call, steps, calls=2)
            print(f"{label:<44s} {dt * 1e3:8.2f} ms/step "
                  f"({B * D / dt:,.0f} pairs/s)", flush=True)

        text = _texts_from_vocab(B * D, 96)
        run_case(f"step plain (B={B}, D={D})", dict(base, text=jnp.asarray(text)))
        for u in (int(x) for x in uniques.split(",")):
            text = _texts_from_vocab(B * D, u, seed=u)
            uniq, inv = dedupe_rows(text, cap=u)
            run_case(
                f"step deduped (U={u} of {B * D})",
                dict(base, text_unique=jnp.asarray(uniq),
                     text_inverse=jnp.asarray(inv)),
            )

        # multiattention: role/label texts from a 64-string label vocabulary
        R = int(os.environ.get("BENCH_BBOXES", 8))
        ma = dict(
            base,
            text=jnp.asarray(_texts_from_vocab(B * D, 96)),
            bbox=jnp.asarray(
                np.sort(rng.random((B, R, 2, 2)).astype(np.float32), axis=2)
                .reshape(B, R, 4)
            ),
            bbox_mask=jnp.asarray((rng.random((B, R)) < 0.6).astype(np.int32)),
        )
        role = _texts_from_vocab(B * R, 64, seed=7)
        lab = _texts_from_vocab(B * R, 64, seed=8)
        for mode in ("desc", "desc_type"):
            _, run_ma = make_multi_step(
                cfg, optimizer, 3, loss_type="ce", overbatch=True,
                multiattention=mode, compute_dtype=jnp.bfloat16, remat=True,
                donate=False,
            )

            def run_case_ma(label, batch, run=run_ma):
                holder = {"state": create_train_state(params, optimizer)}

                def call(c):
                    s, m = run(holder["state"], batch)
                    holder["state"] = s
                    return m["loss"][-1] + c * 0

                dt = _bench_chain(call, 3, calls=2)
                print(f"{label:<44s} {dt * 1e3:8.2f} ms/step "
                      f"({B * D / dt:,.0f} pairs/s)", flush=True)

            plain = dict(
                ma,
                bbox_desc_text=jnp.asarray(role.reshape(B, R, -1)),
                bbox_label_text=jnp.asarray(lab.reshape(B, R, -1)),
            )
            run_case_ma(f"multiattn plain ({mode}, R={R})", plain)
            ru, ri = dedupe_rows(role, cap=64)
            lu, li = dedupe_rows(lab, cap=64)
            tu, ti = dedupe_rows(np.asarray(ma["text"]), cap=96)
            ded = dict(
                ma,
                bbox_desc_unique=jnp.asarray(ru), bbox_desc_inverse=jnp.asarray(ri),
                bbox_label_unique=jnp.asarray(lu), bbox_label_inverse=jnp.asarray(li),
            )
            run_case_ma(f"multiattn sr-deduped ({mode}, U=64)", ded)
            ded_all = dict(ded, text_unique=jnp.asarray(tu),
                           text_inverse=jnp.asarray(ti))
            del ded_all["text"]
            run_case_ma(f"multiattn all-deduped ({mode})", ded_all)
    finally:
        layers.set_attention_impl("xla")


def bench_accum(ks=(2, 4)):
    """Gradient accumulation overhead: per-MICROBATCH cost of the
    K-accumulated step vs the plain single step at the same microbatch size
    (ViT-B/32, bf16, remat, pallas attention — the train defaults)."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.data.labels import build_label_layout
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import (
        create_train_state,
        make_accum_step,
        make_multi_step,
    )
    from clip_event_tpu.models import VIT_B32, init_params
    from clip_event_tpu.models import layers

    cfg = VIT_B32
    layout = build_label_layout(B, 1, D - 1, "ce", True)
    batch = {
        "image": _image_inputs(cfg),
        "text": _text_inputs(cfg),
        "labels_per_image": layout.labels_per_image,
        "labels_per_text": layout.labels_per_text,
        "index_pos": layout.index_pos,
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    optimizer = build_optimizer("adam", build_schedule("none", 1e-6, 30))
    params = init_params(jax.random.PRNGKey(0), cfg)

    layers.set_attention_impl("pallas")
    try:
        # baseline: per-optimizer-step time at the microbatch size
        _, run_k = make_multi_step(cfg, optimizer, STEPS, loss_type="ce",
                                   overbatch=True, compute_dtype=jnp.bfloat16,
                                   remat=True, donate=False)
        holder = {"state": create_train_state(params, optimizer)}

        def call(c):
            s, m = run_k(holder["state"], batch)
            holder["state"] = s
            return m["loss"][-1] + c * 0

        dt0 = _bench_chain(call, STEPS)
        print(f"{'single step (B=%d)' % B:<44s} {dt0 * 1e3:8.2f} ms/microbatch",
              flush=True)

        for K in ks:
            stacked = {k: jnp.stack([v] * K) for k, v in batch.items()}
            accum = make_accum_step(cfg, optimizer, K, loss_type="ce",
                                    overbatch=True, compute_dtype=jnp.bfloat16,
                                    remat=True, donate=False)
            holder_a = {"state": create_train_state(params, optimizer)}

            def call_a(c):
                s, m = accum(holder_a["state"], stacked)
                holder_a["state"] = s
                return m["loss"] + c * 0

            # match the baseline's tail-fetch amortization: chain enough
            # calls that calls*K ≈ CALLS*STEPS microbatches
            dt = _bench_chain(call_a, K, calls=max(4, (CALLS * STEPS) // K))
            print(f"{'accum K=%d (B=%d micro, eff %d)' % (K, B, K * B):<44s} "
                  f"{dt * 1e3:8.2f} ms/microbatch "
                  f"({dt / dt0 * 100 - 100:+.1f}% vs single)", flush=True)
    finally:
        layers.set_attention_impl("xla")


def bench_ckpt():
    """Checkpoint save cost (ViT-B/32 full f32 state ≈ 1.8 GB): sync write
    vs async_save's return time, and the real overlap win — K train steps
    issued while the async commit runs in the background. Host wall-clock
    timing is correct here: save_checkpoint's device→host snapshot
    internally syncs, and the train-step overlap run ends in a host fetch."""
    import shutil
    import tempfile
    import time

    import jax
    import jax.numpy as jnp

    from clip_event_tpu.data.labels import build_label_layout
    from clip_event_tpu.engine.checkpoint import save_checkpoint, wait_for_saves
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import create_train_state, make_multi_step
    from clip_event_tpu.models import VIT_B32, init_params
    from clip_event_tpu.models import layers

    cfg = VIT_B32
    layout = build_label_layout(B, 1, D - 1, "ce", True)
    batch = {
        "image": _image_inputs(cfg),
        "text": _text_inputs(cfg),
        "labels_per_image": layout.labels_per_image,
        "labels_per_text": layout.labels_per_text,
        "index_pos": layout.index_pos,
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    optimizer = build_optimizer("adam", build_schedule("none", 1e-6, 30))
    state = create_train_state(
        init_params(jax.random.PRNGKey(0), cfg), optimizer
    )
    nbytes = sum(l.nbytes for l in jax.tree.leaves((state.params, state.opt_state)))
    print(f"state size: {nbytes / 1e9:.2f} GB", flush=True)

    layers.set_attention_impl("pallas")
    tmp = tempfile.mkdtemp(prefix="bench_ckpt_")
    try:
        _, run_k = make_multi_step(cfg, optimizer, STEPS, loss_type="ce",
                                   overbatch=True, compute_dtype=jnp.bfloat16,
                                   remat=True, donate=False)
        # warm the jit + one save (directory creation, orbax init)
        _, m = run_k(state, batch)
        float(m["loss"][-1])
        save_checkpoint(tmp, "warm", 0, state.params, state.opt_state)

        for mode in ("sync", "async"):
            t0 = time.perf_counter()
            save_checkpoint(tmp, mode, 0, state.params, state.opt_state,
                            async_save=(mode == "async"))
            t_ret = time.perf_counter() - t0
            _, m = run_k(state, batch)  # K steps issued behind the save
            float(m["loss"][-1])
            wait_for_saves()
            t_total = time.perf_counter() - t0
            print(f"{mode + ' save':<28s} return {t_ret * 1e3:8.1f} ms   "
                  f"save+{STEPS}steps total {t_total * 1e3:8.1f} ms", flush=True)
    finally:
        layers.set_attention_impl("xla")
        shutil.rmtree(tmp, ignore_errors=True)


def bench_moments():
    """moment_dtype='bfloat16' vs f32 moments: optimizer-state bytes and
    end-to-end step time (the bf16 mu halves one of the two moment reads +
    writes per step; Adam is elementwise so the effect is pure HBM)."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.data.labels import build_label_layout
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import create_train_state, make_multi_step
    from clip_event_tpu.models import VIT_B32, init_params
    from clip_event_tpu.models import layers

    cfg = VIT_B32
    layout = build_label_layout(B, 1, D - 1, "ce", True)
    batch = {
        "image": _image_inputs(cfg),
        "text": _text_inputs(cfg),
        "labels_per_image": layout.labels_per_image,
        "labels_per_text": layout.labels_per_text,
        "index_pos": layout.index_pos,
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_params(jax.random.PRNGKey(0), cfg)

    layers.set_attention_impl("pallas")
    try:
        for mdtype in (None, "bfloat16"):
            optimizer = build_optimizer("adam", build_schedule("none", 1e-6, 30),
                                        moment_dtype=mdtype)
            # fresh jitted fn per variant: trace caches don't key on globals
            _, run_k = make_multi_step(cfg, optimizer, STEPS, loss_type="ce",
                                       overbatch=True, compute_dtype=jnp.bfloat16,
                                       remat=True, donate=False)
            holder = {"state": create_train_state(params, optimizer)}
            obytes = sum(l.nbytes for l in jax.tree.leaves(holder["state"].opt_state))

            def call(c):
                s, m = run_k(holder["state"], batch)
                holder["state"] = s
                return m["loss"][-1] + c * 0

            dt = _bench_chain(call, STEPS)
            print(f"{'moments=' + str(mdtype):<28s} opt state {obytes / 1e6:7.1f} MB   "
                  f"{dt * 1e3:8.2f} ms/step", flush=True)
    finally:
        layers.set_attention_impl("xla")


EXPERIMENTS = {
    "matmul": bench_matmul,
    "ckpt": bench_ckpt,
    "moments": bench_moments,
    "accum": bench_accum,
    "megakernel": bench_megakernel,
    "alignment": bench_alignment,
    "multiattention": bench_multiattention,
    "dedupe": bench_dedupe,
    "step": bench_step,
    "text": bench_text,
    "vision": bench_vision,
    "unroll": bench_unroll,
    "textsplit": bench_textsplit,
    "visionsplit": bench_visionsplit,
    "ot": bench_ot,
    "latency": bench_latency,
    "quant": bench_quant,
    "quantgemm": bench_quantgemm,
    "ln": bench_ln,
    "textwidth": bench_textwidth,
}


def main():
    import jax

    names = sys.argv[1:] or ["step", "text", "vision", "matmul"]
    print(f"devices: {jax.devices()}")
    for name in names:
        print(f"---- {name}", flush=True)
        EXPERIMENTS[name]()


if __name__ == "__main__":
    main()
