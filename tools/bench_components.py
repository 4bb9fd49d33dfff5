"""Component-level TPU benchmark: where does the train step's time go, and
which variant wins?

Runs a matrix of experiments in ONE process (TPU attach + compile amortized)
and prints a table. Every timed graph threads a data dependency through a
lax.scan carry (identical iterations get CSE'd) and consumes the full
gradient tree (summing one leaf DCEs the rest of the backward) — see
PERFORMANCE.md "Benchmarking pitfalls".

Usage (TPU must be otherwise idle — it is single-client here):
    python tools/bench_components.py                # default experiment set
    python tools/bench_components.py step text vision matmul
"""

from __future__ import annotations

import sys
import time

import numpy as np

B = 256
D = 3
STEPS = 10


def _median_time(fn, *args, calls=3):
    import jax

    out = fn(*args)  # compile + warmup
    jax.block_until_ready(out)
    times = []
    for _ in range(calls):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def _tower_grad_bench(name, cfg, params, batch_x, fwd_fn, steps=STEPS, remat_mode="full"):
    """Median per-iteration time of value_and_grad(tower loss), K iters fused
    in one dispatch with a carried data dependency."""
    import jax
    import jax.numpy as jnp

    def loss(p, x, c):
        out = fwd_fn(p, x, c)
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    grad_fn = jax.value_and_grad(loss)

    @jax.jit
    def many(p, x):
        def body(carry, _):
            val, grads = grad_fn(p, x, carry)
            # consume every gradient leaf; fold into the carry
            gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
            return carry + val + gsum * 1e-12, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=steps)
        return c

    dt = _median_time(many, params, batch_x) / steps
    print(f"{name:<44s} {dt * 1e3:8.2f} ms/iter")
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
    for name, sa, sb in shapes:
        a = jnp.asarray(rng.normal(size=sa), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=sb), jnp.bfloat16)

        @jax.jit
        def many(a, b):
            def body(c, _):
                out = jnp.dot(a + c * 1e-9, b, preferred_element_type=jnp.float32)
                return jnp.mean(out) * 1e-9, None

            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=STEPS)
            return c

        dt = _median_time(many, a, b) / STEPS
        fl = 2 * sa[0] * sa[1] * sb[1]
        print(f"{name:<44s} {dt * 1e3:8.3f} ms  {fl / dt / 1e12:7.1f} TF/s")


def _text_inputs(cfg):
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 49000, size=(B * D, cfg.context_length)).astype(np.int32)
    tokens[:, -1] = cfg.vocab_size - 1
    return tokens


def _image_inputs(cfg):
    rng = np.random.default_rng(0)
    return rng.normal(size=(B, cfg.image_resolution, cfg.image_resolution, 3)).astype(np.float32)


def bench_text(variants=("remat", "noremat", "dots", "pallas", "unroll")):
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.models import VIT_B32, init_params
    from clip_event_tpu.models import clip as clip_model
    from clip_event_tpu.models import layers

    cfg = VIT_B32
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(_text_inputs(cfg))

    def make_fwd(remat, impl="xla"):
        def fwd(p, x, c):
            layers.set_attention_impl(impl)
            try:
                out = clip_model.encode_text(
                    p, cfg, x, compute_dtype=jnp.bfloat16, remat=remat
                )
            finally:
                layers.set_attention_impl("xla")
            return out + c * 0

        return fwd

    if "remat" in variants:
        _tower_grad_bench("text grad, remat=nothing_saveable", cfg, params, tokens, make_fwd(True))
    if "noremat" in variants:
        try:
            _tower_grad_bench("text grad, no remat", cfg, params, tokens, make_fwd(False))
        except Exception as e:
            print(f"{'text grad, no remat':<44s} FAILED: {type(e).__name__}")
    if "pallas" in variants:
        _tower_grad_bench("text grad, remat + pallas attention", cfg, params, tokens,
                          make_fwd(True, impl="pallas"))


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
                p, cfg, x + c * 0, compute_dtype=jnp.bfloat16, remat=remat
            )

        return fwd

    _tower_grad_bench("vision grad, remat", cfg, params, images, make_fwd(True))
    try:
        _tower_grad_bench("vision grad, no remat", cfg, params, images, make_fwd(False))
    except Exception as e:
        print(f"{'vision grad, no remat':<44s} FAILED: {type(e).__name__}")


def bench_step():
    """Full train step (the bench.py configuration) for reference."""
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.data.labels import build_label_layout
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import create_train_state, make_multi_step
    from clip_event_tpu.models import VIT_B32, init_params

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
    _, run_k = make_multi_step(cfg, optimizer, STEPS, loss_type="ce", overbatch=True,
                               compute_dtype=jnp.bfloat16, remat=True, donate=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, optimizer)

    def run(state, batch):
        s, m = run_k(state, batch)
        return m["loss"]

    dt = _median_time(run, state, batch) / STEPS
    print(f"{'full train step (remat, bf16, B=256)':<44s} {dt * 1e3:8.2f} ms/step "
          f"({B * D / dt:,.0f} pairs/s)")


EXPERIMENTS = {
    "matmul": bench_matmul,
    "step": bench_step,
    "text": bench_text,
    "vision": bench_vision,
}


def main():
    import jax

    names = sys.argv[1:] or ["step", "text", "vision", "matmul"]
    print(f"devices: {jax.devices()}")
    for name in names:
        print(f"---- {name}")
        EXPERIMENTS[name]()


if __name__ == "__main__":
    main()
