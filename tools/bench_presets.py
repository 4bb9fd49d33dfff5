"""Preset sweep: train-step throughput for every zoo model across batch
sizes and remat policies, in ONE process (TPU attach amortized; each config
still pays its own compile through the remote-compile tunnel).

Usage:
    python tools/bench_presets.py                       # default sweep grid
    python tools/bench_presets.py "ViT-L/14:64:1" "RN101:96:1" ...
        (entries are MODEL:BATCH:REMAT; REMAT in 0/1/attn/dots/dots_nobatch)

Timing follows the chained-carry + host-fetch methodology (PERFORMANCE.md):
state is threaded across calls and each timed region ends in a float() fetch.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_GRID = [
    # ViT-L/14: remat-policy re-sweep at W=1024 + memory ceiling (VERDICT r2 #2)
    "ViT-L/14:64:1", "ViT-L/14:64:attn", "ViT-L/14:64:dots_nobatch",
    "ViT-L/14:96:1", "ViT-L/14:128:1",
    # ViT-B/16: batch + policy check beyond the single round-2 datapoint
    "ViT-B/16:96:1", "ViT-B/16:128:1", "ViT-B/16:160:1", "ViT-B/16:96:attn",
    # RN101 / RN50x4: first benchmark rows
    "RN101:64:1", "RN101:96:1", "RN101:128:1",
    "RN50x4:32:1", "RN50x4:64:1", "RN50x4:96:1",
]

# BENCH_FAST=1: per-preset regression guard — ONE call per preset at its
# swept-best config, compared against the recorded round-4 numbers so a
# kernel/layers change that regresses one preset while ViT-B/32 stays flat
# is visible at round close (VERDICT r4 next #7). Expected values are the
# post-block-calibration measurements (PERFORMANCE.md preset table).
FAST_GRID = {
    "ViT-B/32:384:1": 3312.0,
    "ViT-B/16:96:attn": 1859.0,
    "ViT-L/14:64:attn": 519.0,
    "RN50:128:1": 2929.0,
    "RN101:128:attn": 2575.0,
    "RN50x4:128:1": 1309.0,
}
# regression alarm threshold; single-call noise measured well under this
FAST_TOLERANCE = 0.05

NUM_POS, NUM_NEG = 1, 2
STEPS_PER_CALL = 10
MEASURE_CALLS = 3


def bench_one(model: str, batch_per_chip: int, remat, measure_calls=MEASURE_CALLS):
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.config import model_config
    from clip_event_tpu.data.labels import build_label_layout
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import create_train_state, make_multi_step
    from clip_event_tpu.models import init_params
    from clip_event_tpu.models.layers import set_attention_impl
    from clip_event_tpu.parallel import make_mesh, replicate, shard_batch

    cfg = model_config({"model": model})
    n_chips = len(jax.devices())
    mesh = make_mesh(n_chips)
    set_attention_impl("pallas", mesh)

    B = batch_per_chip * n_chips
    D = NUM_POS + NUM_NEG
    rng = np.random.default_rng(0)
    layout = build_label_layout(B, NUM_POS, NUM_NEG, "ce", True)
    text = rng.integers(1, 49000, size=(B * D, cfg.context_length)).astype(np.int32)
    text[:, -1] = cfg.vocab_size - 1
    batch = shard_batch({
        "image": rng.normal(
            size=(B, cfg.image_resolution, cfg.image_resolution, 3)
        ).astype(np.float32),
        "text": text,
        "labels_per_image": layout.labels_per_image,
        "labels_per_text": layout.labels_per_text,
        "index_pos": layout.index_pos,
    }, mesh)

    optimizer = build_optimizer("adam", build_schedule("none", 1e-6, 30))
    _, run_k = make_multi_step(
        cfg, optimizer, STEPS_PER_CALL, loss_type="ce", overbatch=True,
        compute_dtype=jnp.bfloat16, remat=remat,
    )
    params = jax.tree.map(np.asarray, init_params(jax.random.PRNGKey(0), cfg))
    state = create_train_state(replicate(params, mesh), optimizer)
    state = state._replace(opt_state=replicate(state.opt_state, mesh))

    state, metrics = run_k(state, batch)
    float(metrics["loss"][-1])  # compile + hard sync

    t0 = time.perf_counter()
    for _ in range(measure_calls):
        state, metrics = run_k(state, batch)
    assert np.isfinite(float(metrics["loss"][-1]))  # hard sync
    dt = (time.perf_counter() - t0) / (measure_calls * STEPS_PER_CALL)
    return dt, (B * D) / dt / n_chips


def main():
    from clip_event_tpu.platform import enable_compilation_cache

    enable_compilation_cache()
    import jax

    fast = os.environ.get("BENCH_FAST") == "1"
    grid = sys.argv[1:] or (list(FAST_GRID) if fast else DEFAULT_GRID)
    calls = 1 if fast else MEASURE_CALLS
    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    for entry in grid:
        model, b, remat_s = entry.rsplit(":", 2)
        remat = {"0": False, "1": True}.get(remat_s, remat_s)
        label = f"{model:<9s} B={b:<4s} remat={remat_s}"
        try:
            dt, pps = bench_one(model, int(b), remat, measure_calls=calls)
            results[entry] = pps
            print(f"{label:<34s} {dt * 1e3:8.1f} ms/step  {pps:8.0f} pairs/s/chip",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"{label:<34s} FAILED: {type(e).__name__}: {msg}", flush=True)
    if fast:
        import json

        regressed = {
            e: (results.get(e), FAST_GRID[e])
            for e in FAST_GRID
            if e not in results
            or results[e] < FAST_GRID[e] * (1 - FAST_TOLERANCE)
        }
        # one machine-checkable line: the PERFORMANCE.md round row + verdict
        print(json.dumps({
            "fast_presets": {e: round(v, 1) for e, v in results.items()},
            "expected": FAST_GRID,
            "tolerance": FAST_TOLERANCE,
            "regressed": {
                e: {"got": got, "expected": exp}
                for e, (got, exp) in regressed.items()
            },
            "ok": not regressed,
        }), flush=True)


if __name__ == "__main__":
    main()
