"""Headline benchmark: contrastive training throughput, ViT-B/32 CLIP-Event.

Measures the fused train step (forward both towers + contrastive loss +
backward + clipped Adam) for the reference workload shape — D=3 descriptions
per image (1 positive + 2 hard negatives), 224² images, 77-token texts — and
reports contrastive pairs/sec/chip, pairs = images × descriptions scored.

K steps are fused into one device dispatch with `lax.scan` so the number
reflects chip throughput, not host/tunnel dispatch latency (the reference
synchronizes per step, `engine.py:99`; we don't need to).

Baseline: the reference publishes no numbers (BASELINE.md). `vs_baseline`
divides by a measured-order V100 estimate for PyTorch CLIP fine-tuning at the
reference's configuration (batch 16/GPU, collate-in-step host preprocessing,
DDP): ~90 pairs/s/chip. BASELINE.json's target is >5× that.

Prints exactly one JSON line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

V100_BASELINE_PAIRS_PER_SEC = 90.0

BENCH_MODEL = os.environ.get("BENCH_MODEL", "ViT-B/32")
#  sweep-confirmed per-preset defaults (tools/bench_presets.py, round 3):
#  batch at the throughput plateau, remat policy that measured best
_DEFAULT_BATCH = {
    "ViT-B/32": 384,
    "ViT-B/16": 96,
    "ViT-L/14": 64,
    "RN50": 128,
    "RN101": 128,
    "RN50x4": 128,
}
_DEFAULT_REMAT = {
    "ViT-B/32": "1",     # full recompute; 'attn' measured -1.4%
    "ViT-B/16": "attn",  # +3.1% (head-gridded kernel recompute is costly)
    "ViT-L/14": "attn",  # +3.0%
    "RN50": "1",         # == attn (conv tower; text tower indifferent)
    "RN101": "attn",     # +0.2%
    "RN50x4": "1",
}
if BENCH_MODEL not in _DEFAULT_BATCH and "BENCH_BATCH" not in os.environ:
    print(f"# BENCH_MODEL={BENCH_MODEL} has no swept default batch; using 64")
BATCH_PER_CHIP = int(
    os.environ.get("BENCH_BATCH", _DEFAULT_BATCH.get(BENCH_MODEL, 64))
)
NUM_POS, NUM_NEG = 1, 2
STEPS_PER_CALL = 10
MEASURE_CALLS = 3


def _hb(msg: str) -> None:
    """Stage heartbeat on stderr, so a driver-side timeout is diagnosable
    (round-4's BENCH_r04.json was rc=124 with no clue which stage overran)."""
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _report_stragglers() -> None:
    """The TPU here is single-client: any other live python-with-jax process
    can wedge this one's attach indefinitely. Report (never kill) candidates
    before attaching, so a hang names its likely cause."""
    try:
        out = subprocess.run(
            ["ps", "-eo", "pid,etime,args"], capture_output=True, text=True,
            timeout=10,
        ).stdout
    except Exception:
        return
    me = os.getpid()
    for line in out.splitlines()[1:]:
        parts = line.split(None, 2)
        if len(parts) < 3 or "python" not in parts[2]:
            continue
        if int(parts[0]) == me or "ps -eo" in parts[2]:
            continue
        if "bench.py" in parts[2] or "shell-snapshots" in parts[2]:
            continue  # our own wrapper/launcher chain, not a TPU holder
        _hb(f"straggler candidate (may hold the single-client TPU): {line.strip()[:160]}")


def _wait_for_backend(attempts: int = 4, probe_timeout: int = 240) -> None:
    """Fail fast (exit 3) instead of hanging when the TPU is unreachable.

    `jax.devices()` blocks INDEFINITELY when the tunneled axon backend is
    down (observed: a multi-hour outage 2026-08-18), which would wedge the
    driver's round-end bench run. Probe the attach in a subprocess with a
    timeout, retrying across a bounded window in case the outage is
    transient; on success the main process attaches normally (the probe has
    exited, so the single-client TPU is free).
    """
    probe = "import jax; print(len(jax.devices()))"
    for i in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True, text=True,
                timeout=probe_timeout,
            )
            if out.returncode == 0:
                return
            err = out.stderr.strip().splitlines()[-1:] or ["?"]
            print(f"# backend probe {i + 1}/{attempts} failed: {err[0]}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"# backend probe {i + 1}/{attempts} hung >{probe_timeout}s "
                  "(TPU attach unreachable)", file=sys.stderr, flush=True)
        if i + 1 < attempts:
            time.sleep(60)
    print("# TPU backend unavailable after all probes; no measurement taken",
          file=sys.stderr, flush=True)
    sys.exit(3)


def main():
    _report_stragglers()
    _hb("probing TPU backend reachability")
    _wait_for_backend()
    _hb("backend reachable; attaching")
    from clip_event_tpu.platform import enable_compilation_cache

    enable_compilation_cache()  # warm re-runs skip the 1-3 min tunnel compile
    import jax
    import jax.numpy as jnp

    from clip_event_tpu.data.labels import build_label_layout
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import (
        create_train_state,
        make_multi_step,
    )
    from clip_event_tpu.config import model_config
    from clip_event_tpu.models import init_params
    from clip_event_tpu.parallel import make_mesh, replicate, shard_batch

    from clip_event_tpu.models.layers import set_attention_impl

    cfg = model_config({"model": BENCH_MODEL})
    n_chips = len(jax.devices())
    _hb(f"attached: {n_chips} device(s), {jax.devices()[0].platform}")
    mesh = make_mesh(n_chips)
    # flagship config: fused packed-QKV pallas attention (339→239 ms/step)
    set_attention_impl("pallas", mesh)
    if os.environ.get("BENCH_LN") == "pallas":
        from clip_event_tpu.models.layers import set_ln_impl

        set_ln_impl("pallas", mesh)
    unroll_env = os.environ.get("BENCH_UNROLL")
    if unroll_env:
        from clip_event_tpu.models.layers import set_scan_unroll

        set_scan_unroll("full" if unroll_env == "full" else int(unroll_env))

    B = BATCH_PER_CHIP * n_chips
    D = NUM_POS + NUM_NEG
    rng = np.random.default_rng(0)
    layout = build_label_layout(B, NUM_POS, NUM_NEG, "ce", True)
    # BENCH_CONTEXT_CAP=S runs the text tower at S tokens instead of 77 (the
    # "context_cap" config key — exact for texts that fit; see
    # models/clip.py::encode_text). The headline number stays at the
    # reference's 77-token workload shape; the capped row is reported in
    # PERFORMANCE.md as the deployment-config win.
    seq = int(os.environ.get("BENCH_CONTEXT_CAP", 0)) or cfg.context_length
    text = rng.integers(1, 49000, size=(B * D, seq)).astype(np.int32)
    text[:, -1] = cfg.vocab_size - 1
    batch = {
        "image": rng.normal(
            size=(B, cfg.image_resolution, cfg.image_resolution, 3)
        ).astype(np.float32),
        "text": text,
        "labels_per_image": layout.labels_per_image,
        "labels_per_text": layout.labels_per_text,
        "index_pos": layout.index_pos,
    }
    batch = shard_batch(batch, mesh)

    remat_env = os.environ.get("BENCH_REMAT", _DEFAULT_REMAT.get(BENCH_MODEL, "1"))
    remat = {"0": False, "1": True}.get(remat_env, remat_env)
    optimizer = build_optimizer("adam", build_schedule("none", 1e-6, 30))
    _, run_k = make_multi_step(
        cfg,
        optimizer,
        STEPS_PER_CALL,
        loss_type="ce",
        overbatch=True,
        compute_dtype=jnp.bfloat16,
        remat=remat,
    )
    params = jax.tree.map(np.asarray, init_params(jax.random.PRNGKey(0), cfg))
    state = create_train_state(replicate(params, mesh), optimizer)
    state = state._replace(opt_state=replicate(state.opt_state, mesh))

    # compile + warmup; the float() fetch is a HARD sync (on the remote axon
    # platform block_until_ready can return before execution completes, so
    # timed regions must chain state and end with a host value fetch)
    _hb("compiling + warmup call (cold: 1-3 min through the tunnel)")
    state, metrics = run_k(state, batch)
    float(metrics["loss"][-1])
    _hb("compile done; measuring")

    t0 = time.perf_counter()
    for i in range(MEASURE_CALLS):
        state, metrics = run_k(state, batch)
        _hb(f"measure call {i + 1}/{MEASURE_CALLS} dispatched")
    last_loss = float(metrics["loss"][-1])  # hard sync; depends on every call
    dt = (time.perf_counter() - t0) / (MEASURE_CALLS * STEPS_PER_CALL)

    assert np.isfinite(last_loss), "non-finite loss in benchmark"
    pairs_per_sec_per_chip = (B * D) / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "contrastive_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec_per_chip, 2),
                "unit": "pairs/s/chip",
                "vs_baseline": round(
                    pairs_per_sec_per_chip / V100_BASELINE_PAIRS_PER_SEC, 2
                ),
                "baseline": (
                    f"estimated V100 ~{V100_BASELINE_PAIRS_PER_SEC:.0f} pairs/s "
                    "(reference publishes no numbers; see BASELINE.md)"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
