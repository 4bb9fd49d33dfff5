"""Backend pinning.

The axon TPU plugin in some images re-registers itself during plugin
discovery even when `JAX_PLATFORMS` asks for cpu; pinning through
`jax.config` before first backend use always wins. Every entry point calls
`ensure_backend()` first.
"""

from __future__ import annotations

import os


def ensure_backend() -> None:
    requested = os.environ.get("JAX_PLATFORMS")
    if not requested:
        return
    import jax

    try:
        jax.config.update("jax_platforms", requested)
    except Exception:  # already initialized with the right backend
        pass
