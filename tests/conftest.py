"""Test config: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere; pytest imports conftest
first, so this is the safe place.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin in this image overrides JAX_PLATFORMS during plugin
# registration; pinning via jax.config before first backend use wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Full-precision f32 matmuls for parity tests (TPU default is bf16-ish MXU
# passes; CPU honors this too and it documents the parity-mode requirement).
jax.config.update("jax_default_matmul_precision", "highest")

# NOTE: no persistent compile cache here — enable_compilation_cache()
# deliberately no-ops on the CPU backend because loading cached XLA:CPU AOT
# executables aborts the interpreter in this image (see platform.py). The
# suite pays cold compiles; the cache serves the TPU paths (bench.py,
# train.py on real chips).

REFERENCE_DIR = "/root/reference/src/clip-event"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
