"""Small helpers shared by the Pallas TPU kernels."""

from __future__ import annotations

import jax


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def interpret_off_tpu(interpret: bool) -> bool:
    """Mosaic only targets TPU; fall back to interpret mode elsewhere so the
    kernels work on the virtual-CPU test/dryrun meshes."""
    return interpret or jax.default_backend() != "tpu"
