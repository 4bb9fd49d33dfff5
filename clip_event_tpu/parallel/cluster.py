"""Cluster environment adapter (reference `MPIAdapter`,
`utils_MPIAdapter.py:12-144`).

Detects the launch environment and produces the rendezvous parameters for
`jax.distributed.initialize`. TPU pods usually need nothing (libtpu +
megascale discover the topology), but the adapter keeps the same shape as
the reference for GPU/CPU multi-process runs and for explicit env-driven
launches:

  priority: explicit env (JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID)
          → OpenMPI (OMPI_COMM_WORLD_*) → SLURM (SLURM_PROCID/NODELIST)
          → single process.

Deliberately dropped from the reference: the Philly, AMLK8S/ITP, and AML
rendezvous branches (`utils_MPIAdapter.py:43-98`) — Azure-internal cluster
stacks that were retired years before this rebuild and whose detection
relied on files (`/dlts-runtime/env/init.env`) and env vars
(`AZ_BATCH_MASTER_NODE`) those platforms injected. A deployment on a
comparable scheduler should export the explicit JAX_COORDINATOR_* env
(first branch) from its launcher instead.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import subprocess
from typing import Optional

log = logging.getLogger(__name__)

_DEFAULT_PORT = "9010"


@dataclasses.dataclass
class ClusterSpec:
    coordinator_address: Optional[str]
    num_processes: Optional[int]
    process_id: Optional[int]
    source: str

    @property
    def is_distributed(self) -> bool:
        return bool(self.num_processes and self.num_processes > 1)


def detect_cluster() -> ClusterSpec:
    env = os.environ
    if "JAX_COORDINATOR_ADDRESS" in env or "MEGASCALE_COORDINATOR_ADDRESS" in env:
        return ClusterSpec(None, None, None, "jax-env")  # jax reads these itself

    if "OMPI_COMM_WORLD_SIZE" in env:  # OpenMPI (utils_MPIAdapter.py:24-38)
        size = int(env["OMPI_COMM_WORLD_SIZE"])
        rank = int(env["OMPI_COMM_WORLD_RANK"])
        addr = env.get("MASTER_ADDR") or _first_host(env.get("OMPI_MCA_orte_default_hostfile"))
        port = env.get("MASTER_PORT", _DEFAULT_PORT)
        return ClusterSpec(f"{addr}:{port}" if addr else None, size, rank, "openmpi")

    if "SLURM_PROCID" in env:  # SLURM (reference utils.py:560-575)
        size = int(env.get("SLURM_NTASKS", "1"))
        rank = int(env["SLURM_PROCID"])
        nodelist = env.get("SLURM_NODELIST", "")
        addr = env.get("MASTER_ADDR")
        if not addr and nodelist:
            try:
                addr = subprocess.run(
                    ["scontrol", "show", "hostnames", nodelist],
                    capture_output=True, text=True, timeout=10,
                ).stdout.split("\n")[0].strip()
            except Exception:
                addr = None
        port = env.get("MASTER_PORT", _DEFAULT_PORT)
        return ClusterSpec(f"{addr}:{port}" if addr else None, size, rank, "slurm")

    return ClusterSpec(None, 1, 0, "local")


def _first_host(hostfile: Optional[str]) -> Optional[str]:
    if not hostfile or not os.path.exists(hostfile):
        return None
    with open(hostfile) as fh:
        for line in fh:
            line = line.split()[0].strip() if line.split() else ""
            if line:
                return line
    return None


def initialize_from_cluster() -> ClusterSpec:
    """Detect + initialize jax.distributed when multi-process."""
    import jax

    spec = detect_cluster()
    log.info("cluster: %s (%s)", spec, spec.source)
    if spec.source == "jax-env":
        jax.distributed.initialize()
    elif spec.is_distributed and spec.coordinator_address:
        jax.distributed.initialize(
            coordinator_address=spec.coordinator_address,
            num_processes=spec.num_processes,
            process_id=spec.process_id,
        )
    return spec
