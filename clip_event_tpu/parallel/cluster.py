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

Under OpenMPI the master address resolves through the reference's full
sub-environment ladder (`utils_MPIAdapter.py:43-98`): MASTER_ADDR env →
Philly (PHILLY_CONTAINER_IP on rank 0, mpi4py-broadcast) → AMLK8S/ITP
(worker-0 IP from the shared `/dlts-runtime/env/init.env`, with the
single-node debugging fallback) → AML (`AZ_BATCH_MASTER_NODE`) →
single-node loopback → hostfile → generic multi-node (`hostname -I` on
rank 0, mpi4py-broadcast). The two broadcast branches need mpi4py exactly
as the reference does (`utils_MPIAdapter.py:3`); it is an OPTIONAL import
here — without it those branches raise with instructions to export
MASTER_ADDR from the launcher instead.
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
        addr, port, source = _resolve_mpi_master(env, size, rank)
        return ClusterSpec(f"{addr}:{port}" if addr else None, size, rank, source)

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


# AMLK8S (ITP) writes the worker-0 IP into this per-node file
# (utils_MPIAdapter.py:55-73, regex from k8s-wiki.azureml.com/faq.html);
# overridable for tests.
ITP_ENV_FILE = "/dlts-runtime/env/init.env"


def _mpi_bcast(value, rank: int):
    """Broadcast rank 0's value exactly as the reference does
    (`MPI.COMM_WORLD.bcast`, utils_MPIAdapter.py:53-54, 97-98). mpi4py is an
    optional dependency — raise actionably when the environment needs a
    broadcast but can't perform one."""
    try:
        from mpi4py import MPI  # type: ignore
    except ImportError:
        MPI = None
    if MPI is None:  # missing, or an unusable/stubbed install
        raise RuntimeError(
            "this MPI environment needs rank 0's address broadcast "
            "(mpi4py in the reference, utils_MPIAdapter.py:3) but mpi4py is "
            "not installed — export MASTER_ADDR/MASTER_PORT from the "
            "launcher instead"
        ) from None
    return MPI.COMM_WORLD.bcast(value, root=0)


def _resolve_mpi_master(env, size: int, rank: int):
    """(addr, port, source) under OpenMPI — the reference's sub-environment
    ladder (utils_MPIAdapter.py:43-98)."""
    local_size = int(env.get("OMPI_COMM_WORLD_LOCAL_SIZE", "1"))
    port = env.get("MASTER_PORT", _DEFAULT_PORT)

    if env.get("MASTER_ADDR"):
        return env["MASTER_ADDR"], port, "openmpi"

    if "PHILLY_CONTAINER_IP" in env:  # utils_MPIAdapter.py:43-54
        pair = (
            (env["PHILLY_CONTAINER_IP"],
             env.get("PHILLY_CONTAINER_PORT_RANGE_START", port))
            if rank == 0 else None
        )
        addr, port = _mpi_bcast(pair, rank) if size > 1 else pair
        return addr, port, "openmpi/philly"

    if "AMLK8S_NUM_WORKER" in env or "AZ_CMK8S_JOB_WORK_DIR" in env:
        # AMLK8S (ITP), utils_MPIAdapter.py:55-73: worker-0 IP from the
        # per-node init.env file; single-node debugging fallback otherwise
        import re

        path = env.get("CLIP_EVENT_ITP_ENV_FILE", ITP_ENV_FILE)
        match = None
        if os.path.exists(path):
            with open(path) as fh:
                match = re.match(
                    r"[\s\S]*export[\s]*DLTS_SD_worker0_IP=([0-9.]+)[\s|s]*",
                    fh.read(),
                )
        if match:
            return match.group(1), port, "openmpi/itp"
        if size != local_size:
            raise RuntimeError(
                f"AMLK8S (ITP) multi-node job but no worker-0 IP in {path} "
                "(reference asserts the same, utils_MPIAdapter.py:69-71)"
            )
        return "127.0.0.1", port, "openmpi/itp-single-node"

    if "AZ_BATCH_MASTER_NODE" in env:  # multi-node AML, :74-79
        return env["AZ_BATCH_MASTER_NODE"].split(":")[0], port, "openmpi/aml"

    if size == local_size:  # single node, :80-84
        return "127.0.0.1", port, "openmpi/single-node"

    addr = _first_host(env.get("OMPI_MCA_orte_default_hostfile"))
    if addr:
        return addr, port, "openmpi"

    # generic multi-node MPI: rank 0 resolves its own address, :85-98
    if rank == 0:
        out = subprocess.run(
            ["hostname", "-I"], capture_output=True, text=True, timeout=10
        ).stdout
        pair = (out.split()[0], port) if out.split() else (None, port)
    else:
        pair = None
    addr, port = _mpi_bcast(pair, rank)
    return addr, port, "openmpi/multi-node"


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
