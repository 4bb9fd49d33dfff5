"""Comm helpers, cluster detection, repair tool, visualization."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from clip_event_tpu.parallel.cluster import detect_cluster  # noqa: E402
from clip_event_tpu.parallel.collectives import comm, gather_features, reduce_dict  # noqa: E402
from tests.fixtures import make_voa_fixture  # noqa: E402


def test_comm_single_process():
    assert comm.world_size == 1
    assert comm.rank == 0
    assert comm.is_main_process
    comm.synchronize()  # no-op, must not hang
    assert reduce_dict({"loss": 2.0}) == {"loss": 2.0}


def test_cluster_detection(monkeypatch):
    for var in ("OMPI_COMM_WORLD_SIZE", "SLURM_PROCID", "JAX_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    spec = detect_cluster()
    assert spec.source == "local" and not spec.is_distributed

    monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "4")
    monkeypatch.setenv("OMPI_COMM_WORLD_RANK", "2")
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    spec = detect_cluster()
    assert spec.source == "openmpi"
    assert spec.coordinator_address == "10.0.0.1:9010"
    assert spec.num_processes == 4 and spec.process_id == 2

    monkeypatch.delenv("OMPI_COMM_WORLD_SIZE")
    monkeypatch.delenv("OMPI_COMM_WORLD_RANK")
    monkeypatch.setenv("SLURM_PROCID", "1")
    monkeypatch.setenv("SLURM_NTASKS", "8")
    spec = detect_cluster()
    assert spec.source == "slurm" and spec.num_processes == 8


def test_cluster_azure_branches(monkeypatch, tmp_path):
    """The reference MPIAdapter's Azure sub-environments
    (utils_MPIAdapter.py:43-98): ITP worker-0 IP from the shared init.env
    (+ single-node debugging fallback), multi-node AML via
    AZ_BATCH_MASTER_NODE, single-node MPI loopback, and the broadcast
    branches' actionable failure without mpi4py."""
    import pytest

    for var in ("MASTER_ADDR", "SLURM_PROCID", "JAX_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "8")
    monkeypatch.setenv("OMPI_COMM_WORLD_RANK", "3")
    monkeypatch.setenv("OMPI_COMM_WORLD_LOCAL_SIZE", "4")

    # AMLK8S (ITP): worker-0 IP parsed from the init.env file
    env_file = tmp_path / "init.env"
    env_file.write_text("foo=bar\nexport DLTS_SD_worker0_IP=10.1.2.3\n")
    monkeypatch.setenv("AMLK8S_NUM_WORKER", "2")
    monkeypatch.setenv("CLIP_EVENT_ITP_ENV_FILE", str(env_file))
    spec = detect_cluster()
    assert spec.source == "openmpi/itp"
    assert spec.coordinator_address == "10.1.2.3:9010"

    # ITP multi-node with no IP in the file → error (reference asserts too)
    env_file.write_text("export OTHER=1\n")
    with pytest.raises(RuntimeError, match="no worker-0 IP"):
        detect_cluster()
    # ITP single-node debugging job (world == local) → loopback
    monkeypatch.setenv("OMPI_COMM_WORLD_LOCAL_SIZE", "8")
    spec = detect_cluster()
    assert spec.source == "openmpi/itp-single-node"
    assert spec.coordinator_address == "127.0.0.1:9010"
    monkeypatch.delenv("AMLK8S_NUM_WORKER")
    monkeypatch.delenv("CLIP_EVENT_ITP_ENV_FILE")

    # multi-node AML: AZ_BATCH_MASTER_NODE host:port
    monkeypatch.setenv("OMPI_COMM_WORLD_LOCAL_SIZE", "4")
    monkeypatch.setenv("AZ_BATCH_MASTER_NODE", "10.9.8.7:6000")
    spec = detect_cluster()
    assert spec.source == "openmpi/aml"
    assert spec.coordinator_address == "10.9.8.7:9010"
    monkeypatch.delenv("AZ_BATCH_MASTER_NODE")

    # single-node MPI (world == local)
    monkeypatch.setenv("OMPI_COMM_WORLD_LOCAL_SIZE", "8")
    spec = detect_cluster()
    assert spec.source == "openmpi/single-node"
    assert spec.coordinator_address == "127.0.0.1:9010"

    # Philly needs an mpi4py broadcast; without it the error says what to do
    monkeypatch.setenv("OMPI_COMM_WORLD_LOCAL_SIZE", "4")
    monkeypatch.setenv("PHILLY_CONTAINER_IP", "10.5.5.5")
    try:
        # Probe usability, not just importability: a test elsewhere may have
        # stubbed `mpi4py` in sys.modules (with MPI = None) to import the
        # reference's utils — that stub must route us to the no-mpi branch,
        # exactly as cluster._mpi_bcast's `from mpi4py import MPI` would fail.
        from mpi4py import MPI as _MPI  # noqa: N811

        has_mpi = _MPI is not None
    except ImportError:
        has_mpi = False
    if has_mpi:
        monkeypatch.setenv("OMPI_COMM_WORLD_RANK", "0")
        spec = detect_cluster()
        assert spec.coordinator_address.startswith("10.5.5.5:")
    else:
        with pytest.raises(RuntimeError, match="MASTER_ADDR"):
            detect_cluster()


def test_gather_features_grad_restores_local_shard():
    """all_gather(tiled) inside shard_map: grads flow only to local rows —
    the semantics of the reference gather_tensors (utils.py:192-206)."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P

    shard_map = jax.shard_map

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("dp",))
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)

    @partial(
        shard_map, mesh=mesh, in_specs=P("dp"), out_specs=P(),
        check_vma=False,
    )
    def loss(local):
        full = gather_features(local)  # [8, 3] on every shard
        return jax.lax.psum((full**2).sum(), "dp") / 4.0

    g = jax.grad(lambda v: loss(v))(x)
    np.testing.assert_allclose(np.asarray(g), 2.0 * x, rtol=1e-6)


def test_repair_finds_missing(tmp_path):
    from clip_event_tpu.data.repair import find_missing_images

    voa = make_voa_fixture(str(tmp_path))
    missing = find_missing_images([voa["mapping_json"]], [voa["image_dir"]])
    assert missing == []
    # remove one image → it is reported
    victim = os.listdir(voa["image_dir"])[0]
    os.remove(os.path.join(voa["image_dir"], victim))
    missing = find_missing_images([voa["mapping_json"]], [voa["image_dir"]])
    assert len(missing) == 1
    assert missing[0]["path"].endswith(victim)


def test_visualization_renders(tmp_path):
    from clip_event_tpu.tools.visualization import render_ie_pages

    voa = make_voa_fixture(str(tmp_path))
    out_dir = str(tmp_path / "html")
    n = render_ie_pages(
        [voa["entity_cs"]], [voa["event_cs"]], out_dir,
        captions={"VOA_EN_NW_2017_00_0": "A caption."},
        image_urls={"VOA_EN_NW_2017_00_0": ["http://example.com/x.jpg"]},
        page_limit=3,
    )
    assert n == 6
    pages = sorted(os.listdir(out_dir))
    assert pages == ["voa_events_0.html", "voa_events_1.html"]
    content = open(os.path.join(out_dir, "voa_events_0.html")).read()
    assert "Conflict.Attack" in content
    assert "[Argument] Attacker=" in content
    assert content.startswith("<!DOCTYPE html>")


def test_device_prefetch(tmp_path):
    from clip_event_tpu.data.common import DataLoader
    from clip_event_tpu.data.prefetch import device_prefetch
    from clip_event_tpu.data.voa import VOACaptionDataset
    from clip_event_tpu.parallel import make_mesh

    voa = make_voa_fixture(str(tmp_path))
    ds = VOACaptionDataset([voa["mapping_json"]], [voa["image_dir"]], image_size=32)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2, drop_last=False)
    mesh = make_mesh(2)
    batches = list(device_prefetch(loader, mesh, depth=2))
    assert len(batches) == 3
    tensors, meta = batches[0]
    assert tensors["image"].shape == (2, 32, 32, 3)
    assert hasattr(tensors["image"], "sharding")  # on device
    assert len(meta) == 2
