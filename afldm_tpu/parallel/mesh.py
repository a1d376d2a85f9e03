"""Device-mesh construction (SURVEY.md §2.11 TPU-native mapping).

One mesh, logical axes ('data', 'model'): DP today (the reference is
DDP-only, train.py:54), with the 'model' axis reserved so tensor parallelism
can be added without reworking the layer contract. A single code path covers
1 chip -> pod by changing the mesh shape; multi-host runs get a DCN-aware
layout (data split across hosts on DCN, 'model' kept inside a host on ICI).
"""

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None) -> bool:
    """Multi-host bring-up (replaces accelerate's process-group launch,
    ref train.py:54). Reads the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod metadata) when args are None; returns True if a multi-process
    runtime was initialized, False for the single-process case (no-op)."""
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single process (or TPU pod auto-detection unused)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def create_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """data=-1 uses all remaining devices on the data axis. In multi-process
    runs the data axis is laid out hosts-major (DCN outer, ICI inner) so
    'model' collectives and intra-host gradient reductions ride ICI and only
    the data-parallel all-reduce crosses DCN."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0
        data = n // model
    assert data * model <= n
    if (jax.process_count() > 1 and data * model == n
            and data % jax.process_count() == 0):
        from jax.experimental import mesh_utils
        nproc = jax.process_count()
        arr = mesh_utils.create_hybrid_device_mesh(
            (data // nproc, model),  # per-granule (ICI) shape
            (nproc, 1),              # cross-granule (DCN) shape
            devices=devices,
            # granule = host process: correct for multi-host single-slice
            # pods (v5e) and for the CPU multi-process simulation, where
            # devices carry no slice_index
            process_is_granule=True)
        return Mesh(arr, ("data", "model"))
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
