"""Device-mesh construction (SURVEY.md §2.11 TPU-native mapping).

One mesh, logical axes ('data', 'model'): DP today (the reference is
DDP-only, train.py:54), with the 'model' axis reserved so tensor parallelism
can be added without reworking the layer contract. A single code path covers
1 chip -> pod by changing the mesh shape.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """data=-1 uses all remaining devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0
        data = n // model
    assert data * model <= n
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
