"""Device mesh + sharding helpers.

The reference's only multi-device path is Lightning DDP (SURVEY.md §2.9);
the TPU-native equivalent is data-parallel ``jit`` over a 1-D ``Mesh`` with
XLA collectives riding ICI.  A second ``spatial`` axis is reserved for
sharding the H*W token axis of the correlation volume at very high
resolutions (ring-corr, see ops/pallas plans in SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh, optionally folding a 'spatial' axis for sharded corr."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    devs = np.asarray(devices)
    if spatial > 1:
        assert len(devs) % spatial == 0
        devs = devs.reshape(len(devs) // spatial, spatial)
        return Mesh(devs, ("data", "spatial"))
    return Mesh(devs, ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input pytrees."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, batch dim sharded over 'data'."""
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
