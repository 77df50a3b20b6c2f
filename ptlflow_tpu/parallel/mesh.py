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


def init_distributed(num_nodes: int = 1,
                     coordinator_address: Optional[str] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize``.

    The TPU-native analog of Lightning's process-group init inside
    ``strategy.setup_environment`` (reference ptlflow_trainer.py:322-358,
    num_nodes plumbed at :70-73).  On TPU pods the coordinator/process_id
    are discovered from the environment, so a bare call suffices; explicit
    values cover GPU/CPU multi-process runs.  No-op for single-node, and
    tolerates an already-initialized runtime (SLURM auto-restart re-entry).
    """
    if num_nodes <= 1:
        return
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
        kwargs["num_processes"] = num_nodes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized (resume/restart path)
        if "already" not in str(e).lower():
            raise


def make_mesh(n_devices: Optional[int] = None, spatial: int = 1,
              devices: Optional[Sequence] = None,
              num_nodes: int = 1) -> Mesh:
    """1-D data mesh, optionally folding a 'spatial' axis for sharded corr.

    ``num_nodes > 1`` builds a hybrid ('node', 'data') mesh (the reference's
    Trainer(num_nodes=...) knob): the leading axis maps to the slower DCN
    fabric between hosts, the trailing one to ICI within a slice, so data
    parallelism's gradient psum is hierarchical.  On multi-host JAX
    (jax.distributed.initialize) device order already groups by process, so
    the reshape assigns whole hosts to the 'node' axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    devs = np.asarray(devices)
    if num_nodes > 1:
        assert spatial == 1, "combine num_nodes with spatial via shard_map"
        assert len(devs) % num_nodes == 0
        devs = devs.reshape(num_nodes, len(devs) // num_nodes)
        return Mesh(devs, ("node", "data"))
    if spatial > 1:
        assert len(devs) % spatial == 0
        devs = devs.reshape(len(devs) // spatial, spatial)
        return Mesh(devs, ("data", "spatial"))
    return Mesh(devs, ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input pytrees (over 'node' x 'data' when the
    mesh is hybrid)."""
    if "node" in mesh.axis_names:
        return NamedSharding(mesh, P(("node", "data")))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, batch dim sharded over 'data'."""
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def shard_spatial(x, mesh: Mesh, dim: int = 1, axis: str = "spatial"):
    """Constrain one dimension of ``x`` to be sharded over the mesh's
    ``axis`` (GSPMD ``with_sharding_constraint``).

    This is the annotation primitive behind the spatially-sharded
    correlation path (SURVEY.md §5.7): models pin the query/H axis of the
    O((HW)^2) cost volume and let XLA's partitioner propagate the sharding
    (and insert halo exchanges for any convs it reaches).  No-op when the
    dimension is not divisible by the axis size, so models can annotate
    unconditionally.
    """
    if axis not in mesh.axis_names or x.shape[dim] % mesh.shape[axis] != 0:
        return x
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
