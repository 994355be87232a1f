"""Device mesh and sharding helpers.

The reference has no distributed machinery at all (SURVEY.md section 2:
single process, one cuda:0). Here parallelism is first-class: a named
`jax.sharding.Mesh` whose ``data`` axis carries data-parallel training
(gradient psum over ICI) and data-sharded batched inference. Multi-host
slices extend the same mesh over DCN; the code only ever names logical axes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, axis_name: str = "data",
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 1-D data-parallel mesh over the given (default: all) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if data == -1:
        data = len(devs)
    if data > len(devs):
        raise ValueError(f"requested {data} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:data]), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """device_put a host batch pytree with its leading dim sharded."""
    s = batch_sharded(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated over the mesh."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def local_batch_size(global_batch: int, mesh: Mesh,
                     axis_name: str = "data") -> int:
    n = mesh.shape[axis_name]
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {axis_name}={n}")
    return global_batch // n
