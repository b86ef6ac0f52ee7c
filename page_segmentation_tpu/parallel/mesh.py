"""Device-mesh construction.

The reference has no distributed runtime (SURVEY §2: single process); the
TPU-native design scales via a ``jax.sharding.Mesh``:

* axis ``data``  — data parallelism across pages (the CNN workload's
  natural axis; grads psum over ICI),
* axis ``space`` — optional spatial partitioning of the page height for
  pages too large for one chip's HBM (the CNN cousin of context
  parallelism; halo exchange handled by shard_map collectives).

On a single host this also drives the virtual-CPU-device test meshes
(``--xla_force_host_platform_device_count``).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"Requested {n} devices, have {len(devices)}")
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    grid = np.array(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(grid, tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch sharding: leading dim split across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch (pytree of arrays with equal leading dim) onto the
    mesh, split along the data axis."""
    sharding = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
