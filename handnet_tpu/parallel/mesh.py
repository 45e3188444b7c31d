"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's torch.distributed machinery.

The reference's parallel story (SURVEY §2.7): DistributedSampler for per-rank
data (utils/utils.py:53,82,106), NCCL all_reduce for metric meters
(fpn_utils/utils.py:29-110), Lightning DDP commented out (config/a2j.yaml:5).

Here: one ``jax.sharding.Mesh`` with a ``data`` axis (optionally a ``model``
axis for future growth), batch sharded over ``data``, parameters replicated,
gradients/metrics reduced by the XLA collectives pjit inserts — over ICI
within a slice, DCN across slices, no NCCL, no process groups in user code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None,
                axis_names: Sequence[str] = ("data",),
                shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default is a 1-D data-parallel mesh (the reference has no TP/PP — SURVEY
    §2.7); pass ``shape``/``axis_names`` for richer layouts, e.g.
    ``create_mesh(8, ("data", "model"), (4, 2))``.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,)
    assert int(np.prod(shape)) == n_devices, (shape, n_devices)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch on the mesh, sharded along dim 0."""
    sharding = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
