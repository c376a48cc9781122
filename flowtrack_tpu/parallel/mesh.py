"""Device mesh + sharding helpers (data parallelism over ICI).

Replaces the reference's ``nn.DataParallel(model).cuda()`` (SURVEY.md
section 4.1 device boundary #1): params are replicated across the mesh,
batches are sharded on the leading axis, and XLA inserts the psum for the
gradient reduction — the honest TPU equivalent of DataParallel's
replicate/scatter/gather without any hand-written communication.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, axis: str = DATA_AXIS,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh. num_devices=0 -> all available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: Optional[str] = None) -> NamedSharding:
    """Shard the leading (batch) dim across the mesh.

    ``axis=None`` uses the mesh's own first axis name, so meshes built with
    a non-default ``cfg.mesh.data_axis`` work without repeating the name."""
    return NamedSharding(mesh, P(axis if axis is not None
                                 else mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr, multiple: int, axis: int = 0):
    """Pad ``arr`` so shape[axis] divides ``multiple``; returns (arr, n_valid).

    Sharded batches must divide the mesh size; ragged final batches are
    padded and masked downstream (SURVEY.md section 8 hard part (d))."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return np.pad(arr, pad), n


def shard_batch(mesh: Mesh, batch, axis: Optional[str] = None):
    """Device-put a pytree of host arrays with the batch dim sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
