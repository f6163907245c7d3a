"""Device mesh construction and sharding helpers.

The reference's "distributed backend" is SLURM fan-out + shared filesystem
(reference: syconn/mp/batchjob_utils.py; SURVEY.md §2.2/§5.8). The TPU-native
equivalent is a single JAX program over a device mesh: data parallelism over
volume chunks / cells ("data" axis) and spatial partitioning of the volume
("sp" axis), with XLA inserting the ICI collectives (halo exchanges for
spatially-partitioned convolutions, psums for gradients).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["get_device_mesh", "data_sharding", "replicated", "P", "NamedSharding"]


def get_device_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("data", "sp"),
    mesh_shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over the available (or given) devices.

    Defaults: all devices on the "data" axis, 1 on "sp". ``mesh_shape`` may
    contain a single -1 (filled with the remaining devices).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = [n] + [1] * (len(axis_names) - 1)
    mesh_shape = list(mesh_shape)
    if -1 in mesh_shape:
        known = int(np.prod([s for s in mesh_shape if s != -1]))
        mesh_shape[mesh_shape.index(-1)] = n // known
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh_shape {mesh_shape} != {n} devices")
    dev_array = np.array(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
