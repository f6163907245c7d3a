"""Sharded-volume processing: halo exchange over the device mesh.

The reference's spatial decomposition communicates chunk faces through NFS
files (SURVEY.md §2.2 / §5.7); the multi-chip equivalent shards the volume
over the mesh's ``sp`` axis and exchanges operator halos over ICI with
``ppermute`` inside ``shard_map`` — the true context/sequence-parallel
analog for volumes.

``sharded_volume_apply`` runs any halo-dependent chunk kernel (boundary
detection, morphology, stencils, CNN tiles) on an x-sharded volume; each
device receives its neighbors' border slabs before the kernel executes and
emits only its core.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.jaxcfg import setup_jax

setup_jax()

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["halo_exchange_x", "sharded_volume_apply", "sharded_boundary_mask"]


def halo_exchange_x(local: jnp.ndarray, halo: int, axis_name: str, edge_mode: str = "edge"):
    """Pad a local x-shard with the neighbors' border slabs.
    Communication: two ``ppermute`` rings. At the global volume boundary the
    halo is edge-replicated (default — matches the serial kernels'
    "skip out-of-bounds neighbor" semantics for unit halos) or zeroed."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # receive the LEFT neighbor's last slab: every device sends its last
    # slab to its right neighbor (i -> i+1)
    send_right = [(i, (i + 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(local[-halo:], axis_name, send_right)
    # receive the RIGHT neighbor's first slab (i -> i-1)
    send_left = [(i, (i - 1) % n) for i in range(n)]
    from_right = jax.lax.ppermute(local[:halo], axis_name, send_left)
    if edge_mode == "edge":
        lo_fill = jnp.broadcast_to(local[:1], from_left.shape).astype(local.dtype)
        hi_fill = jnp.broadcast_to(local[-1:], from_right.shape).astype(local.dtype)
    else:
        lo_fill = jnp.zeros_like(from_left)
        hi_fill = jnp.zeros_like(from_right)
    from_left = jnp.where(idx == 0, lo_fill, from_left)
    from_right = jnp.where(idx == n - 1, hi_fill, from_right)
    return jnp.concatenate([from_left, local, from_right], axis=0)


def sharded_volume_apply(
    kernel: Callable[[jnp.ndarray], jnp.ndarray],
    vol: np.ndarray,
    mesh: Mesh,
    halo: int,
    axis_name: str = "sp",
) -> np.ndarray:
    """Apply ``kernel(padded_local) -> core_out`` to a volume sharded along
    x over ``axis_name``. ``kernel`` sees its shard plus ``halo`` slabs from
    each neighbor and must return an array of the unpadded local shape
    (leading axis = local x extent).
    """
    n = mesh.shape[axis_name]
    assert vol.shape[0] % n == 0, (
        f"x extent {vol.shape[0]} must divide over {n} '{axis_name}' shards"
    )

    spec = P(axis_name)
    other_axes = tuple(a for a in mesh.axis_names if a != axis_name)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
        check_vma=False,
    )
    def run(local):
        padded = halo_exchange_x(local, halo, axis_name)
        out = kernel(padded)
        return out

    x = jax.device_put(jnp.asarray(vol), NamedSharding(mesh, spec))
    return np.asarray(jax.jit(run)(x))


def sharded_boundary_mask(vol: np.ndarray, mesh: Mesh, axis_name: str = "sp") -> np.ndarray:
    """6-neighborhood boundary detection on a mesh-sharded volume — the
    sharded counterpart of ops/contacts.detect_seg_boundaries, with the
    cross-shard faces exchanged over ICI instead of re-read from disk."""

    def kernel(padded):
        b = jnp.zeros(padded.shape, bool)
        for ax in range(3):
            a1 = jax.lax.slice_in_dim(padded, 1, padded.shape[ax], axis=ax)
            a0 = jax.lax.slice_in_dim(padded, 0, padded.shape[ax] - 1, axis=ax)
            d = a1 != a0
            pad_lo = [(0, 0)] * 3
            pad_hi = [(0, 0)] * 3
            pad_lo[ax] = (1, 0)
            pad_hi[ax] = (0, 1)
            b = b | jnp.pad(d, pad_lo) | jnp.pad(d, pad_hi)
        b = b & (padded != 0)
        return b[1:-1]  # crop the exchanged halo

    return sharded_volume_apply(kernel, vol, mesh, halo=1, axis_name=axis_name)
