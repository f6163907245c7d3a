"""Device (XLA/TPU) connected components of binary masks.

SURVEY §7 step 2(e): the chunked extraction path labels each chunk's
filtered mask; the host path is scipy ``ndimage.label``. This device
formulation is the standard accelerator CC: initialize every masked voxel
with its own flat index, then alternate

* **relabel-min** — every voxel takes the minimum label over its 6
  neighbors (one vectorized pass), and
* **pointer jumping** — ``label = label[label]`` gathers chase the label
  chains, halving their depth each round,

inside a ``lax.while_loop`` until fixpoint. Convergence is O(log n) jumps
per relabel round instead of the O(diameter) pure-propagation loop the
round-1 review flagged.

Dispatch note: on relay-attached devices the transfer (1 B/voxel up,
4 B/voxel down) usually exceeds the scipy labeling time, so the extraction
path keeps host CC unless ``tpu.use_device_kernels`` is true or the
measured downlink (utils/linkprobe) is healthy; see
``ops/cc.connected_components``'s dispatcher.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

from ..utils.jaxcfg import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

__all__ = ["connected_components_device", "connected_components_tpu"]


@jax.jit
def connected_components_device(mask: jnp.ndarray) -> jnp.ndarray:
    """Label the 6-connected components of a 3D bool mask.

    Returns an int32 volume where every component carries the flat index
    (+1) of its smallest-index voxel; background is 0. Compact to 1..K on
    host (:func:`connected_components_tpu`).
    """
    sx, sy, sz = mask.shape
    n = sx * sy * sz
    idx = jnp.arange(1, n + 1, dtype=jnp.int32).reshape(mask.shape)
    labels = jnp.where(mask, idx, 0)
    big = jnp.int32(n + 2)

    def neighbor_min(lab):
        m = jnp.where(lab > 0, lab, big)
        best = m
        for ax in range(3):
            lo = jnp.concatenate(
                [jax.lax.slice_in_dim(m, 1, m.shape[ax], axis=ax),
                 jnp.full(
                     [m.shape[i] if i != ax else 1 for i in range(3)], big, m.dtype
                 )],
                axis=ax,
            )
            hi = jnp.concatenate(
                [jnp.full(
                    [m.shape[i] if i != ax else 1 for i in range(3)], big, m.dtype
                 ),
                 jax.lax.slice_in_dim(m, 0, m.shape[ax] - 1, axis=ax)],
                axis=ax,
            )
            best = jnp.minimum(best, jnp.minimum(lo, hi))
        return jnp.where((lab > 0) & (best < big), jnp.minimum(lab, best), lab)

    def jump(lab):
        # label values are flat indices + 1 -> chase the chain
        flat = lab.reshape(-1)
        parent = jnp.where(flat > 0, flat - 1, 0)
        chased = jnp.where(flat > 0, flat[parent], 0)
        return jnp.minimum(flat, jnp.where(chased > 0, chased, flat)).reshape(lab.shape)

    def cond(carry):
        lab, changed = carry
        return changed

    def body(carry):
        lab, _ = carry
        new = neighbor_min(lab)
        for _ in range(3):  # a few jumps per relabel round
            new = jump(new)
        return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True)))
    return labels


def connected_components_tpu(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """Host wrapper with scipy's ``ndimage.label`` contract: compact labels
    1..K in first-occurrence (C scan) order, plus the component count."""
    mask = np.ascontiguousarray(np.asarray(mask, bool))
    if not mask.any():
        return np.zeros(mask.shape, np.uint32), 0
    raw = np.asarray(connected_components_device(jnp.asarray(mask)))
    flat = raw.reshape(-1)
    nz = np.flatnonzero(flat)
    # roots are flat indices (+1) of each component's smallest voxel, which
    # is also its first voxel in C order -> sorting unique roots ascending
    # reproduces scipy's first-occurrence numbering
    roots = np.unique(flat[nz])
    out = np.zeros(flat.shape, np.uint32)
    out[nz] = np.searchsorted(roots, flat[nz]) + 1
    return out.reshape(mask.shape), len(roots)
