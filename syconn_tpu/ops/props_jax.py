"""Device (XLA/TPU) per-object property extraction.

The device counterpart of :mod:`syconn_tpu.ops.props` (itself a rebuild of
the reference's Cython scan, find_object_properties_C.pyx:24): the chunk is
flattened, stably sorted by label, and per-label statistics are computed
with *sorted* segment reductions — XLA lowers these to segmented scans
instead of random-access hash updates, which is the only formulation that
maps well onto a vector unit.

Outputs are fixed-size (``max_ids``-padded) tables, so one compiled kernel
serves every chunk of a volume; entry ``i`` is valid iff ``ids[i] != 0``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jaxcfg import setup_jax

setup_jax()

__all__ = [
    "object_properties_device",
    "object_properties_tpu",
    "pair_counts_device",
    "pair_counts_tpu",
    "ResidentPropsScanner",
]


@partial(jax.jit, static_argnames=("chunk", "max_ids"))
def _resident_props_run(padded, off, chunk, max_ids):
    w = jax.lax.dynamic_slice(padded, (off[0], off[1], off[2]), chunk)
    return object_properties_device(w, max_ids)


class ResidentPropsScanner:
    """Per-chunk property scans over an HBM-resident label volume: the
    chunk is sliced in device memory (zero upload; the host argsort of a
    dense 16M-voxel cell chunk was the SD-generation bottleneck) and only
    the compact padded tables come back. Same contract as
    ops/props.object_properties_arrays (chunk-local coords)."""

    def __init__(self, vol_dev, chunk: Sequence[int] = (256, 256, 128)):
        self.chunk = tuple(int(c) for c in chunk)
        self.sh = tuple(int(s) for s in vol_dev.shape)
        grid = tuple(-(-self.sh[i] // self.chunk[i]) for i in range(3))
        pad = [(0, grid[i] * self.chunk[i] - self.sh[i]) for i in range(3)]
        self._padded = jnp.pad(vol_dev.astype(jnp.int32), pad)

    def props(self, cix, max_ids: int = 4096):
        """(ids, rep, bb, sizes) of chunk (cx, cy, cz). Boundary chunks run
        on their zero-padded full window — padding voxels only feed the
        dropped background segment, so the nonzero labels' stats (and their
        chunk-local coords) are identical to the host path's cropped scan.
        Grows the padded table on overflow (one recompile per size)."""
        off = jnp.asarray(
            [int(cix[i]) * self.chunk[i] for i in range(3)], jnp.int32
        )
        while True:
            ids, rep, bb, sizes, n_seg = _resident_props_run(
                self._padded, off, self.chunk, max_ids
            )
            if int(n_seg) <= max_ids:
                break
            max_ids = 1 << int(np.ceil(np.log2(int(n_seg))))
        ids = np.asarray(ids)
        valid = ids != 0
        order = np.argsort(ids[valid], kind="stable")
        return (
            ids[valid][order].astype(np.uint64),
            np.asarray(rep)[valid][order].astype(np.int64),
            np.asarray(bb)[valid][order].astype(np.int64),
            np.asarray(sizes)[valid][order].astype(np.int64),
        )


@partial(jax.jit, static_argnames=("max_ids",))
def object_properties_device(chunk: jnp.ndarray, max_ids: int):
    """Per-label stats of an int32 label volume.

    Returns (ids (max_ids,), rep (max_ids, 3), bb (max_ids, 2, 3),
    sizes (max_ids,)) — padded with id 0 rows.
    """
    sx, sy, sz = chunk.shape
    flat = chunk.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    order = jnp.argsort(flat, stable=True)
    sids = flat[order]
    # coordinates of the sorted elements
    oz = order % sz
    oy = (order // sz) % sy
    ox = order // (sy * sz)
    coords = jnp.stack([ox, oy, oz], axis=1).astype(jnp.int32)

    first = jnp.concatenate([jnp.ones(1, bool), sids[1:] != sids[:-1]])
    seg_ix = jnp.cumsum(first) - 1  # compact segment index, ascending ids
    seg_ix = jnp.minimum(seg_ix, max_ids - 1)

    ids = jnp.zeros(max_ids, jnp.int32).at[seg_ix].max(sids, mode="drop")
    sizes = jnp.zeros(max_ids, jnp.int32).at[seg_ix].add(1, mode="drop")
    big = jnp.iinfo(jnp.int32).max
    mins = jnp.full((max_ids, 3), big, jnp.int32).at[seg_ix].min(coords, mode="drop")
    maxs = jnp.full((max_ids, 3), -1, jnp.int32).at[seg_ix].max(coords, mode="drop")
    # representative coordinate: first occurrence in C scan order == the
    # element with the smallest flat index inside each segment
    best_flat = jnp.full(max_ids, big, jnp.int32).at[seg_ix].min(order.astype(jnp.int32), mode="drop")
    rz = best_flat % sz
    ry = (best_flat // sz) % sy
    rx = best_flat // (sy * sz)
    rep = jnp.stack([rx, ry, rz], axis=1)

    valid = ids != 0
    sizes = jnp.where(valid, sizes, 0)
    bb = jnp.stack([mins, maxs + 1], axis=1)
    bb = jnp.where(valid[:, None, None], bb, 0)
    rep = jnp.where(valid[:, None], rep, 0)
    n_segments = jnp.sum(first)  # for host-side overflow detection
    return ids, rep, bb, sizes, n_segments


def object_properties_tpu(
    chunk: np.ndarray, max_ids: int = 4096
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host wrapper with the same return contract as
    :func:`syconn_tpu.ops.props.object_properties_arrays` (compact arrays,
    ascending unique nonzero ids). Labels must fit int32 — callers with
    64-bit ids remap through a lookup table first."""
    chunk = np.ascontiguousarray(chunk)
    assert chunk.max(initial=0) < 2**31, "int32 label space required on device"
    ids, rep, bb, sizes, n_seg = jax.device_get(
        object_properties_device(jnp.asarray(chunk.astype(np.int32)), max_ids)
    )
    if int(n_seg) > max_ids:
        raise ValueError(
            f"chunk has {int(n_seg)} unique labels > max_ids={max_ids}; "
            "raise max_ids (tables are padded, the kernel recompiles once per size)"
        )
    valid = ids != 0
    order = np.argsort(ids[valid], kind="stable")
    return (
        ids[valid][order].astype(chunk.dtype),
        rep[valid][order].astype(np.int64),
        bb[valid][order].astype(np.int64),
        sizes[valid][order].astype(np.int64),
    )


@partial(jax.jit, static_argnames=("max_pairs",))
def pair_counts_device(a: jnp.ndarray, b: jnp.ndarray, max_pairs: int):
    """Co-occurrence counts of nonzero (a, b) int32 label pairs on device
    (device analog of ops/props.pair_counts; mapping scan of
    find_object_properties_C.pyx:72).

    Returns (a_ids, b_ids, counts) padded to ``max_pairs``.
    """
    af = a.reshape(-1)
    bf = b.reshape(-1)
    valid = (af != 0) & (bf != 0)
    # pack pair into float-sortable key: a * 2^31 would overflow int32 ->
    # two-stage stable sort instead
    order1 = jnp.argsort(jnp.where(valid, bf, jnp.iinfo(jnp.int32).max), stable=True)
    a1 = af[order1]
    b1 = bf[order1]
    v1 = valid[order1]
    order2 = jnp.argsort(jnp.where(v1, a1, jnp.iinfo(jnp.int32).max), stable=True)
    a2 = a1[order2]
    b2 = b1[order2]
    v2 = v1[order2]
    new = jnp.concatenate(
        [jnp.ones(1, bool), (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])]
    ) & v2
    seg = jnp.cumsum(new) - 1
    n_pairs = jnp.sum(new)  # total unique pairs, for host overflow detection
    seg = jnp.where(v2, jnp.minimum(seg, max_pairs - 1), max_pairs - 1)
    a_out = jnp.zeros(max_pairs, jnp.int32).at[seg].max(jnp.where(v2, a2, 0), mode="drop")
    b_out = jnp.zeros(max_pairs, jnp.int32).at[seg].max(jnp.where(v2, b2, 0), mode="drop")
    cnt = jnp.zeros(max_pairs, jnp.int32).at[seg].add(jnp.where(v2, 1, 0), mode="drop")
    ok = (a_out != 0) & (b_out != 0)
    return (
        jnp.where(ok, a_out, 0),
        jnp.where(ok, b_out, 0),
        jnp.where(ok, cnt, 0),
        n_pairs,
    )


def pair_counts_tpu(
    a: np.ndarray, b: np.ndarray, max_pairs: int = 4096
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host wrapper with overflow detection (same contract as
    :func:`syconn_tpu.ops.props.pair_counts`: compact arrays of nonzero
    (a, b) pairs + counts). Raises when the chunk holds more unique pairs
    than ``max_pairs`` — the padded device tables would otherwise silently
    merge the overflow into the last slot."""
    a = np.ascontiguousarray(a)
    b = np.ascontiguousarray(b)
    assert max(a.max(initial=0), b.max(initial=0)) < 2**31, "int32 label space"
    a_out, b_out, cnt, n_pairs = jax.device_get(
        pair_counts_device(
            jnp.asarray(a.astype(np.int32)), jnp.asarray(b.astype(np.int32)), max_pairs
        )
    )
    if int(n_pairs) > max_pairs:
        raise ValueError(
            f"chunk has {int(n_pairs)} unique (a, b) pairs > max_pairs="
            f"{max_pairs}; raise max_pairs (one recompile per size)"
        )
    ok = (a_out != 0) & (b_out != 0)
    return a_out[ok], b_out[ok], cnt[ok].astype(np.int64)
