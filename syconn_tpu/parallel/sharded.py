"""Sharded execution of the production pipeline steps over the device mesh.

Round-1 built the mesh/halo machinery (``parallel/device.py``,
``parallel/halo.py``) but the pipeline steps themselves ran single-device.
This module is the glue that runs the *actual* hot steps sharded:

* ``detect_cs_slab_sharded``  — contact-site stencil detection of a slab of
  ``sp`` consecutive x-chunks, volume sharded over the mesh's ``sp`` axis
  with the stencil halo exchanged over ICI (``ppermute``) instead of
  re-read from disk (reference fan-out:
  syconn/extraction/cs_extraction_steps.py:44).
* ``segment_slab_sharded``    — the object-extraction filtering chain
  (Gaussian blur + threshold + anisotropic morphology) on an x-sharded
  slab (reference: syconn/extraction/object_extraction_steps.py:42).
* ``object_properties_sharded`` / ``pair_counts_sharded`` — the per-object
  property scan and the subcell<->cell mapping counts on an x-sharded
  volume, per-shard segment reductions merged on host (reference scan:
  syconn/extraction/find_object_properties_C.pyx:24,:112).
* data-parallel dense inference lives in ``inference/dense.py`` (the
  ``mesh=`` argument of :class:`DenseTilePredictor`), sharding the tile
  batch over the ``data`` axis (reference: syconn/handler/prediction.py:594
  one-SLURM-job-per-GPU fan-out).

Every function is bit-identical to its serial counterpart: each device sees
exactly the (chunk + halo) window the serial path loads from disk, because
the slab is loaded once with its outer halo and interior halos travel over
the interconnect.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

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

__all__ = [
    "mesh_from_config",
    "slab_runs",
    "sharded_slab_apply",
    "detect_cs_slab_sharded",
    "segment_slab_sharded",
    "object_properties_sharded",
    "pair_counts_sharded",
]


def mesh_from_config(axis_name: str = "sp") -> Optional[Mesh]:
    """Build a 1D mesh over all devices for pipeline-step sharding whenever
    more than one device is attached (reference shape: the unconditional
    fan-out of syconn/mp/batchjob_utils.py:69). Sharding is default-on; a
    user can opt out with ``tpu.shard_pipeline: false``."""
    from .. import global_params

    try:
        enabled = global_params.config["tpu"].get("shard_pipeline", True)
    except Exception:
        enabled = True
    if enabled is False:
        return None
    devs = jax.devices()
    if len(devs) < 2:
        return None
    return Mesh(np.array(devs), (axis_name,))


def slab_runs(
    grid: Sequence[int], n_sp: int, pad: bool = False
) -> Tuple[List[Tuple[int, int, int]], List[Tuple[int, int, int]]]:
    """Partition a chunk grid into x-runs of ``n_sp`` consecutive full
    chunks (sharded slabs).

    Returns (slab_starts, serial_chunks); a slab start (cx, cy, cz) covers
    chunks cx..cx+n_sp-1 in the same (cy, cz) column.

    With ``pad=False`` the remainder x-chunks go to the serial list. With
    ``pad=True`` a final slab per column covers them too — it may extend
    past the grid (chunked loads zero-pad out-of-bounds reads, and callers
    skip outputs of chunks with cx >= grid[0]) so EVERY chunk runs on the
    sharded path and the serial list is empty.
    """
    slabs = []
    serial = []
    n_full = (grid[0] // n_sp) * n_sp
    for cy in range(grid[1]):
        for cz in range(grid[2]):
            for cx in range(0, n_full, n_sp):
                slabs.append((cx, cy, cz))
            if n_full < grid[0]:
                if pad:
                    slabs.append((n_full, cy, cz))
                else:
                    serial.extend((cx, cy, cz) for cx in range(n_full, grid[0]))
    return slabs, serial


def _halo_exchange_with_boundary(local, halo: int, axis_name: str, lo, hi):
    """Pad a local x-shard with neighbor slabs via two ppermute rings; the
    mesh-edge shards take the explicit (disk-loaded) boundary slabs instead,
    so the padded window matches the serial per-chunk disk load exactly."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    send_right = [(i, (i + 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(local[-halo:], axis_name, send_right)
    send_left = [(i, (i - 1) % n) for i in range(n)]
    from_right = jax.lax.ppermute(local[:halo], axis_name, send_left)
    from_left = jnp.where(idx == 0, lo.astype(local.dtype), from_left)
    from_right = jnp.where(idx == n - 1, hi.astype(local.dtype), from_right)
    return jnp.concatenate([from_left, local, from_right], axis=0)


def sharded_slab_apply(
    kernel,
    slab_padded: np.ndarray,
    mesh: Mesh,
    halo_x: int,
    axis_name: str = "sp",
):
    """Run ``kernel(padded_local) -> pytree`` over an x-sharded slab.

    ``slab_padded`` carries ``halo_x`` extra slabs on both x ends (the
    disk-loaded outer halo); its core x extent must divide over the mesh
    axis. Each device receives its core shard plus ``halo_x`` slabs from
    each x neighbor (interior: ppermute over ICI; slab edge: the outer
    halo). Output leaves are concatenated along axis 0 across shards.
    """
    n = mesh.shape[axis_name]
    core = slab_padded[halo_x:-halo_x] if halo_x > 0 else slab_padded
    assert core.shape[0] % n == 0, (
        f"slab core x extent {core.shape[0]} must divide over {n} shards"
    )
    spec = P(axis_name)
    repl = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, repl, repl),
        out_specs=spec,
        check_vma=False,
    )
    def run(local, lo, hi):
        if halo_x > 0:
            padded = _halo_exchange_with_boundary(local, halo_x, axis_name, lo, hi)
        else:
            padded = local
        return kernel(padded)

    if halo_x > 0:
        lo = jnp.asarray(slab_padded[:halo_x])
        hi = jnp.asarray(slab_padded[-halo_x:])
    else:
        # zero-size boundary arrays keep the in_specs uniform
        lo = jnp.zeros((0,) + slab_padded.shape[1:], slab_padded.dtype)
        hi = lo
    x = jax.device_put(jnp.asarray(core), NamedSharding(mesh, spec))
    return jax.jit(run)(x, lo, hi)


# --------------------------------------------------------------------- cs


def detect_cs_slab_sharded(
    seg_slab_padded: np.ndarray,
    mesh: Mesh,
    stencil: Sequence[int] = (13, 13, 7),
    tile: Sequence[int] = (32, 32, 16),
    K: int = 32,
    axis_name: str = "sp",
) -> np.ndarray:
    """Contact partners of a slab of ``sp`` consecutive x-chunks.

    ``seg_slab_padded`` is the slab *including* the stencil halo in all
    three dims (exactly what the serial worker loads per chunk, but for the
    whole slab at once). Output: packed uint64 contact segmentation of the
    valid-convolution shape ``slab - stencil + 1`` — bit-identical to
    running :func:`syconn_tpu.ops.contacts_jax.detect_cs_tpu` per chunk.

    Only the x halo travels over the interconnect; y/z halos are part of
    the slab (full valid-conv semantics within the slab).
    """
    from ..ops.contacts import detect_cs
    from ..ops.contacts_jax import detect_cs_device

    stencil = tuple(int(s) for s in stencil)
    tile = tuple(int(t) for t in tile)
    hx = stencil[0] // 2
    assert seg_slab_padded.max(initial=0) < 2**31

    def kernel(padded):
        return detect_cs_device(padded.astype(jnp.int32), stencil, tile, K)

    partners_d, overflow_d = sharded_slab_apply(
        kernel, seg_slab_padded.astype(np.int32), mesh, hx, axis_name
    )
    partners = np.asarray(partners_d)
    overflow = np.asarray(overflow_d)
    lo = partners[..., 0].astype(np.uint64)
    hi = partners[..., 1].astype(np.uint64)
    packed = (lo << np.uint64(32)) | hi
    if overflow.any():  # rare: recompute overflow tiles with the host kernel
        full = detect_cs(
            seg_slab_padded.astype(np.uint32), stencil=np.asarray(stencil, np.int32)
        )
        # the per-shard tile grids concatenate along x: shard s owns core
        # rows [s*shard_x, (s+1)*shard_x) with its own (possibly padded)
        # local tiling, so map overflow tiles shard-locally
        n = mesh.shape[axis_name]
        shard_x = (seg_slab_padded.shape[0] - 2 * hx) // n
        gx_per_shard = -(-shard_x // tile[0])
        for gx, gy, gz in np.argwhere(overflow):
            s, lgx = divmod(int(gx), gx_per_shard)
            x0 = s * shard_x + lgx * tile[0]
            x1 = min(x0 + tile[0], (s + 1) * shard_x)
            sl = (
                slice(x0, x1),
                slice(gy * tile[1], min((gy + 1) * tile[1], packed.shape[1])),
                slice(gz * tile[2], min((gz + 1) * tile[2], packed.shape[2])),
            )
            packed[sl] = full[sl]
    return packed


# ------------------------------------------------------------ segmentation


def segment_slab_sharded(
    prob_slab_padded: np.ndarray,
    thresh_uint8: float,
    morph_ops: Sequence[str],
    struct: np.ndarray,
    mesh: Mesh,
    halo: int,
    sigma: float = 0.0,
    axis_name: str = "sp",
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Blur + threshold + morphology chain on an x-sharded slab.

    ``prob_slab_padded`` carries ``halo`` voxels on both ends of every dim.
    Returns (masks, eroded, n_trailing_ero) where ``masks``/``eroded`` are
    (n_sp, cx + 2*halo, Y + 2*halo, Z + 2*halo) — each shard's chunk
    *including* its halo, bit-identical to the per-chunk device chain
    (:func:`syconn_tpu.ops.morphology_jax.segment_chunk_device`) on the
    serial path's disk-loaded window. The haloed (not core-cropped) masks
    matter because the serial worker labels connected components on the
    haloed chunk before cropping; per-chunk CC / watershed remain host work
    (ops/cc.py).
    """
    from ..ops.morphology_jax import _segment_chunk

    morph_ops = list(morph_ops or [])
    n_tr = 0
    for op in reversed(morph_ops):
        if op == "binary_erosion":
            n_tr += 1
        else:
            break
    pre_ops = tuple(morph_ops[: len(morph_ops) - n_tr])
    struct_b = jnp.asarray(np.asarray(struct, bool))
    struct_shape = tuple(np.asarray(struct).shape)

    def kernel(padded):
        mask, eroded = _segment_chunk(
            padded, float(thresh_uint8), struct_b, pre_ops, n_tr,
            struct_shape, float(sigma),
        )
        # leading singleton axis -> host sees (n_sp, chunk+halo, ...) stacks
        return mask[None], eroded[None]

    mask_d, eroded_d = sharded_slab_apply(
        kernel, prob_slab_padded, mesh, halo, axis_name
    )
    return np.asarray(mask_d), np.asarray(eroded_d), n_tr


# ------------------------------------------------------------------- props


def object_properties_sharded(
    vol: np.ndarray,
    mesh: Mesh,
    max_ids: int = 4096,
    axis_name: str = "sp",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-object (id, rep_coord, bounding box, size) of an x-sharded label
    volume: per-shard sorted segment reductions on device, cross-shard merge
    on host. Same contract as ops/props.object_properties_arrays (compact
    arrays, ascending unique nonzero ids; rep coord = first voxel in C scan
    order, which the x-ordered shard merge preserves)."""
    from ..ops.props import merge_prop_arrays
    from ..ops.props_jax import object_properties_device

    n = mesh.shape[axis_name]
    assert vol.shape[0] % n == 0
    assert vol.max(initial=0) < 2**31
    shard_x = vol.shape[0] // n
    vol32 = vol.astype(np.int32)

    while True:  # grow the padded table until every shard's labels fit
        cap = max_ids

        def kernel(local):
            ids, rep, bb, sizes, n_seg = object_properties_device(
                local.astype(jnp.int32), cap
            )
            return ids, rep, bb, sizes, n_seg.reshape(1)

        ids, rep, bb, sizes, n_seg = sharded_slab_apply(
            kernel, vol32, mesh, halo_x=0, axis_name=axis_name
        )
        n_seg = np.asarray(n_seg).reshape(n)
        worst = int(n_seg.max(initial=0))
        if worst <= max_ids:
            break
        # one recompile per size; grow directly to the observed need
        max_ids = 1 << int(np.ceil(np.log2(worst)))
    max_ids = cap
    ids = np.asarray(ids).reshape(n, max_ids)
    rep = np.asarray(rep).reshape(n, max_ids, 3)
    bb = np.asarray(bb).reshape(n, max_ids, 2, 3)
    sizes = np.asarray(sizes).reshape(n, max_ids)
    per_shard = []
    for s in range(n):  # host merge in ascending-x order keeps rep = first hit
        valid = ids[s] != 0
        order = np.argsort(ids[s][valid], kind="stable")
        off = np.array([s * shard_x, 0, 0], np.int64)
        per_shard.append(
            (
                ids[s][valid][order].astype(vol.dtype),
                rep[s][valid][order].astype(np.int64) + off,
                bb[s][valid][order].astype(np.int64) + off[None, :],
                sizes[s][valid][order].astype(np.int64),
            )
        )
    return merge_prop_arrays(per_shard)


def pair_counts_sharded(
    a: np.ndarray,
    b: np.ndarray,
    mesh: Mesh,
    max_pairs: int = 4096,
    axis_name: str = "sp",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Nonzero (a, b) co-occurrence counts of x-sharded volumes (the
    subcell->cell mapping scan), per-shard tables merged on host. Same
    contract as ops/props.pair_counts."""
    from ..ops.props_jax import pair_counts_device

    n = mesh.shape[axis_name]
    assert a.shape == b.shape and a.shape[0] % n == 0
    assert max(a.max(initial=0), b.max(initial=0)) < 2**31

    spec = P(axis_name)
    sh = NamedSharding(mesh, spec)
    da = jax.device_put(jnp.asarray(a.astype(np.int32)), sh)
    db = jax.device_put(jnp.asarray(b.astype(np.int32)), sh)

    while True:  # grow the padded pair table until every shard fits
        cap = max_pairs

        @partial(shard_map, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
                 check_vma=False)
        def run(la, lb):
            a_o, b_o, c_o, n_p = pair_counts_device(
                la.astype(jnp.int32), lb.astype(jnp.int32), cap
            )
            return a_o, b_o, c_o, n_p.reshape(1)

        a_out, b_out, cnt, n_pairs = jax.jit(run)(da, db)
        n_pairs = np.asarray(n_pairs).reshape(n)
        worst = int(n_pairs.max(initial=0))
        if worst <= max_pairs:
            break
        max_pairs = 1 << int(np.ceil(np.log2(worst)))
    max_pairs = cap
    a_out = np.asarray(a_out).reshape(-1)
    b_out = np.asarray(b_out).reshape(-1)
    cnt = np.asarray(cnt).reshape(-1)
    # vectorized cross-shard merge: pack (a, b) into one int64 key, then a
    # single unique + bincount pass
    ok = (a_out != 0) & (b_out != 0)
    if not ok.any():
        return np.zeros(0, a.dtype), np.zeros(0, b.dtype), np.zeros(0, np.int64)
    keys = (a_out[ok].astype(np.int64) << 32) | b_out[ok].astype(np.int64)
    uk, inv = np.unique(keys, return_inverse=True)
    counts = np.bincount(inv, weights=cnt[ok].astype(np.float64)).astype(np.int64)
    return (
        (uk >> 32).astype(a.dtype),
        (uk & 0xFFFFFFFF).astype(b.dtype),
        counts,
    )
