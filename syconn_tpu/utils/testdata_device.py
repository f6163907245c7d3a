"""Device (TPU/XLA) synthetic-world generation.

The host generator (utils/testdata.py) is O(volume) numpy — at benchmark
scales (>= 0.2 GVx) it dominates the pipeline's preparation step. The world
is *analytic* (Voronoi cells of seed points, supervoxels as per-cell Voronoi
of sub-centers, ellipsoid organelles, hashed sprinkle of synapse seeds), so
every dense field can be evaluated per voxel on the accelerator: one jitted
program generates an x-chunk (+halo for the neighborhood ops), and chunks
stream back bit-packed while the next one computes.

Only the sparse/irregular pieces stay on host (ER random walks, golgi disc
stamping, connected-component parity for sym/asym, RAG extraction) — they
are O(objects), not O(volume).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence

import numpy as np

from .jaxcfg import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

__all__ = ["generate_dense_fields_device"]


def _hash01(x, y, z, salt: int):
    """Deterministic per-voxel uniform in [0, 1) from global coordinates —
    chunk-border consistent (unlike per-chunk PRNG streams)."""
    h = (
        x.astype(jnp.uint32) * np.uint32(73856093)
        ^ y.astype(jnp.uint32) * np.uint32(19349663)
        ^ z.astype(jnp.uint32) * np.uint32(83492791)
        ^ np.uint32(salt & 0xFFFFFFFF)
    )
    h = h ^ (h >> 16)
    h = h * np.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * np.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h.astype(jnp.float32) * np.float32(2.0**-32)


def _dilate6(m, iterations: int):
    """6-neighborhood binary dilation (scipy's default cross structure),
    zero-padded borders."""
    for _ in range(iterations):
        out = m
        for ax in range(3):
            lo = jnp.pad(
                jax.lax.slice_in_dim(m, 1, m.shape[ax], axis=ax),
                [(0, 1) if a == ax else (0, 0) for a in range(3)],
            )
            hi = jnp.pad(
                jax.lax.slice_in_dim(m, 0, m.shape[ax] - 1, axis=ax),
                [(1, 0) if a == ax else (0, 0) for a in range(3)],
            )
            out = out | lo | hi
        m = out
    return m


@partial(
    jax.jit,
    static_argnames=("chunk_shape", "halo", "salt", "sj_p", "noise_sd", "noise_mean"),
)
def _gen_chunk(
    offset,           # (3,) int32 — global offset of the HALOED block
    key,              # jax PRNG key for the raw noise (per chunk)
    seeds_nm,         # (K, 3) float32 — cell seeds in aniso-nm units
    svc_nm,           # (M, 3) float32 — sv centers (aniso-nm)
    svc_cell,         # (M,) int32 — owning cell (1-based)
    mi_blobs,         # (Bm, 6) float32: cx, cy, cz (vox), rxy, rz, cell
    vc_blobs,         # (Bv, 6) float32
    aniso,            # (3,) float32 — scale / scale[0]
    chunk_shape,      # static: haloed block shape
    halo: int,
    salt: int,
    sj_p: float,
    noise_sd: float,
    noise_mean: float,
):
    cx, cy, cz = chunk_shape
    gx = offset[0] + jnp.arange(cx, dtype=jnp.int32)
    gy = offset[1] + jnp.arange(cy, dtype=jnp.int32)
    gz = offset[2] + jnp.arange(cz, dtype=jnp.int32)
    X = gx[:, None, None].astype(jnp.float32) * aniso[0]
    Y = gy[None, :, None].astype(jnp.float32) * aniso[1]
    Z = gz[None, None, :].astype(jnp.float32) * aniso[2]

    # cells: nearest seed (anisotropy-aware), 1-based. The (vox, K)
    # distance tensor is materialized on purpose: K is small and XLA's
    # fused argmin over a lane-tiled minor axis beats a sequential
    # fori_loop running-min by a wide margin on TPU.
    d2 = (
        (X[..., None] - seeds_nm[None, None, None, :, 0]) ** 2
        + (Y[..., None] - seeds_nm[None, None, None, :, 1]) ** 2
        + (Z[..., None] - seeds_nm[None, None, None, :, 2]) ** 2
    )
    cells = jnp.argmin(d2, axis=-1).astype(jnp.int32) + 1

    # extracellular carve: 6-neighbor label change -> 0 (interior of the
    # haloed block; the halo is cropped so border effects never surface)
    bdry = jnp.zeros(cells.shape, bool)
    for ax in range(3):
        a = jax.lax.slice_in_dim(cells, 1, cells.shape[ax], axis=ax)
        b = jax.lax.slice_in_dim(cells, 0, cells.shape[ax] - 1, axis=ax)
        d = a != b
        bdry = (
            bdry
            | jnp.pad(d, [(1, 0) if k == ax else (0, 0) for k in range(3)])
            | jnp.pad(d, [(0, 1) if k == ax else (0, 0) for k in range(3)])
        )
    cells = jnp.where(bdry, 0, cells)

    # supervoxels: nearest sv center OF THE VOXEL'S CELL
    dsv = (
        (X[..., None] - svc_nm[None, None, None, :, 0]) ** 2
        + (Y[..., None] - svc_nm[None, None, None, :, 1]) ** 2
        + (Z[..., None] - svc_nm[None, None, None, :, 2]) ** 2
    )
    big = jnp.float32(1e30)
    dsv = jnp.where(
        svc_cell[None, None, None, :] == cells[..., None], dsv, big
    )
    seg = jnp.where(cells > 0, jnp.argmin(dsv, axis=-1) + 1, 0).astype(jnp.int32)

    # organelle ellipsoids clipped to their cell
    def blob_mask(blobs):
        bx = gx[:, None, None, None].astype(jnp.float32)
        by = gy[None, :, None, None].astype(jnp.float32)
        bz = gz[None, None, :, None].astype(jnp.float32)
        t = (
            ((bx - blobs[None, None, None, :, 0]) / blobs[None, None, None, :, 3]) ** 2
            + ((by - blobs[None, None, None, :, 1]) / blobs[None, None, None, :, 3]) ** 2
            + ((bz - blobs[None, None, None, :, 2]) / blobs[None, None, None, :, 4]) ** 2
        )
        hit = (t <= 1.0) & (
            blobs[None, None, None, :, 5].astype(jnp.int32) == cells[..., None]
        )
        return jnp.any(hit, axis=-1)

    mi = blob_mask(mi_blobs)
    vc = blob_mask(vc_blobs)

    # synapse junctions: hashed sprinkle on the 2-dilated membrane interface
    interface = _dilate6(cells == 0, 2)
    sj_seed = (_hash01(
        gx[:, None, None] * jnp.ones((1, cy, cz), jnp.int32),
        gy[None, :, None] * jnp.ones((cx, 1, cz), jnp.int32),
        gz[None, None, :] * jnp.ones((cx, cy, 1), jnp.int32),
        salt,
    ) < sj_p) & interface
    sj = _dilate6(sj_seed, 3) & interface

    # raw EM image
    noise = jax.random.normal(key, (cx, cy, cz), jnp.float32) * noise_sd + noise_mean
    raw = noise - 70.0 * (cells == 0) - 50.0 * mi + 50.0 * vc - 35.0 * sj
    raw_u8 = jnp.clip(jnp.round(raw), 0, 255).astype(jnp.uint8)

    core = (slice(halo, cx - halo), slice(halo, cy - halo), slice(halo, cz - halo))
    packed = (
        mi[core].astype(jnp.uint8)
        | (vc[core].astype(jnp.uint8) << 1)
        | (sj[core].astype(jnp.uint8) << 2)
    )
    seg_core = seg[core]
    # narrow the transfer when the label space fits a byte
    seg_out = seg_core.astype(jnp.uint8 if svc_nm.shape[0] < 255 else jnp.uint16)
    return seg_out, packed, raw_u8[core]


def generate_dense_fields_device(
    shape: Sequence[int],
    seeds: np.ndarray,
    svc: np.ndarray,
    svc_cell: np.ndarray,
    mi_blobs: np.ndarray,
    vc_blobs: np.ndarray,
    scale: np.ndarray,
    seed: int,
    chunk_x: int = 64,
    halo: int = 8,
    sj_p: float = 0.004,
) -> Dict[str, np.ndarray]:
    """Stream the dense analytic fields off the device chunk by chunk.

    Returns seg (uint16, sv labels 1..M), mi/vc/sj (bool), raw (uint8).
    """
    shape = tuple(int(s) for s in shape)
    aniso = (np.asarray(scale, np.float64) / scale[0]).astype(np.float32)
    seeds_nm = (np.asarray(seeds, np.float32) * aniso[None]).astype(np.float32)
    svc_nm = (np.asarray(svc, np.float32) * aniso[None]).astype(np.float32)
    svc_cell = np.asarray(svc_cell, np.int32)
    mi_blobs = np.asarray(mi_blobs, np.float32).reshape(-1, 6)
    vc_blobs = np.asarray(vc_blobs, np.float32).reshape(-1, 6)
    if len(mi_blobs) == 0:
        mi_blobs = np.full((1, 6), -1e9, np.float32)
    if len(vc_blobs) == 0:
        vc_blobs = np.full((1, 6), -1e9, np.float32)

    seg = np.zeros(shape, np.uint16)
    masks = np.zeros(shape, np.uint8)
    raw = np.zeros(shape, np.uint8)

    n_chunks = -(-shape[0] // chunk_x)
    base_key = jax.random.PRNGKey(seed)
    inflight = []

    def drain(entry):
        x0, x1, futs = entry
        seg_c, packed_c, raw_c = (np.asarray(f) for f in futs)
        seg[x0:x1] = seg_c[: x1 - x0].astype(np.uint16)
        masks[x0:x1] = packed_c[: x1 - x0]
        raw[x0:x1] = raw_c[: x1 - x0]

    import logging
    import time as _time

    _log = logging.getLogger("syconn_tpu.testdata")
    t0 = _time.perf_counter()
    cshape = (chunk_x + 2 * halo, shape[1] + 2 * halo, shape[2] + 2 * halo)
    dev_chunks = []  # device-side (seg, packed, raw) per chunk
    for ci in range(n_chunks):
        x0 = ci * chunk_x
        x1 = min(shape[0], x0 + chunk_x)
        off = np.array([x0 - halo, -halo, -halo], np.int32)
        futs = _gen_chunk(
            jnp.asarray(off),
            jax.random.fold_in(base_key, ci),
            jnp.asarray(seeds_nm), jnp.asarray(svc_nm), jnp.asarray(svc_cell),
            jnp.asarray(mi_blobs), jnp.asarray(vc_blobs), jnp.asarray(aniso),
            cshape, halo, int(seed) & 0x7FFFFFFF, float(sj_p), 15.0, 128.0,
        )
        inflight.append((x0, x1, futs))
        dev_chunks.append((x1 - x0, futs))
        if len(inflight) > 2:  # overlap compute with d2h of older chunks
            drain(inflight.pop(0))
        if ci % 4 == 3:
            _log.info(
                "device world generation: %d/%d x-chunks (%.1f MVx/s)",
                ci + 1, n_chunks,
                (x1 * shape[1] * shape[2]) / max(_time.perf_counter() - t0, 1e-9) / 1e6,
            )
    while inflight:
        drain(inflight.pop(0))
    # keep the generated fields on device too (freshly resident — the
    # pipeline steps consume them from HBM without a re-upload); concat
    # one field at a time to bound the transient working set
    device_fields = {}
    try:
        for name, ix, cast in (("seg", 0, jnp.int32), ("masks", 1, None),
                               ("raw", 2, None)):
            parts = [
                (f[ix][:nx] if cast is None else f[ix][:nx].astype(cast))
                for nx, f in dev_chunks
            ]
            device_fields[name] = jnp.concatenate(parts, axis=0)
    except Exception:  # pragma: no cover - OOM on small chips: host copies win
        device_fields = {}
    del dev_chunks
    return {
        "seg": seg,
        "mi": (masks & 1) > 0,
        "vc": (masks & 2) > 0,
        "sj": (masks & 4) > 0,
        "raw": raw,
        "_device": device_fields,
    }
