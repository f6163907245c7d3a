"""Device (XLA/TPU) contact-site detection.

Device counterpart of the native stencil kernel in
:mod:`syconn_tpu.ops.contacts` (reference semantics:
syconn/extraction/block_processing_C.pyx:21-76): for every boundary voxel,
the most frequent foreign label inside the ``cs_filtersize`` window wins
(ties -> smallest label).

A per-voxel hash count is hostile to vector hardware, so the kernel
reformulates the window mode as dense per-candidate counting:

1. the chunk is cut into tiles (+stencil halo); each tile's candidate set
   (unique labels, <= K) is built from one small sort;
2. per candidate, window occupancy counts come from a *separable* box sum
   (three cumulative-sum passes) over the candidate's indicator mask — all
   regular VPU work, no gather/scatter in the hot loop;
3. the masked argmax over the (ascending) candidate axis selects the most
   frequent foreign label with the required smallest-id tie-break.

Tiles whose label diversity exceeds K report an overflow flag and are
recomputed by the host kernel (rare: EM tissue has few labels per
(32+13)^2 x (16+7) window).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jaxcfg import setup_jax

setup_jax()

__all__ = ["detect_cs_device", "detect_cs_tpu"]


def _box_sum(x: jnp.ndarray, sizes: Sequence[int]) -> jnp.ndarray:
    """Separable box sum: out[i] = sum over window [i, i+s) along each of
    the first 3 axes. Input (X, Y, Z, K); output (X-sx+1, Y-sy+1, Z-sz+1, K)."""
    for ax, s in enumerate(sizes):
        c = jnp.cumsum(x, axis=ax)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=ax))
        c = jnp.concatenate([zero, c], axis=ax)
        n = x.shape[ax]
        hi = jax.lax.slice_in_dim(c, s, n + 1, axis=ax)
        lo = jax.lax.slice_in_dim(c, 0, n + 1 - s, axis=ax)
        x = hi - lo
    return x


def _tile_kernel(win: jnp.ndarray, bdry: jnp.ndarray, stencil, core, K: int):
    """One tile: win (cx+2hx, cy+2hy, cz+2hz) int32 labels,
    bdry core-shaped boundary mask. Returns (partners (core, 2) int32,
    overflow flag)."""
    hx, hy, hz = stencil[0] // 2, stencil[1] // 2, stencil[2] // 2
    flat = win.reshape(-1)
    s = jnp.sort(flat)
    firsts = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    firsts = firsts & (s != 0)
    slot = jnp.cumsum(firsts) - 1
    n_cand = jnp.sum(firsts)
    overflow = n_cand > K
    slot = jnp.minimum(slot, K - 1)
    cands = (
        jnp.full(K, jnp.iinfo(jnp.int32).max, jnp.int32)
        .at[jnp.where(firsts, slot, K - 1)]
        .min(jnp.where(firsts, s, jnp.iinfo(jnp.int32).max), mode="drop")
    )  # ascending unique labels (padded with INT_MAX)
    onehot = (win[..., None] == cands[None, None, None, :]).astype(jnp.int32)
    counts = _box_sum(onehot, stencil)  # (core..., K)
    center = win[hx : win.shape[0] - hx, hy : win.shape[1] - hy, hz : win.shape[2] - hz]
    foreign = (cands[None, None, None, :] != center[..., None]) & (
        cands != jnp.iinfo(jnp.int32).max
    )[None, None, None, :]
    counts = jnp.where(foreign, counts, 0)
    best_ix = jnp.argmax(counts, axis=-1)  # first max -> smallest label wins ties
    best_cnt = jnp.take_along_axis(counts, best_ix[..., None], axis=-1)[..., 0]
    best_id = cands[best_ix]
    hit = bdry & (best_cnt > 0)
    lo = jnp.where(hit, jnp.minimum(center, best_id), 0)
    hi = jnp.where(hit, jnp.maximum(center, best_id), 0)
    return jnp.stack([lo, hi], axis=-1), overflow


@partial(jax.jit, static_argnames=("stencil", "tile", "K"))
def detect_cs_device(
    seg: jnp.ndarray,
    stencil: Tuple[int, int, int] = (13, 13, 7),
    tile: Tuple[int, int, int] = (32, 32, 16),
    K: int = 32,
):
    """Contact partners of an int32 label chunk.

    ``seg`` must include the stencil halo; the output has valid-convolution
    shape ``seg.shape - stencil + 1`` with channels (low id, high id).
    Also returns the per-tile overflow flags (host fallback selector).
    """
    h = (stencil[0] // 2, stencil[1] // 2, stencil[2] // 2)
    out_shape = tuple(seg.shape[i] - 2 * h[i] for i in range(3))
    # boundary of the full (haloed) chunk, cropped to the core
    bdry = jnp.zeros(seg.shape, bool)
    for ax in range(3):
        a = jax.lax.slice_in_dim(seg, 1, seg.shape[ax], axis=ax)
        b = jax.lax.slice_in_dim(seg, 0, seg.shape[ax] - 1, axis=ax)
        d = a != b
        pad_lo = [(0, 0)] * 3
        pad_hi = [(0, 0)] * 3
        pad_lo[ax] = (1, 0)
        pad_hi[ax] = (0, 1)
        bdry = bdry | jnp.pad(d, pad_lo) | jnp.pad(d, pad_hi)
    bdry = bdry & (seg != 0)
    bdry_core = bdry[h[0] : h[0] + out_shape[0], h[1] : h[1] + out_shape[1], h[2] : h[2] + out_shape[2]]

    # pad the core to a tile multiple (window data exists thanks to the halo
    # only at the low side; pad high side with zeros)
    grid = tuple(-(-out_shape[i] // tile[i]) for i in range(3))
    pad = [(0, grid[i] * tile[i] - out_shape[i]) for i in range(3)]
    seg_p = jnp.pad(seg, pad)
    bdry_p = jnp.pad(bdry_core, pad)

    # tile offsets as data (lax.map traces the body ONCE — a Python loop
    # over hundreds of tiles would unroll into an uncompilable HLO)
    offs = np.array(
        [
            (gx * tile[0], gy * tile[1], gz * tile[2])
            for gx in range(grid[0])
            for gy in range(grid[1])
            for gz in range(grid[2])
        ],
        np.int32,
    )
    win_shape = (tile[0] + 2 * h[0], tile[1] + 2 * h[1], tile[2] + 2 * h[2])

    def body(o):
        win = jax.lax.dynamic_slice(seg_p, (o[0], o[1], o[2]), win_shape)
        bd = jax.lax.dynamic_slice(bdry_p, (o[0], o[1], o[2]), tile)
        return _tile_kernel(win, bd, stencil, tile, K)

    partners, overflow = jax.lax.map(body, jnp.asarray(offs), batch_size=16)
    # reassemble: core tiles don't overlap -> pure reshape/transpose
    out = partners.reshape(grid + tuple(tile) + (2,))
    out = out.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
        grid[0] * tile[0], grid[1] * tile[1], grid[2] * tile[2], 2
    )
    return out[: out_shape[0], : out_shape[1], : out_shape[2]], overflow.reshape(grid)


class CsDispatcher:
    """Async dispatch/fetch wrapper around the device contact kernels so a
    driver can overlap device execution with host post-processing (the
    synapse extractor's closing/dilation/type counting).

    ``kernel``: ``"pallas"`` (hand-written Mosaic kernel, ~3x the XLA
    formulation on TPU), ``"xla"``, or ``"auto"`` (pallas on real
    accelerators, xla elsewhere — pallas on CPU would run interpreted)."""

    def __init__(self, stencil=(13, 13, 7), tile=(32, 32, 16), K: int = 32,
                 kernel: str = "auto"):
        self.stencil = tuple(int(s) for s in stencil)
        self.tile = tuple(int(t) for t in tile)
        self.K = int(K)
        if kernel == "auto":
            kernel = "xla" if jax.default_backend() == "cpu" else "pallas"
        assert kernel in ("pallas", "xla"), f"unknown cs kernel: {kernel!r}"
        self.kernel = kernel

    def dispatch(self, seg: np.ndarray):
        seg = np.ascontiguousarray(seg)
        assert seg.max(initial=0) < 2**31
        if self.kernel == "pallas":
            from .contacts_pallas import _detect_cs_pallas, _pallas_prep

            tile_xy = self.tile[:2]
            seg_p, offs, cands, overflow, out_shape = _pallas_prep(
                seg, self.stencil, tile_xy, self.K
            )
            dev = _detect_cs_pallas(
                jnp.asarray(seg_p), jnp.asarray(offs), jnp.asarray(cands),
                self.stencil, tile_xy, self.K,
                jax.default_backend() == "cpu",
            )
            return ("pallas", dev, seg, (overflow, offs, out_shape))
        dev = detect_cs_device(
            jnp.asarray(seg.astype(np.int32)), self.stencil, self.tile, self.K
        )
        return ("xla", dev, seg, None)

    def fetch(self, handle) -> np.ndarray:
        kind, dev, seg, extra = handle
        if kind == "pallas":
            from .contacts_pallas import _pallas_finish

            overflow, offs, out_shape = extra
            lo_t, hi_t = jax.device_get(dev)
            return _pallas_finish(
                seg, lo_t, hi_t, overflow, offs, self.stencil,
                self.tile[:2], out_shape,
            )
        partners_d, overflow_d = dev
        partners = np.asarray(partners_d)
        overflow = np.asarray(overflow_d)
        lo = partners[..., 0].astype(np.uint64)
        hi = partners[..., 1].astype(np.uint64)
        packed = (lo << np.uint64(32)) | hi
        if overflow.any():
            from .contacts import detect_cs

            full = detect_cs(seg.astype(np.uint32), stencil=np.asarray(self.stencil, np.int32))
            for gx, gy, gz in np.argwhere(overflow):
                sl = tuple(
                    slice(g * t, min((g + 1) * t, packed.shape[d]))
                    for d, (g, t) in enumerate(zip((gx, gy, gz), self.tile))
                )
                packed[sl] = full[sl]
        return packed


class ResidentCsDetector:
    """Contact detection over an HBM-resident segmentation: per-chunk
    windows are sliced in device memory (zero upload) and results come back
    *sparse* — contact voxels are a few percent of a chunk, so the readback
    is (flat index, lo, hi) triples compacted on device instead of an
    8 B/voxel dense grid (10-50x less link traffic).

    ``seg_dev``: int32 (X, Y, Z) device array (labels < 2^31).
    One jitted program serves every chunk (the volume is padded to a chunk
    multiple plus the stencil halo).
    """

    def __init__(
        self,
        seg_dev,
        chunk: Sequence[int],
        stencil: Sequence[int] = (13, 13, 7),
        tile: Sequence[int] = (32, 32, 16),
        K: int = 32,
        cap_divisor: int = 8,
    ):
        self.stencil = tuple(int(s) for s in stencil)
        self.tile = tuple(int(t) for t in tile)
        self.K = int(K)
        self.chunk = tuple(int(c) for c in chunk)
        self.sh = tuple(int(s) for s in seg_dev.shape)
        h = tuple(s // 2 for s in self.stencil)
        self._h = h
        grid = tuple(-(-self.sh[i] // self.chunk[i]) for i in range(3))
        self.grid = grid
        pad = [
            (h[i], grid[i] * self.chunk[i] - self.sh[i] + h[i]) for i in range(3)
        ]
        self._padded = jnp.pad(seg_dev.astype(jnp.int32), pad)
        self.cap = max(1024, int(np.prod(self.chunk)) // int(cap_divisor))
        win_shape = tuple(self.chunk[i] + 2 * h[i] for i in range(3))
        stencil_t, tile_t, K_t, cap = self.stencil, self.tile, self.K, self.cap

        @jax.jit
        def run(padded, off):
            win = jax.lax.dynamic_slice(padded, (off[0], off[1], off[2]), win_shape)
            partners, overflow = detect_cs_device(win, stencil_t, tile_t, K_t)
            lo = partners[..., 0].reshape(-1)
            hi = partners[..., 1].reshape(-1)
            nz = lo != 0
            n = jnp.sum(nz)
            idx = jnp.nonzero(nz, size=cap, fill_value=0)[0].astype(jnp.int32)
            return idx, lo[idx], hi[idx], n, partners, overflow

        self._run = run

    def dispatch(self, cix):
        """Launch chunk (cx, cy, cz); returns an async handle."""
        off = jnp.asarray(
            [int(cix[i]) * self.chunk[i] for i in range(3)], jnp.int32
        )
        return (cix, self._run(self._padded, off))

    def fetch(self, handle):
        """Blocking. Returns ``(packed, overflow)``: the chunk-core packed
        uint64 contact segmentation (cropped to the volume boundary) and a
        flag — True when a tile's candidate set overflowed K and the caller
        must recompute this chunk with the host kernel (rare)."""
        cix, (idx, lo, hi, n, partners, overflow) = handle
        n = int(n)
        core = tuple(
            min(self.chunk[i], self.sh[i] - int(cix[i]) * self.chunk[i])
            for i in range(3)
        )
        if n > self.cap:
            # denser than the compaction budget: dense fetch fallback
            p = np.asarray(partners)
            out = (
                (p[..., 0].astype(np.uint64) << np.uint64(32))
                | p[..., 1].astype(np.uint64)
            ).reshape(-1)
        else:
            from ..io.resident import timed_fetch

            out = np.zeros(int(np.prod(self.chunk)), np.uint64)
            if n > 0:
                ih = timed_fetch(idx[:n]).astype(np.int64)
                lv = np.asarray(lo[:n]).astype(np.uint64)
                hv = np.asarray(hi[:n]).astype(np.uint64)
                out[ih] = (lv << np.uint64(32)) | hv
        out = out.reshape(self.chunk)[: core[0], : core[1], : core[2]]
        return out, bool(np.asarray(overflow).any())


def detect_cs_tpu(
    seg: np.ndarray,
    stencil=(13, 13, 7),
    tile=(32, 32, 16),
    K: int = 32,
) -> np.ndarray:
    """Host wrapper: int label chunk (incl. halo) -> packed uint64 contact
    segmentation of valid-conv shape, matching
    :func:`syconn_tpu.ops.contacts.detect_cs`. Overflow tiles fall back to
    the native host kernel."""
    from .contacts import detect_cs

    seg = np.ascontiguousarray(seg)
    assert seg.max(initial=0) < 2**31
    stencil = tuple(int(s) for s in stencil)
    partners, overflow = jax.device_get(
        detect_cs_device(jnp.asarray(seg.astype(np.int32)), stencil, tuple(tile), K)
    )
    lo = partners[..., 0].astype(np.uint64)
    hi = partners[..., 1].astype(np.uint64)
    packed = (lo << np.uint64(32)) | hi
    if overflow.any():
        # recompute overflowing tiles on host (exact hash kernel)
        h = np.array([s // 2 for s in stencil])
        full = detect_cs(seg.astype(np.uint32), stencil=np.asarray(stencil, np.int32))
        for gx, gy, gz in np.argwhere(overflow):
            sl = tuple(
                slice(g * t, min((g + 1) * t, packed.shape[d]))
                for d, (g, t) in enumerate(zip((gx, gy, gz), tile))
            )
            packed[sl] = full[sl]
    return packed
