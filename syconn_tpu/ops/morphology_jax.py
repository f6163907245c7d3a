"""Device (XLA/TPU) binary morphology for the extraction pipeline.

Device counterpart of :mod:`syconn_tpu.ops.morphology` (scipy host path;
reference semantics: syconn/proc/image.py:485 ``apply_morphological_
operations`` with anisotropic structuring elements). Erosion/dilation are
expressed as structuring-element box counts via a dense 3D convolution of
the {0,1} mask with the (small) structuring element — one MXU/VPU-friendly
op instead of scipy's per-voxel scans:

* dilation: ``conv(mask, struct) > 0``
* erosion:  ``conv(mask, struct) == sum(struct)``
* opening/closing: the two composed.

The full configured chain (plus the Gaussian blur and threshold) fuses into
ONE jitted program per chunk shape, so object extraction runs
load -> device(chain + CC seeds) -> host CC, with the blur/morphology no
longer a host bottleneck at GVx scale.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jaxcfg import setup_jax

setup_jax()

__all__ = ["morphology_chain_device", "segment_chunk_device", "ResidentSegmenter"]


def _conv_count(mask: jnp.ndarray, struct: jnp.ndarray) -> jnp.ndarray:
    """Count of structuring-element hits per voxel ('same' padding)."""
    x = mask.astype(jnp.float32)[None, ..., None]  # NXYZC
    k = struct.astype(jnp.float32)[..., None, None]  # XYZIO
    out = jax.lax.conv_general_dilated(
        x, k,
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
    )
    return out[0, ..., 0]


def _erode(mask, struct, n_hits):
    return _conv_count(mask, struct) >= n_hits - 0.5


def _dilate(mask, struct, n_hits):
    return _conv_count(mask, struct) > 0.5


@partial(jax.jit, static_argnames=("ops", "struct_shape"))
def _chain(mask: jnp.ndarray, struct: jnp.ndarray, ops: Tuple[str, ...], struct_shape):
    n_hits = jnp.sum(struct)
    for op in ops:
        if op == "binary_erosion":
            mask = _erode(mask, struct, n_hits)
        elif op == "binary_dilation":
            mask = _dilate(mask, struct, n_hits)
        elif op == "binary_opening":
            mask = _dilate(_erode(mask, struct, n_hits), struct, n_hits)
        elif op == "binary_closing":
            mask = _erode(_dilate(mask, struct, n_hits), struct, n_hits)
        else:
            raise ValueError(op)
    return mask


def morphology_chain_device(
    mask: np.ndarray, operations: Sequence[str], struct: np.ndarray
) -> np.ndarray:
    """Apply a named chain of binary ops on device; matches
    ops/morphology.apply_morphological_operations (scipy border semantics:
    'same'-padded counts = zero-padded borders, scipy's default)."""
    out = _chain(
        jnp.asarray(np.asarray(mask, bool)),
        jnp.asarray(np.asarray(struct, bool)),
        tuple(operations),
        tuple(np.asarray(struct).shape),
    )
    return np.asarray(jax.device_get(out))


@partial(jax.jit, static_argnames=("pre_ops", "n_trailing_ero", "struct_shape", "sigma"))
def _segment_chunk(prob, thresh, struct, pre_ops, n_trailing_ero, struct_shape, sigma):
    data = prob.astype(jnp.float32)
    # separable Gaussian blur when sigma > 0 (compile-time constant)
    if sigma > 0:
        r = int(np.ceil(3 * sigma))
        xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
        g = jnp.exp(-0.5 * (xs / sigma) ** 2)
        g = g / jnp.sum(g)
        for ax in range(3):
            shape = [1, 1, 1]
            shape[ax] = 2 * r + 1
            k = g.reshape(shape)[..., None, None]
            data = jax.lax.conv_general_dilated(
                data[None, ..., None], k, (1, 1, 1), "SAME",
                dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
            )[0, ..., 0]
    mask = data >= thresh
    mask = _chain(mask, struct, pre_ops, struct_shape)
    eroded = mask
    if n_trailing_ero > 0:
        n_hits = jnp.sum(struct)
        for _ in range(n_trailing_ero):
            eroded = _erode(eroded, struct, n_hits)
    return mask, eroded


@partial(jax.jit, static_argnames=("pre_ops", "n_trailing_ero", "struct_shape", "sigma"))
def _segment_chunk_packed(prob, thresh, struct, pre_ops, n_trailing_ero, struct_shape, sigma):
    """Like _segment_chunk but returns (mask | eroded << 1) packed 4
    voxels/byte along z — 8x fewer device->host bytes than two bool
    arrays, which dominates on transfer-bound (relay) attachments."""
    mask, eroded = _segment_chunk(
        prob, thresh, struct, pre_ops, n_trailing_ero, struct_shape, sigma
    )
    two = mask.astype(jnp.uint8) | (eroded.astype(jnp.uint8) << 1)
    sx, sy, sz = two.shape
    pad = (-sz) % 4
    if pad:
        two = jnp.pad(two, ((0, 0), (0, 0), (0, pad)))
    two = two.reshape(sx, sy, (sz + pad) // 4, 4)
    w = jnp.asarray([1, 4, 16, 64], jnp.uint8)
    return jnp.sum(two * w, axis=-1, dtype=jnp.uint8)


def _split_ops(morph_ops: Sequence[str]) -> Tuple[Tuple[str, ...], int]:
    morph_ops = list(morph_ops or [])
    n_tr = 0
    for op in reversed(morph_ops):
        if op == "binary_erosion":
            n_tr += 1
        else:
            break
    return tuple(morph_ops[: len(morph_ops) - n_tr]), n_tr


@partial(
    jax.jit,
    static_argnames=("win", "pre_ops", "n_tr", "struct_shape", "sigma"),
)
def _resident_segment_run(padded, struct_b, off, thresh, win, pre_ops, n_tr,
                          struct_shape, sigma):
    w = jax.lax.dynamic_slice(padded, (off[0], off[1], off[2]), win)
    return _segment_chunk_packed(w, thresh, struct_b, pre_ops, n_tr,
                                 struct_shape, sigma)


class ResidentSegmenter:
    """Object-segmentation chunk chains over an HBM-resident probability
    map: each chunk+halo window is sliced in device memory (zero upload)
    and only the 2-bit packed (mask | eroded<<1) result crosses the link.
    Results are bit-identical to the host path's per-chunk windows (the
    region past the volume boundary is zero either way)."""

    def __init__(self, prob_dev, chunk, halo: int, thresh_uint8: float,
                 morph_ops, struct, sigma: float = 0.0):
        self.chunk = tuple(int(c) for c in chunk)
        self.halo = int(halo)
        self.sh = tuple(int(s) for s in prob_dev.shape)
        self.pre_ops, self.n_tr = _split_ops(morph_ops)
        grid = tuple(-(-self.sh[i] // self.chunk[i]) for i in range(3))
        h = self.halo
        pad = [(h, grid[i] * self.chunk[i] - self.sh[i] + h) for i in range(3)]
        self._padded = jnp.pad(prob_dev.astype(jnp.uint8), pad)
        self._struct = jnp.asarray(np.asarray(struct, bool))
        self._win = tuple(self.chunk[i] + 2 * h for i in range(3))
        # threshold travels as a traced scalar: one compiled program serves
        # every organelle type (their probathresholds differ; baking the
        # float into the HLO forced a fresh relay compile per type)
        self._thresh = jnp.float32(thresh_uint8)
        self._struct_shape = tuple(np.asarray(struct).shape)
        self._sigma = float(sigma)

    def dispatch(self, cix):
        off = jnp.asarray([int(cix[i]) * self.chunk[i] for i in range(3)], jnp.int32)
        return (
            cix,
            _resident_segment_run(
                self._padded, self._struct, off, self._thresh, self._win,
                self.pre_ops, self.n_tr, self._struct_shape, self._sigma,
            ),
        )

    def fetch(self, handle):
        """-> (mask, eroded, n_trailing_ero) for the chunk's haloed window
        (cropped to size + 2*halo at the volume boundary)."""
        cix, dev = handle
        from ..io.resident import timed_fetch

        packed = timed_fetch(dev)
        h = self.halo
        wz = self.chunk[2] + 2 * h
        codes = np.stack(
            [packed & 3, (packed >> 2) & 3, (packed >> 4) & 3, (packed >> 6) & 3],
            axis=-1,
        ).reshape(packed.shape[0], packed.shape[1], -1)[:, :, :wz]
        size = [
            min(self.chunk[i], self.sh[i] - int(cix[i]) * self.chunk[i])
            for i in range(3)
        ]
        codes = codes[: size[0] + 2 * h, : size[1] + 2 * h, : size[2] + 2 * h]
        return (codes & 1).astype(bool), (codes >> 1).astype(bool), self.n_tr


def segment_chunk_device(
    prob: np.ndarray,
    thresh_uint8: float,
    morph_ops: Sequence[str],
    struct: np.ndarray,
    sigma: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Device half of the object-segmentation chunk worker: blur + threshold
    + morphology chain; returns (mask, eroded_seed_mask, n_trailing_ero).
    Connected components / watershed stay on host (ops/cc.py). The
    device->host transfer is 2-bit packed (see _segment_chunk_packed)."""
    morph_ops = list(morph_ops or [])
    n_tr = 0
    for op in reversed(morph_ops):
        if op == "binary_erosion":
            n_tr += 1
        else:
            break
    pre_ops = tuple(morph_ops[: len(morph_ops) - n_tr])
    sz = prob.shape[2]
    packed = np.asarray(
        _segment_chunk_packed(
            jnp.asarray(prob),
            float(thresh_uint8),
            jnp.asarray(np.asarray(struct, bool)),
            pre_ops,
            n_tr,
            tuple(np.asarray(struct).shape),
            float(sigma),
        )
    )
    # host unpack: byte -> 4 two-bit codes along z
    codes = np.stack(
        [packed & 3, (packed >> 2) & 3, (packed >> 4) & 3, (packed >> 6) & 3],
        axis=-1,
    ).reshape(packed.shape[0], packed.shape[1], -1)[:, :, :sz]
    return (codes & 1).astype(bool), (codes >> 1).astype(bool), n_tr
