"""Triangle-mesh voxelization (surface sampling + solidification).

Used to close the real-data loop at voxel level: the reference ships one
REAL cell as meshes (`data/renderexample.k.zip`, consumed by reference
tests/test_render.py:16) but no raw voxel cube — voxelizing those meshes
into a segmentation volume lets the dense/extraction path run on real
morphology and be scored against the archive's own geometry
(tests/test_real_cell_voxel.py).

The reference has no voxelizer (it goes the other way: voxels -> zmesh
marching cubes, proc/meshes.py:937); this is the inverse operation with
the same geometric conventions (vertices in nm, ``scale`` nm/voxel,
volume axes (x, y, z)).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["sample_mesh_surface", "voxelize_mesh"]


def sample_mesh_surface(
    ind: np.ndarray,
    vert_nm: np.ndarray,
    max_spacing_nm: float,
    seed: int = 0,
) -> np.ndarray:
    """Area-weighted random points (nm) on a triangle mesh, dense enough
    that every triangle gets >= area / max_spacing_nm^2 samples (plus its
    3 corners, so thin/small triangles are never missed)."""
    tri = np.asarray(ind, np.int64).reshape(-1, 3)
    v = np.asarray(vert_nm, np.float64).reshape(-1, 3)
    a, b, c = v[tri[:, 0]], v[tri[:, 1]], v[tri[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    n_per = np.maximum(1, np.ceil(areas / max(max_spacing_nm, 1e-6) ** 2)).astype(np.int64)
    rng = np.random.default_rng(seed)
    t_ix = np.repeat(np.arange(len(tri)), n_per)
    r1 = np.sqrt(rng.random(len(t_ix)))
    r2 = rng.random(len(t_ix))
    pts = (
        (1.0 - r1)[:, None] * a[t_ix]
        + (r1 * (1.0 - r2))[:, None] * b[t_ix]
        + (r1 * r2)[:, None] * c[t_ix]
    )
    return np.concatenate([pts, v], axis=0)


def _fill2d(shell: np.ndarray, axis: int) -> np.ndarray:
    from scipy import ndimage

    out = np.zeros_like(shell)
    for i in range(shell.shape[axis]):
        sl = [slice(None)] * 3
        sl[axis] = i
        out[tuple(sl)] = ndimage.binary_fill_holes(shell[tuple(sl)])
    return out


def voxelize_mesh(
    ind: np.ndarray,
    vert_nm: np.ndarray,
    scale: Sequence[float],
    offset_nm: Sequence[float],
    shape: Sequence[int],
    solid: bool = True,
    seed: int = 0,
) -> np.ndarray:
    """Rasterize a mesh into a bool volume of ``shape`` voxels.

    ``scale``: nm per voxel (x, y, z); ``offset_nm``: world position of
    voxel (0, 0, 0). Surface sampling at half the voxel pitch marks the
    shell; ``solid=True`` fills interiors with per-axis 2D hole filling
    (tube cross-sections cut open at the crop boundary close in at least
    one slicing orientation) followed by a 3D cavity fill."""
    scale = np.asarray(scale, np.float64)
    offset_nm = np.asarray(offset_nm, np.float64)
    shape = tuple(int(s) for s in shape)
    # pre-filter triangles to the crop box (+1 voxel margin): sampling the
    # whole mesh to rasterize a small window would be O(total area)
    tri = np.asarray(ind, np.int64).reshape(-1, 3)
    v = np.asarray(vert_nm, np.float64).reshape(-1, 3)
    lo = offset_nm - scale
    hi = offset_nm + (np.asarray(shape) + 1) * scale
    tv = v[tri]  # (T, 3, 3)
    keep_tri = np.all(tv.max(axis=1) >= lo[None], axis=1) & np.all(
        tv.min(axis=1) <= hi[None], axis=1)
    tri = tri[keep_tri]
    if len(tri) == 0:
        return np.zeros(shape, bool)
    used = np.unique(tri.reshape(-1))
    remap = np.zeros(len(v), np.int64)
    remap[used] = np.arange(len(used))
    pts = sample_mesh_surface(remap[tri], v[used],
                              max_spacing_nm=float(scale.min()) / 2.0,
                              seed=seed)
    ijk = np.floor((pts - offset_nm[None]) / scale[None]).astype(np.int64)
    keep = np.all((ijk >= 0) & (ijk < np.asarray(shape)[None]), axis=1)
    ijk = ijk[keep]
    vol = np.zeros(shape, bool)
    vol[ijk[:, 0], ijk[:, 1], ijk[:, 2]] = True
    if not solid or not vol.any():
        return vol
    from scipy import ndimage

    shell = ndimage.binary_closing(vol, structure=np.ones((3, 3, 3), bool))
    filled = shell | _fill2d(shell, 0) | _fill2d(shell, 1) | _fill2d(shell, 2)
    return ndimage.binary_fill_holes(filled)
