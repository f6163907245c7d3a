"""Vectorized naive surface nets: binary mask -> triangle mesh.

Replaces the reference's external ``zmesh`` marching cubes
(reference call site: syconn/proc/meshes.py:937-992 ``find_meshes``) with a
dual-contouring-family mesher chosen for array-parallel hardware: every step
(active-cell detection, edge-crossing average, quad emission) is a regular
dense stencil op — no case tables, no per-cell branching — so the same
formulation runs vectorized on host numpy and is liftable to a jitted XLA
kernel.

Output is watertight over the padded mask and vertices carry nm coordinates
(``(voxel_coord + offset) * scale``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["surface_net_mesh", "simplify_mesh", "mesh_area"]


def surface_net_mesh(
    mask: np.ndarray,
    offset: Sequence[float] = (0, 0, 0),
    scale: Sequence[float] = (1, 1, 1),
    downsample: Sequence[int] = (1, 1, 1),
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mesh the boundary of a binary mask.

    Args:
        mask: 3D boolean array.
        offset: voxel offset of ``mask[0,0,0]`` in the global frame.
        scale: voxel size (x, y, z) in nm.
        downsample: stride applied to the mask before meshing
            (reference downsamples per object type, config meshes/downsampling).

    Returns:
        (indices, vertices, normals): flat int32 triangle indices (3*M,),
        flat float32 vertex coords in nm (3*N,), flat float32 normals (3*N,).
    """
    ds = np.asarray(downsample, np.int64)
    m = np.asarray(mask)[:: ds[0], :: ds[1], :: ds[2]].astype(bool)
    scale_eff = np.asarray(scale, np.float32) * ds.astype(np.float32)
    offset_nm = np.asarray(offset, np.float32) * np.asarray(scale, np.float32)
    if not m.any():
        return (
            np.zeros(0, np.int32),
            np.zeros(0, np.float32),
            np.zeros(0, np.float32),
        )
    m = np.pad(m, 1)
    sh = np.array(m.shape)

    # ---------------------------------------------------------- cell grid
    # cell (i,j,k) sits between voxels [i:i+2, j:j+2, k:k+2]
    occ = m.astype(np.int8)
    csum = (
        occ[:-1, :-1, :-1]
        + occ[1:, :-1, :-1]
        + occ[:-1, 1:, :-1]
        + occ[:-1, :-1, 1:]
        + occ[1:, 1:, :-1]
        + occ[1:, :-1, 1:]
        + occ[:-1, 1:, 1:]
        + occ[1:, 1:, 1:]
    )
    active = (csum > 0) & (csum < 8)
    cell_ids = -np.ones(tuple(sh - 1), np.int64)
    act_ix = np.argwhere(active)
    cell_ids[active] = np.arange(len(act_ix))

    # vertex = centroid of sign-change edge midpoints within the cell
    pos_acc = np.zeros((len(act_ix), 3), np.float64)
    cnt_acc = np.zeros(len(act_ix), np.int32)
    axes_e = np.eye(3, dtype=np.int64)
    # 12 edges of a cell: 4 per axis
    corners = np.array(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1], [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]],
        np.int64,
    )
    for a in range(3):
        starts = corners[corners[:, a] == 0]
        for s in starts:
            p0 = act_ix + s
            p1 = p0 + axes_e[a]
            v0 = m[p0[:, 0], p0[:, 1], p0[:, 2]]
            v1 = m[p1[:, 0], p1[:, 1], p1[:, 2]]
            cross = v0 != v1
            mid = (p0 + p1).astype(np.float64) / 2.0
            pos_acc[cross] += mid[cross]
            cnt_acc += cross
    centers = act_ix + 0.5
    with np.errstate(invalid="ignore"):
        verts_vox = np.where(
            cnt_acc[:, None] > 0, pos_acc / np.maximum(cnt_acc, 1)[:, None], centers
        )

    # ------------------------------------------------------------- quads
    tris = []
    for a in range(3):
        b, c = (a + 1) % 3, (a + 2) % 3
        sl0 = [slice(None)] * 3
        sl1 = [slice(None)] * 3
        sl0[a] = slice(None, -1)
        sl1[a] = slice(1, None)
        diff = m[tuple(sl0)] != m[tuple(sl1)]
        # voxel edge between v and v+e_a; owning cells: v - e_b - e_c .. v
        vv = np.argwhere(diff)
        if len(vv) == 0:
            continue
        # orientation: if v is foreground, the normal points +a
        fg0 = m[vv[:, 0], vv[:, 1], vv[:, 2]]
        e_b, e_c = axes_e[b], axes_e[c]
        c00 = vv - e_b - e_c
        c01 = vv - e_b
        c10 = vv - e_c
        c11 = vv
        # clip: cells at the border may be out of cell grid -> but padding
        # guarantees active cells exist for all boundary faces
        def cid(pts):
            return cell_ids[pts[:, 0], pts[:, 1], pts[:, 2]]

        i00, i01, i10, i11 = cid(c00), cid(c01), cid(c10), cid(c11)
        ok = (i00 >= 0) & (i01 >= 0) & (i10 >= 0) & (i11 >= 0)
        i00, i01, i10, i11 = i00[ok], i01[ok], i10[ok], i11[ok]
        fg = fg0[ok]
        # two triangles per quad, winding by orientation
        t1 = np.where(fg[:, None], np.stack([i00, i10, i11], 1), np.stack([i00, i11, i10], 1))
        t2 = np.where(fg[:, None], np.stack([i00, i11, i01], 1), np.stack([i00, i01, i11], 1))
        tris.append(t1)
        tris.append(t2)
    if not tris:
        return (
            np.zeros(0, np.int32),
            np.zeros(0, np.float32),
            np.zeros(0, np.float32),
        )
    ind = np.concatenate(tris).astype(np.int32)

    # voxel coords -> nm: subtract the pad, scale, add offset
    verts_nm = ((verts_vox - 1.0) * scale_eff[None]).astype(np.float32) + offset_nm[None]

    # per-vertex normals: area-weighted average of face normals
    norm = _vertex_normals(ind, verts_nm)
    return ind.reshape(-1), verts_nm.reshape(-1), norm.reshape(-1)


def _vertex_normals(ind: np.ndarray, vert: np.ndarray) -> np.ndarray:
    v = vert.reshape(-1, 3)
    f = ind.reshape(-1, 3)
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    out = np.zeros_like(v)
    for k in range(3):
        np.add.at(out, f[:, k], fn)
    lens = np.linalg.norm(out, axis=1, keepdims=True)
    out = np.divide(out, np.maximum(lens, 1e-12))
    return out.astype(np.float32)


def simplify_mesh(
    ind: np.ndarray, vert: np.ndarray, cell_size_nm: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Vertex-clustering simplification: vertices within a grid cell of
    ``cell_size_nm`` merge to their centroid; degenerate triangles drop
    (role of the reference's zmesh ``simplification_factor``)."""
    v = vert.reshape(-1, 3).astype(np.float64)
    f = ind.reshape(-1, 3).astype(np.int64)
    if len(v) == 0 or cell_size_nm <= 0:
        return ind.reshape(-1).astype(np.int32), vert.reshape(-1).astype(np.float32)
    q = np.floor(v / cell_size_nm).astype(np.int64)
    key = q[:, 0] * np.int64(73856093) ^ q[:, 1] * np.int64(19349663) ^ q[:, 2] * np.int64(83492791)
    uniq, inv = np.unique(key, return_inverse=True)
    # centroid per cluster
    acc = np.zeros((len(uniq), 3), np.float64)
    cnt = np.zeros(len(uniq), np.int64)
    np.add.at(acc, inv, v)
    np.add.at(cnt, inv, 1)
    new_v = (acc / cnt[:, None]).astype(np.float32)
    new_f = inv[f]
    ok = (
        (new_f[:, 0] != new_f[:, 1])
        & (new_f[:, 1] != new_f[:, 2])
        & (new_f[:, 0] != new_f[:, 2])
    )
    new_f = new_f[ok]
    return new_f.astype(np.int32).reshape(-1), new_v.reshape(-1)


def mesh_area(ind: np.ndarray, vert: np.ndarray) -> float:
    """Total triangle area in µm² (reference: proc/meshes.py:1113)."""
    v = vert.reshape(-1, 3).astype(np.float64)
    f = ind.reshape(-1, 3).astype(np.int64)
    if len(f) == 0:
        return 0.0
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    return float(np.linalg.norm(fn, axis=1).sum() / 2.0 / 1e6)
