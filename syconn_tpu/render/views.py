"""Cell multi-view rendering frontend + view<->mesh label transfer.

Reference parity: syconn/proc/rendering.py — ``render_sso_coords`` :204
(depth views, one channel per organelle type),
``render_sso_coords_index_views`` :300, ``render_sso_coords_label_views``
:399, ``render_sampled_sso`` :119; label mapping in
super_segmentation_helper.py:1527-1554 (``semseg2mesh``) and
handler/multiviews.py:339 (``generate_rendering_locs``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import global_params
from ..proc.meshes import calc_rot_matrices
from .raster import BACKGROUND, SplatRenderer

__all__ = [
    "generate_rendering_locs",
    "render_sso_coords",
    "render_sso_coords_index_views",
    "render_sso_coords_label_views",
    "render_sampled_sso",
    "semseg2mesh_via_views",
    "write_sv_views_chunked",
]

VIEW_CHANNELS = ["sv", "mi", "vc", "sj"]


def generate_rendering_locs(verts_nm: np.ndarray, ds_factor_nm: float) -> np.ndarray:
    """Rendering locations by voxel-grid downsampling of the vertex cloud
    (reference: multiviews.py:339, open3d voxel grid -> own grid hash)."""
    from ..reps.rep_helper import surface_samples

    return surface_samples(
        verts_nm, bin_sizes=(ds_factor_nm,) * 3, max_nb_samples=None
    )


def _view_props(view_props: Optional[dict]) -> Tuple[Tuple[int, int], int, float]:
    cfg = global_params.config
    vp = dict(cfg["views"]["view_properties"])
    if view_props:
        vp.update(view_props)
    return tuple(vp["ws"]), int(vp["nb_views"]), float(vp["comp_window"])


def _cell_vertex_table(ssv, channels: Sequence[str]) -> Tuple[np.ndarray, Dict[str, slice]]:
    """Concatenate per-channel mesh vertices; returns (verts, channel slices)."""
    verts = []
    slices = {}
    off = 0
    for ch in channels:
        try:
            mesh = ssv.load_mesh(ch if ch != "sj" else ("syn_ssv" if len(ssv.lookup_in_attribute_dict("syn_ssv", [])) else "sj"))
        except Exception:
            mesh = None
        v = (
            np.asarray(mesh[1], np.float32).reshape(-1, 3)
            if mesh is not None and len(mesh[1])
            else np.zeros((0, 3), np.float32)
        )
        slices[ch] = slice(off, off + len(v))
        off += len(v)
        verts.append(v)
    return (np.concatenate(verts) if verts else np.zeros((0, 3), np.float32)), slices


def render_sso_coords(
    ssv,
    coords_nm: np.ndarray,
    ws: Optional[Tuple[int, int]] = None,
    nb_views: Optional[int] = None,
    comp_window: Optional[float] = None,
    view_props: Optional[dict] = None,
    return_rot_mat: bool = False,
    channels: Sequence[str] = VIEW_CHANNELS,
):
    """Depth views with one channel per object type
    (reference: rendering.py:204). Returns (L, nb_views, C, W, H) uint8."""
    dws, dnv, dcw = _view_props(view_props)
    ws = tuple(ws) if ws is not None else dws
    nb_views = nb_views or dnv
    comp_window = comp_window or dcw
    coords_nm = np.asarray(coords_nm, np.float32).reshape(-1, 3)

    cell_mesh = ssv.load_mesh("sv")
    cell_verts = np.asarray(cell_mesh[1], np.float32).reshape(-1, 3)
    rots = (
        calc_rot_matrices(coords_nm, cell_verts, comp_window)
        if len(cell_verts)
        else np.tile(np.eye(3, dtype=np.float32), (len(coords_nm), 1, 1))
    )
    renderer = SplatRenderer(ws=ws, nb_views=nb_views)
    out = np.full(
        (len(coords_nm), nb_views, len(channels), ws[0], ws[1]), BACKGROUND, np.uint8
    )
    for ci, ch in enumerate(channels):
        try:
            mesh = ssv.load_mesh(ch if ch != "sj" else ("syn_ssv" if len(ssv.lookup_in_attribute_dict("syn_ssv", [])) else "sj"))
        except Exception:
            mesh = None
        if mesh is None or len(mesh[1]) == 0:
            continue
        depth, _ = renderer.render(mesh[1], coords_nm, rots, comp_window)
        out[:, :, ci] = depth
    if return_rot_mat:
        return out, rots
    return out


def render_sso_coords_index_views(
    ssv,
    coords_nm: np.ndarray,
    ws: Optional[Tuple[int, int]] = None,
    nb_views: Optional[int] = None,
    comp_window: Optional[float] = None,
    view_props: Optional[dict] = None,
    rot_mat: Optional[np.ndarray] = None,
):
    """Per-pixel winning cell-mesh VERTEX indices (reference:
    rendering.py:300; replaces the RGBA id encoding). -1 = background."""
    dws, dnv, dcw = _view_props(view_props)
    ws = tuple(ws) if ws is not None else dws
    nb_views = nb_views or dnv
    comp_window = comp_window or dcw
    coords_nm = np.asarray(coords_nm, np.float32).reshape(-1, 3)
    mesh = ssv.load_mesh("sv")
    verts = np.asarray(mesh[1], np.float32).reshape(-1, 3)
    if rot_mat is None:
        rot_mat = (
            calc_rot_matrices(coords_nm, verts, comp_window)
            if len(verts)
            else np.tile(np.eye(3, dtype=np.float32), (len(coords_nm), 1, 1))
        )
    renderer = SplatRenderer(ws=ws, nb_views=nb_views)
    _, index = renderer.render(verts, coords_nm, rot_mat, comp_window)
    return index


def render_sso_coords_label_views(
    ssv,
    vertex_labels: np.ndarray,
    coords_nm: np.ndarray,
    background_label: int = -1,
    **kw,
):
    """Views of per-vertex labels (reference: rendering.py:399)."""
    index = render_sso_coords_index_views(ssv, coords_nm, **kw)
    labels = np.asarray(vertex_labels)
    out = np.where(index >= 0, labels[np.clip(index, 0, len(labels) - 1)], background_label)
    return out


def render_sampled_sso(ssv, ws=None, nb_views=None, comp_window=None, verbose=False):
    """Views at surface-sampled locations of the whole cell
    (reference: rendering.py:119). Returns (views, locations)."""
    cfg = global_params.config
    mesh = ssv.load_mesh("sv")
    verts = np.asarray(mesh[1], np.float32).reshape(-1, 3)
    if len(verts) == 0:
        return np.zeros((0,)), np.zeros((0, 3))
    dws, dnv, dcw = _view_props(None)
    comp_window = comp_window or dcw
    locs = generate_rendering_locs(verts, comp_window / 3)
    views = render_sso_coords(ssv, locs, ws=ws, nb_views=nb_views, comp_window=comp_window)
    return views, locs


def semseg2mesh_via_views(
    index_views: np.ndarray,
    label_views: np.ndarray,
    n_vertices: int,
    n_classes: int,
    unpredicted_label: Optional[int] = None,
) -> np.ndarray:
    """Per-pixel view predictions -> per-vertex labels by majority of the
    pixels each vertex won (reference: ssh:1527 ``semseg2mesh_counter``)."""
    votes = np.zeros((n_vertices, n_classes), np.int64)
    ix = index_views.reshape(-1)
    lab = label_views.reshape(-1)
    sel = (ix >= 0) & (lab >= 0) & (lab < n_classes)
    np.add.at(votes, (ix[sel], lab[sel]), 1)
    out = np.argmax(votes, axis=1)
    if unpredicted_label is not None:
        out = np.where(votes.sum(axis=1) == 0, unpredicted_label, out)
    return out


def write_sv_views_chunked(
    svs, views: np.ndarray, part_views: np.ndarray, view_key: str = "raw"
):
    """Write many supervoxels' views into their per-shard view caches with
    ONE storage open/push per shard (reference: proc/rendering.py:581
    ``write_sv_views_chunked``).

    Args:
        svs: SegmentationObjects (typically all SVs of one cell).
        views: concatenated view array over all SVs.
        part_views: cumulated view counts; SV ``i`` owns
            ``views[part_views[i]:part_views[i + 1]]``.
        view_key: cache key (e.g. 'raw').
    """
    from ..backend import CompressedStorage

    part_views = np.asarray(part_views, np.int64)
    assert len(part_views) == len(svs) + 1
    by_path = {}
    for i, sv in enumerate(svs):
        by_path.setdefault(sv.view_path, []).append(
            (int(sv.id), int(part_views[i]), int(part_views[i + 1]))
        )
    for path, items in by_path.items():
        cs = CompressedStorage(path, read_only=False)
        for sv_id, lo, hi in items:
            cs[(sv_id, view_key)] = np.asarray(views[lo:hi])
        cs.push()
