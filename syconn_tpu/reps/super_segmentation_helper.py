"""Cell-level helper library (compartments, skeleton fallback, synapse stats).

Reference parity: syconn/reps/super_segmentation_helper.py —
``create_sso_skeleton_fast`` :881 (mesh-based skeleton fallback),
``sparsify_skeleton_fast`` :650, ``majorityvote_skeleton_property`` :1270,
``map_myelin2coords`` :550, ``semseg2mesh`` :1554,
``syn_sign_ratio_celltype`` :1981, no-cache inference wrappers
:1495-1820 (implemented in inference/views_infer.py and re-exported here).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import networkx as nx
import numpy as np
from scipy import spatial

from .. import global_params
from ..inference.views_infer import (  # noqa: F401 (API parity re-exports)
    celltype_of_sso_views as celltype_of_sso_nocache,
    gliapred_sso_views as gliapred_sso_nocache,
    semseg_of_sso_views as semseg_of_sso_nocache,
    view_embedding_of_sso as view_embedding_of_sso_nocache,
)
from ..proc.skeleton import majorityvote_skeleton_property, map_myelin2coords  # noqa: F401
from ..skeleton.sparsify import (  # noqa: F401
    prune_stub_branches,
    skeleton_to_nx,
    sparsify_skeleton as sparsify_skeleton_fast,
)

__all__ = [
    "create_sso_skeleton_fast",
    "sparsify_skeleton_fast",
    "prune_stub_branches",
    "majorityvote_skeleton_property",
    "map_myelin2coords",
    "semseg2mesh",
    "semseg_for_coords",
    "syn_sign_ratio_celltype",
    "shortestpath2soma",
    "majority_vote_compartments",
    "celltype_of_sso_nocache",
    "view_embedding_of_sso_nocache",
    "semseg_of_sso_nocache",
    "gliapred_sso_nocache",
]


def create_sso_skeleton_fast(ssv, ds_factor_nm: float = 2000.0, save: bool = True):
    """Skeleton from the cell mesh when no volume skeleton exists
    (reference: ssh:881 — the ``allow_ssv_skel_gen`` fallback): sample the
    surface, build a kNN graph, take its minimum spanning tree, sparsify."""
    from ..proc.graphs import create_graph_from_coords
    from ..skeleton.sparsify import nx_to_skeleton, sparsify_skeleton

    mesh = ssv.load_mesh("sv")
    verts = np.asarray(mesh[1], np.float32).reshape(-1, 3)
    if len(verts) == 0:
        return None
    from .rep_helper import surface_samples

    samples = surface_samples(verts, bin_sizes=(ds_factor_nm,) * 3, max_nb_samples=None)
    g = create_graph_from_coords(samples, max_dist_nm=ds_factor_nm * 3, force_single_cc=True)
    mst = nx.minimum_spanning_tree(g)
    scale = np.asarray(ssv.scaling, np.float64)
    gg = nx.Graph()
    for n in mst.nodes():
        gg.add_node(n, position=samples[n] / scale, diameter=float(ds_factor_nm / 10))
    gg.add_edges_from(mst.edges())
    sk = nx_to_skeleton(gg)
    sk = sparsify_skeleton(sk, scale=scale)
    ssv.skeleton = sk
    if save:
        import os

        os.makedirs(ssv.ssv_dir, exist_ok=True)
        ssv.save_skeleton()
    return sk


def semseg2mesh(ssv, semseg_key: str, **kw):
    """Vertex labels of a view-based semseg prediction
    (reference: ssh:1554); stored under ``{semseg_key}_vertex_labels``."""
    v = ssv.lookup_in_attribute_dict(f"{semseg_key}_vertex_labels")
    if v is not None:
        return v
    return semseg_of_sso_nocache(ssv, semseg_key=semseg_key, **kw)


def semseg_for_coords(
    ssv, coords_vx: np.ndarray, semseg_key: str = "axoness",
    k: int = 50, ignore_labels: Sequence[int] = (),
) -> np.ndarray:
    """Labels at arbitrary coordinates via k nearest labeled mesh vertices
    (reference: super_segmentation_object.py:2190)."""
    labels = ssv.lookup_in_attribute_dict(f"{semseg_key}_vertex_labels")
    mesh = ssv.load_mesh("sv")
    verts = np.asarray(mesh[1], np.float32).reshape(-1, 3)
    if labels is None or len(verts) == 0:
        # fall back to skeleton-node labels
        if ssv.load_skeleton() and semseg_key in ssv.skeleton:
            scale = np.asarray(ssv.scaling, np.float64)
            nodes_nm = np.asarray(ssv.skeleton["nodes"], np.float64) * scale[None]
            tree = spatial.cKDTree(nodes_nm)
            q = np.asarray(coords_vx, np.float64) * scale[None]
            _, ixs = tree.query(q)
            return np.asarray(ssv.skeleton[semseg_key])[ixs]
        raise ValueError(f"No '{semseg_key}' labels available for cell {ssv.id}.")
    labels = np.asarray(labels)
    sel = ~np.isin(labels, list(ignore_labels)) if len(ignore_labels) else np.ones(len(labels), bool)
    tree = spatial.cKDTree(verts[sel])
    lv = labels[sel]
    q = np.asarray(coords_vx, np.float64) * np.asarray(ssv.scaling, np.float64)[None]
    kq = min(k, int(sel.sum()))
    _, ixs = tree.query(q, k=kq)
    ixs = np.atleast_2d(ixs)
    n_cls = int(labels.max()) + 1
    return np.array(
        [np.bincount(lv[row].astype(np.int64), minlength=n_cls).argmax() for row in ixs],
        np.int64,
    )


def axoness_for_coords(ssv, coords_vx, **kw):
    """(reference: super_segmentation_object.py:2906)"""
    return semseg_for_coords(ssv, coords_vx, semseg_key="axoness", **kw)


def majority_vote_compartments(skel: dict, key: str = "axoness") -> np.ndarray:
    """Homogenize compartment labels within unbranched skeleton segments
    (reference: ssh:1233)."""
    g = skeleton_to_nx(skel)
    labels = np.asarray(skel[key]).copy()
    # split at branch points; vote within each simple path segment
    branch = {n for n in g.nodes() if g.degree(n) > 2}
    h = g.copy()
    h.remove_nodes_from(branch)
    for comp in nx.connected_components(h):
        members = list(comp)
        vote = np.bincount(labels[members].astype(np.int64)).argmax()
        labels[members] = vote
    return labels


def shortestpath2soma(ssv, coords_vx: np.ndarray, axoness_key: str = "axoness") -> np.ndarray:
    """Geodesic skeleton distance (nm) from each coordinate to the nearest
    soma-labeled node (reference: super_segmentation_object.py:3247).
    Returns inf when the cell has no soma label."""
    if not ssv.load_skeleton():
        raise ValueError("No skeleton.")
    sk = ssv.skeleton
    scale = np.asarray(ssv.scaling, np.float64)
    nodes_nm = np.asarray(sk["nodes"], np.float64) * scale[None]
    g = skeleton_to_nx(sk)
    for a, b in g.edges():
        g[a][b]["weight"] = float(np.linalg.norm(nodes_nm[a] - nodes_nm[b]))
    soma_nodes = (
        [int(i) for i in np.flatnonzero(np.asarray(sk.get(axoness_key, [])) == 2)]
        if axoness_key in sk
        else []
    )
    if not soma_nodes:
        return np.full(len(np.atleast_2d(coords_vx)), np.inf)
    dists = nx.multi_source_dijkstra_path_length(g, soma_nodes)
    tree = spatial.cKDTree(nodes_nm)
    q = np.atleast_2d(np.asarray(coords_vx, np.float64)) * scale[None]
    d_n, ixs = tree.query(q)
    return np.array([d_n[i] + dists.get(int(ixs[i]), np.inf) for i in range(len(q))])


def syn_sign_ratio_celltype(ssv, weighted: bool = True) -> float:
    """Fraction of symmetric (inhibitory) synapses of a cell, optionally
    size-weighted (reference: ssh:1981)."""
    from .segmentation import SegmentationDataset

    ssv.load_attr_dict()
    syn_ids = np.asarray(ssv.attr_dict.get("syn_ssv", []), np.uint64)
    if len(syn_ids) == 0:
        return float("nan")
    sd = SegmentationDataset("syn_ssv", working_dir=ssv.working_dir, config=ssv.config)
    all_ids = sd.ids
    sel = np.isin(all_ids, syn_ids)
    signs = np.asarray(sd.load_numpy_data("syn_sign"))[sel]
    sizes = np.asarray(sd.sizes)[sel].astype(np.float64)
    w = sizes if weighted else np.ones_like(sizes)
    return float(np.sum((signs < 0) * w) / np.sum(w))
