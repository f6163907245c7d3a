"""Graph operations on supervoxel graphs (RAGs) and skeletons.

Reference parity: syconn/proc/graphs.py — ``split_subcc`` :56 /
``split_subcc_join`` :102 (overlapping subgraph windows for huge cells),
``create_ccsize_dict`` :220 (connected-component bounding-box diagonals),
glia splitting :173-278, ``bfs_smoothing`` :22, ``stitch_skel_nx`` :701,
``create_graph_from_coords`` :555.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import networkx as nx
import numpy as np
from scipy import spatial

__all__ = [
    "create_ccsize_dict",
    "split_subcc",
    "split_subcc_join",
    "bfs_smoothing",
    "stitch_skel_nx",
    "create_graph_from_coords",
    "chunkify_graph_bfs",
    "split_glia_graph",
    "remove_glia_nodes",
]


def create_ccsize_dict(g: nx.Graph, bbs: Dict[int, np.ndarray], is_connected_components: bool = False) -> Dict[int, float]:
    """Per-node size of its connected component, measured as the bounding-box
    diagonal (nm) of the union of the members' boxes
    (reference: proc/graphs.py:220)."""
    ccs = [g] if is_connected_components else [g.subgraph(c) for c in nx.connected_components(g)]
    out = {}
    for cc in ccs:
        nodes = list(cc.nodes())
        boxes = np.array([bbs[n] for n in nodes if n in bbs])
        if len(boxes) == 0:
            diag = 0.0
        else:
            lo = boxes[:, 0].min(axis=0)
            hi = boxes[:, 1].max(axis=0)
            diag = float(np.linalg.norm(hi - lo))
        for n in nodes:
            out[n] = diag
    return out


def split_subcc(g: nx.Graph, max_nb: int, verbose: bool = False, start_nodes=None) -> Dict:
    """Partition a graph into BFS-grown subgraphs of <= max_nb nodes
    (reference: proc/graphs.py:56). Returns {seed_node: [nodes]}."""
    out = {}
    visited = set()
    nodes = start_nodes if start_nodes is not None else list(g.nodes())
    for seed in nodes:
        if seed in visited:
            continue
        members = []
        for n in nx.bfs_tree(g, seed):
            if n in visited:
                continue
            members.append(n)
            visited.add(n)
            if len(members) >= max_nb:
                break
        out[seed] = members
    return out


def split_subcc_join(g: nx.Graph, subgraph_size: int, lo_first_n: int = 1) -> List[List]:
    """Overlapping BFS windows over a graph: each window has
    ``subgraph_size`` nodes; consecutive windows share all but the first
    ``lo_first_n`` nodes of the frontier (reference: proc/graphs.py:102) —
    the context/sequence-parallel analog for huge cells (SURVEY.md §5.7)."""
    out = []
    for comp in nx.connected_components(g):
        sub = g.subgraph(comp)
        order = list(nx.bfs_tree(sub, next(iter(comp))))
        i = 0
        while i < len(order):
            window = order[max(0, i) : i + subgraph_size]
            if not window:
                break
            out.append(list(window))
            if i + subgraph_size >= len(order):
                break
            i += max(1, lo_first_n)
    return out


def bfs_smoothing(
    vertices: np.ndarray, vertex_labels: np.ndarray, n_voting: int = 40, max_edge_length: float = 250
) -> np.ndarray:
    """Majority-smooth vertex labels over spatial neighborhoods
    (reference: proc/graphs.py:22)."""
    tree = spatial.cKDTree(vertices)
    _, ixs = tree.query(vertices, k=min(n_voting, len(vertices)), distance_upper_bound=max_edge_length)
    labels = np.asarray(vertex_labels)
    out = labels.copy()
    valid_max = len(vertices)
    for i in range(len(vertices)):
        neigh = ixs[i]
        neigh = neigh[neigh < valid_max]
        vals = labels[neigh]
        out[i] = np.bincount(vals.astype(np.int64)).argmax()
    return out


def create_graph_from_coords(
    coords: np.ndarray, max_dist_nm: float = 6000, force_single_cc: bool = True, k: int = 3
) -> nx.Graph:
    """kNN graph over coordinates; optionally force one connected component
    by bridging closest pairs (reference: proc/graphs.py:555)."""
    coords = np.asarray(coords, np.float64)
    g = nx.Graph()
    g.add_nodes_from(range(len(coords)))
    if len(coords) <= 1:
        return g
    tree = spatial.cKDTree(coords)
    dists, ixs = tree.query(coords, k=min(k + 1, len(coords)))
    for i in range(len(coords)):
        for j_ix in range(1, ixs.shape[1]):
            j = ixs[i, j_ix]
            if dists[i, j_ix] <= max_dist_nm:
                g.add_edge(i, int(j), weight=float(dists[i, j_ix]))
    if force_single_cc:
        comps = [list(c) for c in nx.connected_components(g)]
        while len(comps) > 1:
            base = comps[0]
            base_tree = spatial.cKDTree(coords[base])
            best = (np.inf, None, None)
            for other in comps[1:]:
                d, ix = base_tree.query(coords[other])
                m = int(np.argmin(d))
                if d[m] < best[0]:
                    best = (float(d[m]), other[m], base[int(ix[m])])
            g.add_edge(best[1], best[2], weight=best[0])
            comps = [list(c) for c in nx.connected_components(g)]
    return g


def stitch_skel_nx(skel_nx: nx.Graph) -> nx.Graph:
    """Connect all components of a skeleton graph by repeatedly bridging the
    closest node pairs (reference: proc/graphs.py:701). Node attribute
    'position' holds coordinates."""
    comps = [list(c) for c in nx.connected_components(skel_nx)]
    if len(comps) <= 1:
        return skel_nx
    pos = nx.get_node_attributes(skel_nx, "position")
    while len(comps) > 1:
        base = comps[0]
        base_coords = np.array([pos[n] for n in base], np.float64)
        tree = spatial.cKDTree(base_coords)
        best = (np.inf, None, None)
        for other in comps[1:]:
            oc = np.array([pos[n] for n in other], np.float64)
            d, ix = tree.query(oc)
            m = int(np.argmin(d))
            if d[m] < best[0]:
                best = (float(d[m]), other[m], base[int(ix[m])])
        skel_nx.add_edge(best[1], best[2])
        comps = [list(c) for c in nx.connected_components(skel_nx)]
    return skel_nx


def chunkify_graph_bfs(g: nx.Graph, n_chunks: int) -> List[List]:
    """Split a graph into ~n_chunks BFS-contiguous node lists."""
    nodes = []
    for comp in nx.connected_components(g):
        sub = g.subgraph(comp)
        nodes.extend(nx.bfs_tree(sub, next(iter(comp))))
    size = max(1, len(nodes) // max(n_chunks, 1))
    return [nodes[i : i + size] for i in range(0, len(nodes), size)]


# ------------------------------------------------------------ glia splitting
def remove_glia_nodes(
    g: nx.Graph, glia_probas: Dict[int, float], glia_thresh: float, min_cc_size_nm: float,
    bbs: Optional[Dict[int, np.ndarray]] = None,
):
    """Partition a cell's SV graph into neuron and astrocyte subgraphs by
    thresholding per-SV glia probability; small components flip to the
    majority side (reference: proc/graphs.py:173-278 ``split_glia_graph`` /
    ``remove_glia_nodes``). Returns (neuron_nodes, glia_nodes)."""
    glia_nodes = {n for n in g.nodes() if glia_probas.get(n, 0.0) > glia_thresh}
    neuron_nodes = set(g.nodes()) - glia_nodes
    if bbs is not None and min_cc_size_nm > 0:
        for side_nodes, other in ((neuron_nodes, glia_nodes), (glia_nodes, neuron_nodes)):
            sub = g.subgraph(list(side_nodes))
            ccsize = create_ccsize_dict(sub, bbs) if len(side_nodes) else {}
            flip = {n for n in list(side_nodes) if ccsize.get(n, 0) < min_cc_size_nm}
            side_nodes -= flip
            other |= flip
    return sorted(neuron_nodes), sorted(glia_nodes)


def split_glia_graph(g, glia_probas, glia_thresh, min_cc_size_nm, bbs=None):
    neuron, glia = remove_glia_nodes(g, glia_probas, glia_thresh, min_cc_size_nm, bbs)
    return g.subgraph(neuron).copy(), g.subgraph(glia).copy()
