"""Supervoxel-graph (RAG) IO: bz2-compressed pickled edge lists."""

from __future__ import annotations

import bz2
import pickle
from typing import Union

import networkx as nx
import numpy as np

__all__ = ["load_svgraph", "save_svgraph"]


def load_svgraph(path: str) -> nx.Graph:
    """Load a supervoxel graph. Accepts a pickled networkx graph or an
    (N, 2) edge array, bz2-compressed or plain."""
    opener = bz2.open if path.endswith(".bz2") else open
    with opener(path, "rb") as f:
        obj = pickle.load(f)
    if isinstance(obj, nx.Graph):
        return obj
    g = nx.Graph()
    if isinstance(obj, dict) and "edges" in obj:
        if obj.get("nodes") is not None:
            g.add_nodes_from(int(n) for n in obj["nodes"])
        g.add_edges_from((int(a), int(b)) for a, b in np.asarray(obj["edges"]).reshape(-1, 2))
        return g
    edges = np.asarray(obj)
    if edges.ndim == 2 and edges.shape[1] == 2:
        g.add_edges_from((int(a), int(b)) for a, b in edges)
    else:
        raise ValueError(f"Unrecognized graph format in {path}.")
    return g


def save_svgraph(g: Union[nx.Graph, np.ndarray], path: str):
    opener = bz2.open if path.endswith(".bz2") else open
    if isinstance(g, nx.Graph):
        payload = np.array(list(g.edges()), dtype=np.uint64)
        # keep isolated nodes via self-edges? store nodes separately instead
        obj = {"edges": payload, "nodes": np.array(list(g.nodes()), np.uint64)}
    else:
        obj = {"edges": np.asarray(g, np.uint64), "nodes": None}
    with opener(path, "wb") as f:
        pickle.dump(obj, f, protocol=4)
