"""Astrocyte (glia) separation from the initial supervoxel graph.

Reference parity: syconn/proc/glia_splitting.py — ``run_glia_splitting``
:26, ``collect_glia_sv`` :37, ``write_astrocyte_svgraph`` :77,
``transform_rag_edgelist2pkl`` :164; splitting core in proc/graphs.py:173.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import networkx as nx
import numpy as np

from .. import global_params
from ..io.graph import load_svgraph, save_svgraph
from ..reps.segmentation import SegmentationDataset
from .graphs import remove_glia_nodes

log = logging.getLogger("syconn_tpu.glia")

__all__ = ["run_glia_splitting", "collect_glia_sv", "write_astrocyte_svgraph"]


def run_glia_splitting() -> Dict[str, int]:
    """Partition the pruned supervoxel graph into neuron and astrocyte
    subgraphs using per-SV glia probabilities (attr ``glia_probas``)."""
    cfg = global_params.config
    g = load_svgraph(cfg.pruned_svgraph_path)
    sd_sv = SegmentationDataset("sv", working_dir=cfg.working_dir)
    probas = {}
    ids = sd_sv.ids
    cached = sd_sv.load_numpy_data("glia_probas")
    if cached is not None:
        probas = dict(zip(ids.tolist(), np.asarray(cached, np.float64).tolist()))
    else:
        for i in ids:
            so = sd_sv.get_segmentation_object(int(i))
            probas[int(i)] = float(so.lookup_in_attribute_dict("glia_probas", 0.0) or 0.0)
    scale = np.array(cfg["scaling"], np.float64)
    bbs = {
        int(i): bb * scale[None] for i, bb in zip(ids, sd_sv.bounding_boxes)
    }
    thresh = float(cfg["glia"]["glia_thresh"])
    min_cc = float(cfg["min_cc_size_ssv"])
    neuron_nodes, glia_nodes = [], []
    for comp in nx.connected_components(g):
        sub = g.subgraph(comp)
        nn_, gn_ = remove_glia_nodes(sub, probas, thresh, min_cc, bbs=bbs)
        neuron_nodes.extend(nn_)
        glia_nodes.extend(gn_)
    save_svgraph(g.subgraph(neuron_nodes).copy(), cfg.neuron_svgraph_path)
    save_svgraph(g.subgraph(glia_nodes).copy(), cfg.astrocyte_svgraph_path)
    log.info(
        "glia splitting: %d neuron SVs, %d astrocyte SVs", len(neuron_nodes), len(glia_nodes)
    )
    if len(neuron_nodes) == 0 and len(glia_nodes) > 0:
        log.warning(
            "glia splitting removed EVERY supervoxel (%d glia, 0 neurons) — "
            "the glia model at %s is likely untrained or glia_thresh=%.3f is "
            "too low; the connectome will be empty",
            len(glia_nodes), cfg.mpath_glia_pts, thresh,
        )
    return {"n_neuron_sv": len(neuron_nodes), "n_glia_sv": len(glia_nodes)}


def collect_glia_sv() -> np.ndarray:
    """IDs of SVs assigned to astrocytes (reference: :37)."""
    cfg = global_params.config
    g = load_svgraph(cfg.astrocyte_svgraph_path)
    return np.array(sorted(g.nodes()), np.uint64)


def write_astrocyte_svgraph(*a, **kw):
    """Kept for API parity — the split writes both graphs directly."""
    return run_glia_splitting()
