"""Dataset initialization orchestration — pipeline steps 2 and 4.

Reference parity: syconn/exec/exec_init.py —
``init_cell_subcell_sds`` :213 (organelle extraction + fused property/mesh
scan), ``run_create_rag`` :299 (prune the initial supervoxel graph by
connected-component size), ``run_create_neuron_ssd`` :32 (cell assembly:
connected components -> SuperSegmentationDataset + organelle mapping).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import networkx as nx
import numpy as np

from .. import global_params
from ..handler.config import initialize_logging
from ..io.graph import load_svgraph, save_svgraph
from ..proc.graphs import create_ccsize_dict
from ..proc.sd_proc import dataset_analysis, map_subcell_extract_props
from ..proc.ssd_proc import aggregate_segmentation_object_mappings, apply_mapping_decisions
from ..reps.segmentation import SegmentationDataset
from ..reps.super_segmentation import SuperSegmentationDataset, save_dataset_deep

log = logging.getLogger("syconn_tpu.exec_init")

__all__ = ["init_cell_subcell_sds", "run_create_rag", "run_create_neuron_ssd", "sd_init", "kd_init"]


def kd_init(co: str, chunk_size=None, **kw):
    """Extract an organelle's instance segmentation from its prob map
    (reference: exec_init.py:166)."""
    from ..extraction.object_extraction import generate_subcell_kd_from_proba

    return generate_subcell_kd_from_proba(co, chunk_size=chunk_size, **kw)


def sd_init(co: str, **kw):
    from ..proc.sd_proc import sd_init as _sd_init

    return _sd_init(co, **kw)


def init_cell_subcell_sds(
    chunk_size: Optional[Sequence[int]] = None,
    n_folders_fs: int = 100,
    n_folders_fs_sc: int = 100,
    generate_sv_meshes: bool = True,
    overwrite: bool = False,
    load_cellorganelles_from_kd_overlaycubes: bool = False,
    transf_func_kd_overlay=None,
    max_n_jobs: Optional[int] = None,
):
    """Organelle extraction + fused SV/organelle property-mesh scan
    (reference: exec_init.py:213)."""
    from ..utils.stepcache import StepCache

    lg = initialize_logging("exec_init")
    cfg = global_params.config
    organelles = list(cfg["process_cell_organelles"])
    # step 1: prob maps -> instance segmentations per organelle. A target
    # that exists but whose step cache lacks the completion marker came
    # from a crashed run — rerun it (completed chunks resume from cache).
    for co in organelles:
        target = cfg.kd_organelle_seg_paths[co]
        name = os.path.basename(os.path.normpath(target))
        done = StepCache(f"objext_{name}_relabel").is_complete()
        if os.path.isdir(target) and not overwrite and done:
            lg.info("organelle seg %s exists and is complete, skipping", co)
            continue
        stats = kd_init(co, chunk_size=chunk_size, overwrite=overwrite)
        lg.info("extracted %s: %s", co, stats)
    # step 2: fused property + mapping + mesh scan
    counts = map_subcell_extract_props(
        cfg.kd_seg_path,
        cfg.kd_organelle_seg_paths,
        n_folders_fs=n_folders_fs,
        n_folders_fs_sc=n_folders_fs_sc,
        chunk_shape=chunk_size,
        generate_sv_meshes=generate_sv_meshes,
        overwrite=overwrite,
    )
    # step 3: dataset-level caches
    for t in ["sv"] + organelles:
        sd = SegmentationDataset(t, working_dir=cfg.working_dir)
        dataset_analysis(sd)
    lg.info("init_cell_subcell_sds done: %s", counts)
    return counts


def run_create_rag():
    """Prune the initial supervoxel graph: drop connected components whose
    bounding-box diagonal is below ``min_cc_size_ssv``
    (reference: exec_init.py:299). Writes ``pruned_svgraph.bz2``."""
    lg = initialize_logging("exec_init")
    cfg = global_params.config
    g = load_svgraph(cfg.init_svgraph_path)
    sd_sv = SegmentationDataset("sv", working_dir=cfg.working_dir)
    # ensure every known SV takes part (singletons included)
    g.add_nodes_from(int(i) for i in sd_sv.ids)
    scale = np.array(cfg["scaling"], np.float64)
    bbs = {
        int(i): bb * scale[None]
        for i, bb in zip(sd_sv.ids, sd_sv.bounding_boxes)
    }
    ccsize = create_ccsize_dict(g, bbs)
    min_cc = float(cfg["min_cc_size_ssv"])
    before = g.number_of_nodes()
    keep = [n for n in g.nodes() if ccsize.get(n, 0) >= min_cc]
    pruned = g.subgraph(keep).copy()
    save_svgraph(pruned, cfg.pruned_svgraph_path)
    lg.info(
        "run_create_rag: %d -> %d SVs after size pruning (min diag %.0f nm)",
        before, pruned.number_of_nodes(), min_cc,
    )
    return pruned


def run_create_neuron_ssd(overwrite: bool = False, apply_ssv_size_threshold: bool = False):
    """Cell assembly: connected components of the pruned graph become SSVs
    (id = min member SV id); builds the SSD with caches, reverse index,
    per-cell SV graphs and organelle mappings (reference: exec_init.py:32)."""
    lg = initialize_logging("exec_init")
    cfg = global_params.config
    # after astrocyte splitting the neuron-only graph takes precedence
    path = cfg.neuron_svgraph_path
    if not os.path.isfile(path):
        path = cfg.pruned_svgraph_path
    g = load_svgraph(path)
    mapping = {}
    for comp in nx.connected_components(g):
        members = sorted(int(n) for n in comp)
        mapping[members[0]] = np.array(members, np.uint64)
    ssd = SuperSegmentationDataset(
        working_dir=cfg.working_dir, sv_mapping=mapping, create=True
    )
    save_dataset_deep(ssd)
    # per-cell SV graphs
    for ssv_id, members in mapping.items():
        ssv = ssd.get_super_segmentation_object(ssv_id)
        sub = g.subgraph(int(m) for m in members).copy()
        os.makedirs(ssv.ssv_dir, exist_ok=True)
        ssv.save_sv_graph(sub)
    organelles = list(cfg["process_cell_organelles"])
    if organelles:
        aggregate_segmentation_object_mappings(ssd, organelles)
        apply_mapping_decisions(ssd, organelles)
    lg.info("run_create_neuron_ssd: %d cells", len(mapping))
    return ssd
