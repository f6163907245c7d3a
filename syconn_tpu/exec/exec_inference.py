"""Neural-inference orchestration — pipeline steps 3 and 7-9.

Reference parity: syconn/exec/exec_inference.py —
``run_morphology_embedding`` :29, ``run_cell_embedding`` :69,
``run_celltype_prediction`` :113, ``run_semsegaxoness_prediction`` :147,
``run_semsegspiness_prediction`` :189, ``run_astrocyte_prediction[_pts]``
:217/:290, ``run_astrocyte_splitting`` :341.
"""

from __future__ import annotations

from typing import Optional

from .. import global_params
from ..handler.config import initialize_logging

__all__ = [
    "run_celltype_prediction",
    "run_semsegaxoness_prediction",
    "run_semsegspiness_prediction",
    "run_morphology_embedding",
    "run_cell_embedding",
    "run_astrocyte_prediction",
    "run_astrocyte_prediction_pts",
    "run_astrocyte_splitting",
]


def run_celltype_prediction(max_n_jobs_gpu: Optional[int] = None):
    """(reference: exec_inference.py:113). Dispatches on
    ``use_point_models``: point contexts or rendered multi-view CMN."""
    lg = initialize_logging("exec_inference")
    cfg = global_params.config
    if cfg.use_point_models:
        from ..inference.points import predict_celltype_ssd

        n = predict_celltype_ssd()
    else:
        from ..inference.views_infer import celltype_of_sso_views
        from ..parallel.executor import map_parallel
        from ..reps.super_segmentation import SuperSegmentationDataset

        ssd = SuperSegmentationDataset(working_dir=cfg.working_dir)

        def work(ssv_id):
            celltype_of_sso_views(ssd.get_super_segmentation_object(int(ssv_id)))
            return 1

        n = sum(map_parallel(work, list(ssd.ssv_ids), n_workers=4, desc="celltype_views"))
    lg.info("celltype prediction done (%d cells)", n)
    return n


def run_semsegaxoness_prediction(max_n_jobs_gpu: Optional[int] = None):
    """Axon/dendrite/soma compartments -> skeleton nodes
    (reference: exec_inference.py:147). Point or view models per config."""
    lg = initialize_logging("exec_inference")
    cfg = global_params.config
    if cfg.use_point_models:
        from ..inference.points import predict_compartments_ssd

        n = predict_compartments_ssd(skel_key="axoness", n_classes=3)
    else:
        from ..inference.views_infer import (
            average_node_axoness_views,
            semseg_of_sso_views,
        )
        from ..parallel.executor import map_parallel
        from ..reps.super_segmentation import SuperSegmentationDataset

        ssd = SuperSegmentationDataset(working_dir=cfg.working_dir)
        # optional reference-parity chain: per-location scalar view CMN
        # predictions averaged onto nodes along the skeleton (ssh:1152)
        scalar_avg = bool(cfg["compartments"].get("view_scalar_avg", False))

        def work(ssv_id):
            ssv = ssd.get_super_segmentation_object(int(ssv_id))
            semseg_of_sso_views(ssv, semseg_key="axoness", n_classes=3)
            if scalar_avg:
                max_dist = float(cfg["compartments"]["dist_axoness_averaging"])
                average_node_axoness_views(ssv, max_dist=max_dist)
                ssv.save_skeleton()
            return 1

        n = sum(map_parallel(work, list(ssd.ssv_ids), n_workers=4, desc="axoness_views"))
    lg.info("axoness prediction done (%d cells)", n)
    return n


def run_semsegspiness_prediction(max_n_jobs_gpu: Optional[int] = None):
    """Spine semseg (shaft/head/neck/other) -> skeleton nodes
    (reference: exec_inference.py:189)."""
    lg = initialize_logging("exec_inference")
    cfg = global_params.config
    from ..inference.points import predict_compartments_ssd

    n = predict_compartments_ssd(
        skel_key="spiness", n_classes=4, mpath=cfg.mpath_spiness
    )
    lg.info("spiness prediction done (%d cells)", n)
    return n


def run_morphology_embedding(max_n_jobs_gpu: Optional[int] = None):
    """(reference: exec_inference.py:29). Point or view (tCMN) models."""
    lg = initialize_logging("exec_inference")
    cfg = global_params.config
    if cfg.use_point_models:
        from ..inference.points import infere_cell_morphology_ssd

        n = infere_cell_morphology_ssd()
    else:
        from ..inference.views_infer import view_embedding_of_sso
        from ..parallel.executor import map_parallel
        from ..reps.super_segmentation import SuperSegmentationDataset

        ssd = SuperSegmentationDataset(working_dir=cfg.working_dir)

        def work(ssv_id):
            view_embedding_of_sso(ssd.get_super_segmentation_object(int(ssv_id)))
            return 1

        n = sum(map_parallel(work, list(ssd.ssv_ids), n_workers=4, desc="embedding_views"))
    lg.info("morphology embeddings done (%d cells)", n)
    return n


def run_cell_embedding(max_n_jobs_gpu: Optional[int] = None):
    """Whole-cell embedding (reference: exec_inference.py:69); same engine
    as the morphology embedding with cell-level pooling."""
    return run_morphology_embedding(max_n_jobs_gpu)


def run_astrocyte_prediction_pts(max_n_jobs_gpu: Optional[int] = None):
    """Per-SV glia probability via point models
    (reference: exec_inference.py:290)."""
    lg = initialize_logging("exec_inference")
    import networkx as nx
    import numpy as np

    from ..inference.points import predict_glia_ssv
    from ..io.graph import load_svgraph
    from ..reps.segmentation import SegmentationDataset
    from ..reps.super_segmentation import SuperSegmentationDataset

    cfg = global_params.config
    # operate on the pruned RAG's components (pre-neuron-assembly)
    g = load_svgraph(cfg.pruned_svgraph_path)
    mapping = {}
    for comp in nx.connected_components(g):
        members = sorted(int(n) for n in comp)
        mapping[members[0]] = np.array(members, np.uint64)
    tmp_ssd = SuperSegmentationDataset(
        working_dir=cfg.working_dir, version="gliapred", sv_mapping=mapping, create=True
    )
    n = predict_glia_ssv(ssd=tmp_ssd)
    # cache per-SV probas dataset-wide
    sd_sv = SegmentationDataset("sv", working_dir=cfg.working_dir)
    probas = []
    for i in sd_sv.ids:
        so = sd_sv.get_segmentation_object(int(i))
        probas.append(float(so.lookup_in_attribute_dict("glia_probas", 0.0) or 0.0))
    sd_sv.save_numpy_data("glia_probas", np.array(probas, np.float64))
    lg.info("astrocyte prediction done (%d SVs)", n)
    return n


def run_astrocyte_prediction(*a, **kw):
    """View-based variant routes to the point predictor (the multi-view
    renderer feeds the same per-SV probabilities; reference:
    exec_inference.py:217)."""
    return run_astrocyte_prediction_pts(*a, **kw)


def run_astrocyte_splitting():
    """(reference: exec_inference.py:341)"""
    lg = initialize_logging("exec_inference")
    from ..proc.glia_splitting import run_glia_splitting

    stats = run_glia_splitting()
    lg.info("astrocyte splitting: %s", stats)
    return stats
