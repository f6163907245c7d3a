"""View-rendering orchestration.

Reference parity: syconn/exec/exec_render.py — ``run_neuron_rendering``
:142 (with the big/small cell split :27/:92) and
``run_astrocyte_rendering`` :206. The TPU splat renderer batches
(location, view) frames in one jitted kernel, so the big/small split
becomes a simple size-descending order (largest compile-bucket first).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .. import global_params
from ..handler.config import initialize_logging

__all__ = ["run_neuron_rendering", "run_astrocyte_rendering"]


def run_neuron_rendering(max_n_jobs: Optional[int] = None):
    """Render + persist default views for every cell
    (reference: exec_render.py:142)."""
    lg = initialize_logging("exec_render")
    from ..parallel.executor import map_parallel
    from ..render.views import render_sampled_sso
    from ..reps.super_segmentation import SuperSegmentationDataset
    from ..reps.views import ViewContainer

    cfg = global_params.config
    ssd = SuperSegmentationDataset(working_dir=cfg.working_dir)
    sizes = ssd.load_numpy_data("size")
    order = np.argsort(sizes)[::-1] if sizes is not None else np.arange(len(ssd.ssv_ids))
    ssv_ids = np.asarray(ssd.ssv_ids)[order]

    def work(ssv_id):
        ssv = ssd.get_super_segmentation_object(int(ssv_id))
        views, locs = render_sampled_sso(ssv)
        if len(views) == 0:
            return 0
        vc = ViewContainer(ssv.ssv_dir)
        vc.save_views(views)
        ssv.attr_dict["view_locations"] = locs
        ssv.save_attr_dict()
        return 1

    n = sum(map_parallel(work, list(ssv_ids), n_workers=4, desc="render_neurons"))
    lg.info("rendered views for %d cells", n)
    return n


def run_astrocyte_rendering(max_n_jobs: Optional[int] = None):
    """Views for the pre-assembly RAG components (glia classification path,
    reference: exec_render.py:206)."""
    lg = initialize_logging("exec_render")
    import networkx as nx

    from ..io.graph import load_svgraph
    from ..parallel.executor import map_parallel
    from ..render.views import render_sampled_sso
    from ..reps.super_segmentation import SuperSegmentationDataset
    from ..reps.views import ViewContainer

    cfg = global_params.config
    g = load_svgraph(cfg.pruned_svgraph_path)
    mapping = {}
    for comp in nx.connected_components(g):
        members = sorted(int(n) for n in comp)
        mapping[members[0]] = np.array(members, np.uint64)
    tmp_ssd = SuperSegmentationDataset(
        working_dir=cfg.working_dir, version="gliapred", sv_mapping=mapping, create=True
    )

    def work(ssv_id):
        ssv = tmp_ssd.get_super_segmentation_object(int(ssv_id))
        views, locs = render_sampled_sso(ssv)
        if len(views) == 0:
            return 0
        ViewContainer(ssv.ssv_dir).save_views(views)
        return 1

    n = sum(map_parallel(work, sorted(mapping.keys()), n_workers=4, desc="render_astro"))
    lg.info("rendered astrocyte-candidate views for %d components", n)
    return n
