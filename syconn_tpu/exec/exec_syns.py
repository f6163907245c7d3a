"""Synapse pipeline orchestration — steps 6 and the matrix export.

Reference parity: syconn/exec/exec_syns.py — ``run_syn_generation`` :63,
``run_cs_ssv_generation`` :151, ``run_spinehead_volume_calc`` :177,
``run_matrix_export`` :24.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

from .. import global_params
from ..handler.config import initialize_logging

log = logging.getLogger("syconn_tpu.exec_syns")

__all__ = [
    "run_syn_generation",
    "run_cs_ssv_generation",
    "run_spinehead_volume_calc",
    "run_matrix_export",
]


def run_syn_generation(
    chunk_size: Optional[Sequence[int]] = None,
    n_folders_fs: int = 100,
    overwrite: bool = False,
    cube_of_interest_bb=None,
):
    """Contact-site + synapse extraction, agglomeration, organelle mapping
    and probability assignment (reference: exec_syns.py:63)."""
    lg = initialize_logging("exec_syns")
    from ..extraction.cs_extraction import extract_contact_sites
    from ..extraction.cs_processing import (
        classify_synssv_objects,
        combine_and_split_syn,
        map_objects_from_synssv_partners,
    )
    from ..proc.sd_proc import dataset_analysis
    from ..proc.ssd_proc import map_synssv_objects
    from ..reps.segmentation import SegmentationDataset

    stats = extract_contact_sites(
        chunk_shape=chunk_size, n_folders_fs=n_folders_fs, overwrite=overwrite
    )
    lg.info("contact sites: %s", stats)
    stats2 = combine_and_split_syn(n_folders_fs=n_folders_fs, overwrite=overwrite)
    lg.info("syn_ssv: %s", stats2)
    map_objects_from_synssv_partners()
    classify_synssv_objects()
    map_synssv_objects()
    dataset_analysis(SegmentationDataset("syn_ssv", working_dir=global_params.config.working_dir))
    return {**stats, **stats2}


def run_cs_ssv_generation(n_folders_fs: int = 100, overwrite: bool = False):
    """Cell-level contact-site objects (reference: exec_syns.py:151)."""
    lg = initialize_logging("exec_syns")
    from ..extraction.cs_processing import combine_and_split_cs

    stats = combine_and_split_cs(n_folders_fs=n_folders_fs)
    lg.info("cs_ssv: %s", stats)
    return stats


def run_spinehead_volume_calc(n_workers: Optional[int] = None):
    """Spine-head volume per synapse (reference: exec_syns.py:177 ->
    super_segmentation_helper.py:2068 ``extract_spinehead_volume_mesh``):
    per cell, propagate the spiness vertex prediction into the segmentation
    via a distance-transform watershed and measure the head component at
    each spine-head synapse."""
    lg = initialize_logging("exec_syns")
    import numpy as np

    from ..parallel.executor import map_parallel
    from ..reps.segmentation import SegmentationDataset
    from ..reps.super_segmentation import SuperSegmentationDataset
    from ..reps.super_segmentation_helper import extract_spinehead_volume

    cfg = global_params.config
    sd_syn = SegmentationDataset("syn_ssv", working_dir=cfg.working_dir)
    ssd = SuperSegmentationDataset(working_dir=cfg.working_dir)

    def work(ssv_id):
        ssv = ssd.get_super_segmentation_object(int(ssv_id))
        try:
            vols = extract_spinehead_volume(ssv)
        except ValueError:
            # no spiness vertex labels for this cell (e.g. prediction
            # skipped); nothing to measure
            return {}
        ssv.save_attr_dict()
        return vols

    per_syn: dict = {}
    for vols in map_parallel(
        work, sorted(int(s) for s in ssd.ssv_ids), n_workers=n_workers,
        desc="spinehead_volume",
    ):
        # a synapse has one post-synaptic (spine) side; if both partner
        # cells yield a head volume keep the larger measurement
        for k, v in vols.items():
            per_syn[k] = max(v, per_syn.get(k, 0.0))

    out = np.array([per_syn.get(int(i), 0.0) for i in sd_syn.ids], np.float64)
    sd_syn.save_numpy_data("spinehead_vol", out)
    lg.info(
        "spinehead volumes computed for %d/%d synapses",
        int((out > 0).sum()), len(out),
    )
    return out


def run_matrix_export():
    """Connectivity matrix csv/npz (reference: exec_syns.py:24)."""
    lg = initialize_logging("exec_syns")
    from ..extraction.cs_processing import collect_properties_from_ssv_partners, export_matrix
    from ..proc.sd_proc import dataset_analysis
    from ..reps.segmentation import SegmentationDataset

    collect_properties_from_ssv_partners()
    path = export_matrix()
    lg.info("matrix exported to %s", path)
    return path
