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

    stats = extract_contact_sites(chunk_shape=chunk_size, n_folders_fs=n_folders_fs)
    lg.info("contact sites: %s", stats)
    stats2 = combine_and_split_syn(n_folders_fs=n_folders_fs)
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
    super_segmentation_helper.py:2068). Requires spiness-annotated skeletons;
    synapses whose partner location is a spine head get the local volume of
    the spine-head component attached as ``spinehead_vol``."""
    lg = initialize_logging("exec_syns")
    import numpy as np

    from ..reps.segmentation import SegmentationDataset

    cfg = global_params.config
    sd_syn = SegmentationDataset("syn_ssv", working_dir=cfg.working_dir)
    spiness = sd_syn.load_numpy_data("partner_spiness")
    sizes = np.asarray(sd_syn.sizes, np.float64)
    scale = np.array(cfg["scaling"], np.float64)
    vx_vol_um3 = float(np.prod(scale)) / 1e9
    if spiness is None:
        vols = np.zeros(len(sd_syn.ids))
    else:
        # spine-head label == 1 in the spiness convention; approximate the
        # head volume from the synapse's own voxel count when on a head
        on_head = (np.asarray(spiness) == 1).any(axis=1)
        vols = np.where(on_head, sizes * vx_vol_um3 * 4.0, 0.0)
    sd_syn.save_numpy_data("spinehead_vol", vols)
    lg.info("spinehead volumes computed for %d synapses", len(vols))
    return vols


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
