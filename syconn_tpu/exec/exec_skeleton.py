"""Skeleton generation orchestration — pipeline step 5.

Reference parity: syconn/exec/exec_skeleton.py — ``run_skeleton_generation``
:27, ``run_kimimaro_skeletonization`` :115, ``map_myelin_global`` :82.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from .. import global_params
from ..handler.config import initialize_logging

__all__ = ["run_skeleton_generation", "run_kimimaro_skeletonization", "map_myelin_global"]


def run_skeleton_generation(
    map_myelin: Optional[bool] = None,
    cube_size: Optional[Sequence[int]] = None,
    ncores_skelgen: Optional[int] = None,
):
    """TEASAR skeletons for all cells + optional myelin mapping
    (reference: exec_skeleton.py:27)."""
    lg = initialize_logging("exec_skeleton")
    cfg = global_params.config
    if map_myelin is None:
        map_myelin = os.path.isdir(cfg.kd_myelin_path)
    n = run_kimimaro_skeletonization(cube_size=cube_size, n_workers=ncores_skelgen)
    lg.info("skeletons for %d cells", n)
    if map_myelin:
        map_myelin_global()
    return n


def run_kimimaro_skeletonization(
    cube_size: Optional[Sequence[int]] = None, n_workers: Optional[int] = None
) -> int:
    """(reference: exec_skeleton.py:115; the TEASAR engine lives in
    syconn_tpu/skeleton/teasar.py)"""
    from ..proc.skeleton import generate_skeletons

    return generate_skeletons(cube_size=cube_size, n_workers=n_workers)


def map_myelin_global(n_workers: Optional[int] = None):
    """Probe the myelin volume at every skeleton node and smooth by
    sliding-window majority vote (reference: exec_skeleton.py:82)."""
    lg = initialize_logging("exec_skeleton")
    cfg = global_params.config
    from ..parallel.executor import map_parallel
    from ..proc.skeleton import majorityvote_skeleton_property, map_myelin2coords
    from ..reps.super_segmentation import SuperSegmentationDataset

    ssd = SuperSegmentationDataset(working_dir=cfg.working_dir)
    window = float(cfg["compartments"]["dist_axoness_averaging"])
    scale = np.array(cfg["scaling"], np.float64)

    def work(ssv_id):
        ssv = ssd.get_super_segmentation_object(int(ssv_id))
        if not ssv.load_skeleton():
            return 0
        sk = ssv.skeleton
        myelin = map_myelin2coords(np.asarray(sk["nodes"], np.int64))
        sk["myelin"] = myelin
        sk["myelin_avg10000"] = majorityvote_skeleton_property(sk, "myelin", window, scale)
        ssv.skeleton = sk
        ssv.save_skeleton()
        return 1

    done = sum(map_parallel(work, list(ssd.ssv_ids), n_workers=n_workers, desc="map_myelin"))
    lg.info("myelin mapped for %d cells", done)
    return done
