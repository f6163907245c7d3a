"""Output-quality scoring of a pipeline-processed working dir against the
neuron world's construction ground truth.

One scorer per quality axis (synapse positions, celltype, compartments,
spinehead volumes, myelin); ``score_all`` bundles them. The quality suite
(tests/test_quality.py) asserts on the MEAN across held-out seeds; the
standalone driver (``python -m syconn_tpu.cnn.eval_quality``) prints the
per-seed table for training iterations.

Reference analog: the manually curated evaluation notebooks behind the
published SyConn metrics (syconn/docs; BASELINE.json "voxel- and
graph-level output parity"); here the synthetic world's construction IS
the ground truth, so scoring is exact and re-runnable.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Dict, Optional, Sequence

import numpy as np

__all__ = [
    "run_quality_pipeline",
    "ssv_to_cell",
    "score_synapses",
    "score_celltype",
    "score_celltype_views",
    "score_compartments",
    "score_spinehead",
    "score_myelin",
    "score_all",
]

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_quality_pipeline(
    wd: str, seed: int, shape: Sequence[int] = (160, 160, 80),
    n_cells: int = 8, timeout: float = 3600.0, platform: str = "cpu",
) -> None:
    """examples/start.py on a fresh neuron world with dense-model organelle
    prediction — the exact fixture the quality suite scores."""
    env = dict(os.environ)
    if platform:
        env["JAX_PLATFORMS"] = platform
        env["SYCONN_TPU_PLATFORM"] = platform
    env.pop("syconn_wd", None)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "start.py"),
         "--working_dir", wd,
         "--shape", *[str(s) for s in shape],
         "--n_cells", str(n_cells),
         "--seed", str(seed),
         "--world", "neuron",
         "--predict_organelles",
         # physical smoothing window scaled to the toy world's extent
         # (~1.6 µm across): the reference default 10000 nm assumes
         # mm-scale neurites and would majority-vote every sparse node
         # property (myelin stretches, axon/dendrite transitions) away
         "--kv", "compartments.dist_axoness_averaging=500",
         # spiness vote neighborhood scaled to the toy world's spine heads
         # (~10-30 mesh vertices each): the reference default k=50 dilutes
         # a head's vote with shaft vertices at this scale
         "--kv", "spines.semseg2coords_spines.k=20",
         "--overwrite"],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    if res.returncode != 0:
        raise RuntimeError(
            f"pipeline failed (seed {seed}):\nstdout:\n{res.stdout[-3000:]}\n"
            f"stderr:\n{res.stderr[-5000:]}")


def _activate(wd: str):
    from .. import global_params
    from ..handler.basics import clear_kd_cache

    clear_kd_cache()
    global_params.wd = wd
    global_params.config._parse_config()


def ssv_to_cell(ssv, gt) -> int:
    """Majority construction-cell of an assembled cell's supervoxels."""
    sv2cell = dict(zip(gt["sv_ids"].tolist(), gt["sv_cells"].tolist()))
    cells = [sv2cell.get(int(s), -1) for s in ssv.sv_ids]
    cells = [c for c in cells if c > 0]
    if not cells:
        return -1
    vals, cnt = np.unique(cells, return_counts=True)
    return int(vals[np.argmax(cnt)])


def score_synapses(wd: str, gt) -> Dict[str, float]:
    """Coverage matching of recovered syn_ssv positions vs constructed
    synapses within 15 aniso-weighted voxels (syn_ssv agglomerates
    neighboring GT junctions of one partner pair, so one prediction may
    cover several GT entries)."""
    from ..reps.segmentation import SegmentationDataset

    _activate(wd)
    sd = SegmentationDataset("syn_ssv", working_dir=wd)
    pred = sd.load_numpy_data("rep_coord").reshape(-1, 3).astype(np.float64)
    gt_c = gt["syn_coords"]
    out = {"n_gt": float(len(gt_c)), "n_pred": float(len(pred))}
    if not len(gt_c) or not len(pred):
        out["recall"] = out["precision"] = 0.0
        return out
    w = np.array([1.0, 1.0, 2.0])
    d = np.linalg.norm((pred[:, None, :] - gt_c[None]) * w, axis=-1)
    out["recall"] = float((d.min(axis=0) <= 15.0).mean())
    out["precision"] = float((d.min(axis=1) <= 15.0).mean())
    return out


def score_celltype(wd: str, gt) -> Dict[str, float]:
    """4-way celltype accuracy over assembled cells + the binary
    glia-vs-neuron decision astrocyte separation depends on."""
    from ..reps.super_segmentation import SuperSegmentationDataset

    _activate(wd)
    ssd = SuperSegmentationDataset(working_dir=wd)
    ct_gt = gt["celltype_gt"]
    hits, tot, glia_ok = 0, 0, 0
    for sid in ssd.ssv_ids:
        ssv = ssd.get_super_segmentation_object(int(sid))
        ssv.load_attr_dict()
        guess = int(ssv.attr_dict.get("celltype_cnn_e3", -1))
        cell = ssv_to_cell(ssv, gt)
        if cell <= 0:
            continue
        hits += int(guess == int(ct_gt[cell]))
        glia_ok += int((guess == 3) == (int(ct_gt[cell]) == 3))
        tot += 1
    return {
        "acc": hits / max(tot, 1),
        "glia_acc": glia_ok / max(tot, 1),
        "n_cells": float(tot),
    }


def score_celltype_views(wd: str, gt) -> Dict[str, float]:
    """Celltype accuracy of the MULTI-VIEW path (render_sampled_sso ->
    MultiViewCMN, reference flagship: super_segmentation_helper.py:1670
    ``celltype_of_sso_nocache``), independent of whatever path the pipeline
    ran. Requires trained view weights (views_infer refuses seed init);
    returns n_cells=0 when the view model is not packaged/trained."""
    from ..inference.views_infer import celltype_of_sso_views
    from ..reps.super_segmentation import SuperSegmentationDataset

    _activate(wd)
    ssd = SuperSegmentationDataset(working_dir=wd)
    ct_gt = gt["celltype_gt"]
    hits, tot, glia_ok = 0, 0, 0
    for sid in ssd.ssv_ids:
        ssv = ssd.get_super_segmentation_object(int(sid))
        cell = ssv_to_cell(ssv, gt)
        if cell <= 0:
            continue
        try:
            guess = celltype_of_sso_views(
                ssv, pred_key="celltype_views_score", save=False)
        except (FileNotFoundError, ValueError):
            return {"acc": float("nan"), "glia_acc": float("nan"),
                    "n_cells": 0.0}
        if guess is None:
            continue
        hits += int(int(guess) == int(ct_gt[cell]))
        glia_ok += int((int(guess) == 3) == (int(ct_gt[cell]) == 3))
        tot += 1
    return {
        "acc": hits / max(tot, 1),
        "glia_acc": glia_ok / max(tot, 1),
        "n_cells": float(tot),
    }


def score_compartments(wd: str, gt) -> Dict[str, float]:
    """Skeleton-node axoness labels vs the compart volume; scores the
    window-averaged key downstream consumers read (reference:
    average_node_axoness_views)."""
    from ..reps.super_segmentation import SuperSegmentationDataset

    _activate(wd)
    ssd = SuperSegmentationDataset(working_dir=wd)
    comp_vol = gt["compart"]
    shape = np.asarray(comp_vol.shape)
    correct, n = 0, 0
    for sid in ssd.ssv_ids:
        ssv = ssd.get_super_segmentation_object(int(sid))
        if not ssv.load_skeleton() or "axoness" not in ssv.skeleton:
            continue
        sk = ssv.skeleton
        nodes = np.round(np.asarray(sk["nodes"], np.float64)).astype(int)
        nodes = np.clip(nodes, 0, shape - 1)
        lab_gt = comp_vol[nodes[:, 0], nodes[:, 1], nodes[:, 2]]
        key = "axoness_avg10000" if "axoness_avg10000" in sk else "axoness"
        lab_pred = np.asarray(sk[key]).astype(int)
        valid = lab_gt != 255
        correct += int((lab_pred[valid] == lab_gt[valid]).sum())
        n += int(valid.sum())
    return {"acc": correct / max(n, 1), "n_nodes": float(n)}


def score_spinehead(wd: str, gt) -> Dict[str, float]:
    """Spinehead volumes recovered by the pipeline vs GT head volumes.
    ``n_vols`` counts synapses that got a positive volume; ``med_ratio``
    is predicted/GT median (µm³), NaN when nothing fired."""
    from ..reps.segmentation import SegmentationDataset

    _activate(wd)
    out = {"n_spine_gt": float(np.count_nonzero(gt["syn_on_spine"]))}
    sd = SegmentationDataset("syn_ssv", working_dir=wd)
    cached = sd.load_numpy_data("spinehead_vol")
    vols = [float(v) for v in np.atleast_1d(cached).ravel()
            if np.isfinite(v) and v > 0] if cached is not None else []
    out["n_vols"] = float(len(vols))
    scale = np.array([10.0, 10.0, 20.0])
    gt_vols_um3 = (gt["syn_head_vol"][gt["syn_on_spine"]]
                   * float(np.prod(scale)) / 1e9)
    if vols and len(gt_vols_um3):
        out["med_ratio"] = float(np.median(vols) / np.median(gt_vols_um3))
    else:
        out["med_ratio"] = float("nan")
    return out


def score_myelin(wd: str, gt) -> Dict[str, float]:
    """Myelin recall on GT-sheath skeleton nodes + axon-vs-dendrite
    enrichment of the myelin flags."""
    from scipy import ndimage as ndi

    from ..reps.super_segmentation import SuperSegmentationDataset

    _activate(wd)
    out: Dict[str, float] = {}
    if not (gt["myelin"] > 0).any():
        out["recall"] = float("nan")
        return out
    ssd = SuperSegmentationDataset(working_dir=wd)
    comp_vol = gt["compart"]
    shape = np.asarray(comp_vol.shape)
    near_my = ndi.binary_dilation(gt["myelin"] > 0, iterations=3)
    my_pred_on_gt, gt_my_nodes = 0, 0
    my_ax, ax_nodes, my_de, de_nodes = 0, 0, 0, 0
    for sid in ssd.ssv_ids:
        ssv = ssd.get_super_segmentation_object(int(sid))
        if not ssv.load_skeleton() or "myelin" not in ssv.skeleton:
            continue
        sk = ssv.skeleton
        nodes = np.round(np.asarray(sk["nodes"], np.float64)).astype(int)
        nodes = np.clip(nodes, 0, shape - 1)
        key = "myelin_avg10000" if "myelin_avg10000" in sk else "myelin"
        my = np.asarray(sk[key]).astype(float) > 0
        lab_gt = comp_vol[nodes[:, 0], nodes[:, 1], nodes[:, 2]]
        on_gt_my = near_my[nodes[:, 0], nodes[:, 1], nodes[:, 2]]
        gt_my_nodes += int(on_gt_my.sum())
        my_pred_on_gt += int((my & on_gt_my).sum())
        ax, de = lab_gt == 1, lab_gt == 0
        ax_nodes += int(ax.sum())
        de_nodes += int(de.sum())
        my_ax += int((my & ax).sum())
        my_de += int((my & de).sum())
    out["recall"] = my_pred_on_gt / gt_my_nodes if gt_my_nodes else float("nan")
    out["axon_rate"] = my_ax / max(ax_nodes, 1)
    out["dend_rate"] = my_de / max(de_nodes, 1)
    return out


def score_all(wd: str, gt=None) -> Dict[str, Dict[str, float]]:
    if gt is None:
        gt = np.load(os.path.join(wd, "neuron_gt.npz"))
    return {
        "synapses": score_synapses(wd, gt),
        "celltype": score_celltype(wd, gt),
        "celltype_views": score_celltype_views(wd, gt),
        "compartments": score_compartments(wd, gt),
        "spinehead": score_spinehead(wd, gt),
        "myelin": score_myelin(wd, gt),
    }
