"""Output-quality parity: the pipeline's predictions scored against the
neuron world's construction ground truth (VERDICT r1 item 5).

Runs examples/start.py on a neuron-morphology world with
``--predict_organelles`` so the organelle maps come from the packaged
dense model (inference on raw, not copied GT), then scores:

- synapse detection: recovered syn_ssv positions vs constructed synapses
- celltype: per-cell accuracy vs celltype_gt (reference bar:
  BASELINE.json "voxel- and graph-level output parity")
- compartments: skeleton-node axoness labels vs the compart volume
- spiness/spinehead: head-labeled nodes and spinehead volumes on spine
  synapses

Skipped when the packaged pretrained weights (models/pretrained/) are not
present — quality is only meaningful with trained models.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from syconn_tpu.models.io import model_exists, packaged_model_path  # noqa: E402

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not (model_exists(packaged_model_path("organelles"))
             and model_exists(packaged_model_path("celltype_pts"))),
        reason="packaged pretrained weights not present",
    ),
]

SHAPE = (160, 160, 80)
N_CELLS = 8
SEED = 777  # never used for training


@pytest.fixture(scope="module")
def quality_wd(tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("quality") / "wd")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SYCONN_TPU_PLATFORM"] = "cpu"
    env.pop("syconn_wd", None)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "start.py"),
         "--working_dir", wd,
         "--shape", *[str(s) for s in SHAPE],
         "--n_cells", str(N_CELLS),
         "--seed", str(SEED),
         "--world", "neuron",
         "--predict_organelles",
         "--overwrite"],
        capture_output=True, text=True, timeout=3600, env=env, cwd=REPO,
    )
    assert res.returncode == 0, (
        f"stdout:\n{res.stdout[-3000:]}\nstderr:\n{res.stderr[-5000:]}")
    gt = np.load(os.path.join(wd, "neuron_gt.npz"))

    from syconn_tpu import global_params
    from syconn_tpu.handler.basics import clear_kd_cache

    clear_kd_cache()
    global_params.wd = wd
    global_params.config._parse_config()
    yield wd, gt


def _ssv_to_cell(ssv, gt):
    """Majority construction-cell of an assembled cell's supervoxels."""
    sv2cell = dict(zip(gt["sv_ids"].tolist(), gt["sv_cells"].tolist()))
    cells = [sv2cell.get(int(s), -1) for s in ssv.sv_ids]
    cells = [c for c in cells if c > 0]
    if not cells:
        return -1
    vals, cnt = np.unique(cells, return_counts=True)
    return int(vals[np.argmax(cnt)])


def test_synapse_positions(quality_wd):
    wd, gt = quality_wd
    from syconn_tpu.reps.segmentation import SegmentationDataset

    sd = SegmentationDataset("syn_ssv", working_dir=wd)
    pred = sd.load_numpy_data("rep_coord").reshape(-1, 3).astype(np.float64)
    gt_c = gt["syn_coords"]
    assert len(gt_c) >= 5, "world built too few synapses for scoring"
    assert len(pred) >= 1, "pipeline recovered no synapses"
    # coverage matching within 15 voxels (aniso-weighted): syn_ssv
    # agglomerates neighboring GT junctions of the same partner pair, so a
    # single prediction may legitimately cover several GT entries
    w = np.array([1.0, 1.0, 2.0])
    d = np.linalg.norm((pred[:, None, :] - gt_c[None]) * w, axis=-1)
    recall = float((d.min(axis=0) <= 15.0).mean())
    precision = float((d.min(axis=1) <= 15.0).mean())
    assert recall >= 0.6, f"synapse recall {recall:.2f} ({len(gt_c)} GT)"
    assert precision >= 0.6, f"synapse precision {precision:.2f} ({len(pred)} predicted)"


def test_celltype_accuracy(quality_wd):
    wd, gt = quality_wd
    from syconn_tpu.reps.super_segmentation import SuperSegmentationDataset

    ssd = SuperSegmentationDataset(working_dir=wd)
    ct_gt = gt["celltype_gt"]
    hits, tot = 0, 0
    for sid in ssd.ssv_ids:
        ssv = ssd.get_super_segmentation_object(int(sid))
        ssv.load_attr_dict()
        guess = ssv.attr_dict.get("celltype_cnn_e3", -1)
        cell = _ssv_to_cell(ssv, gt)
        if cell <= 0:
            continue
        hits += int(int(guess) == int(ct_gt[cell]))
        tot += 1
    assert tot >= 3
    acc = hits / tot
    assert acc >= 0.6, f"celltype accuracy {acc:.2f} over {tot} cells"


def test_compartment_labels(quality_wd):
    wd, gt = quality_wd
    from syconn_tpu.reps.super_segmentation import SuperSegmentationDataset

    ssd = SuperSegmentationDataset(working_dir=wd)
    comp_vol = gt["compart"]
    correct, n = 0, 0
    for sid in ssd.ssv_ids:
        ssv = ssd.get_super_segmentation_object(int(sid))
        if not ssv.load_skeleton() or "axoness" not in ssv.skeleton:
            continue
        nodes = np.round(np.asarray(ssv.skeleton["nodes"], np.float64)).astype(int)
        nodes = np.clip(nodes, 0, np.asarray(SHAPE) - 1)
        lab_gt = comp_vol[nodes[:, 0], nodes[:, 1], nodes[:, 2]]
        lab_pred = np.asarray(ssv.skeleton["axoness"]).astype(int)
        valid = lab_gt != 255
        correct += int((lab_pred[valid] == lab_gt[valid]).sum())
        n += int(valid.sum())
    assert n >= 50, f"too few labeled skeleton nodes ({n})"
    acc = correct / n
    assert acc >= 0.55, f"compartment node accuracy {acc:.2f} over {n} nodes"


def test_spinehead_volumes(quality_wd):
    wd, gt = quality_wd
    from syconn_tpu.reps.segmentation import SegmentationDataset

    if not gt["syn_on_spine"].any():
        pytest.skip("world built no spine synapses")
    sd = SegmentationDataset("syn_ssv", working_dir=wd)
    vols = []
    for sid in sd.ids:
        so = sd.get_segmentation_object(int(sid))
        so.load_attr_dict()
        v = so.attr_dict.get("spinehead_vol", 0.0)
        if v and v > 0:
            vols.append(float(v))
    # at least one recovered synapse should carry a real spinehead volume
    assert len(vols) >= 1, "no spinehead volumes computed"
    # sanity on magnitude: within 30x of the GT head volumes (nm^3 scale)
    scale = np.array([10.0, 10.0, 20.0])
    gt_vols_nm = gt["syn_head_vol"][gt["syn_on_spine"]] * float(np.prod(scale))
    if len(gt_vols_nm):
        ref = float(np.median(gt_vols_nm))
        med = float(np.median(vols))
        assert ref / 30 < med < ref * 30, (med, ref)


def test_myelin_on_axons(quality_wd):
    wd, gt = quality_wd
    from syconn_tpu.reps.super_segmentation import SuperSegmentationDataset

    if not (gt["myelin"] > 0).any():
        pytest.skip("world built no myelin")
    ssd = SuperSegmentationDataset(working_dir=wd)
    my_nodes, my_on_axon = 0, 0
    comp_vol = gt["compart"]
    for sid in ssd.ssv_ids:
        ssv = ssd.get_super_segmentation_object(int(sid))
        if not ssv.load_skeleton() or "myelin" not in ssv.skeleton:
            continue
        nodes = np.round(np.asarray(ssv.skeleton["nodes"], np.float64)).astype(int)
        nodes = np.clip(nodes, 0, np.asarray(SHAPE) - 1)
        my = np.asarray(ssv.skeleton["myelin"]).astype(int) > 0
        lab_gt = comp_vol[nodes[:, 0], nodes[:, 1], nodes[:, 2]]
        my_nodes += int(my.sum())
        my_on_axon += int((my & (lab_gt == 1)).sum())
    if my_nodes == 0:
        pytest.skip("no myelin predicted on skeletons (model thresholds)")
    # myelin-labeled nodes should predominantly sit on axons
    assert my_on_axon / my_nodes >= 0.5
