"""Output-quality parity: the pipeline's predictions scored against the
neuron world's construction ground truth (VERDICT r1 item 5; r2 items 2+7).

Runs examples/start.py on THREE held-out neuron worlds (seeds never used
for training) with ``--predict_organelles`` so the organelle maps come from
the packaged dense model (inference on raw, not copied GT), then scores,
asserting on the MEAN across seeds and printing the per-seed spread:

- synapse detection: recovered syn_ssv positions vs constructed synapses
- celltype: per-cell accuracy vs celltype_gt (reference bar:
  BASELINE.json "voxel- and graph-level output parity")
- compartments: skeleton-node axoness labels vs the compart volume
- spiness/spinehead: head-labeled nodes and spinehead volumes on spine
  synapses (must fire — no skip)
- myelin: sheath recall at skeleton nodes + axon enrichment

Scoring lives in ``syconn_tpu/utils/quality_metrics.py`` (shared with the
training-iteration driver ``python -m syconn_tpu.cnn.eval_quality``).

Skipped when the packaged pretrained weights (models/pretrained/) are not
present — quality is only meaningful with trained models.
"""

import os

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
SEEDS = (777, 1901, 2718)  # never used for training (cnn/train_pretrained.py)


@pytest.fixture(scope="module")
def quality_runs(tmp_path_factory):
    """One pipeline-processed working dir per held-out seed, scored."""
    from syconn_tpu.utils.quality_metrics import (
        run_quality_pipeline,
        score_all,
    )

    runs = {}
    for seed in SEEDS:
        wd = str(tmp_path_factory.mktemp(f"quality{seed}") / "wd")
        run_quality_pipeline(wd, seed, shape=SHAPE, n_cells=N_CELLS)
        gt = np.load(os.path.join(wd, "neuron_gt.npz"))
        runs[seed] = score_all(wd, gt)
    yield runs


def _mean(runs, group, key):
    vals = {s: runs[s][group][key] for s in runs}
    finite = [v for v in vals.values() if np.isfinite(v)]
    print(f"{group}.{key} per seed: "
          + ", ".join(f"{s}={v:.3f}" for s, v in vals.items()))
    return float(np.mean(finite)) if finite else float("nan")


def _min(runs, group, key):
    finite = [runs[s][group][key] for s in runs
              if np.isfinite(runs[s][group][key])]
    return float(np.min(finite)) if finite else float("nan")


def test_synapse_positions(quality_runs):
    for s, r in quality_runs.items():
        assert r["synapses"]["n_gt"] >= 5, f"seed {s}: too few GT synapses"
        assert r["synapses"]["n_pred"] >= 1, f"seed {s}: no synapses recovered"
    recall = _mean(quality_runs, "synapses", "recall")
    precision = _mean(quality_runs, "synapses", "precision")
    assert recall >= 0.6, f"mean synapse recall {recall:.2f}"
    assert precision >= 0.6, f"mean synapse precision {precision:.2f}"


def test_celltype_accuracy(quality_runs):
    """4-way celltype and the binary glia-vs-neuron decision (astrocyte
    separation depends on it), averaged over 3 held-out worlds (~24
    cells)."""
    for s, r in quality_runs.items():
        assert r["celltype"]["n_cells"] >= 3, f"seed {s}: too few scored cells"
    acc = _mean(quality_runs, "celltype", "acc")
    glia = _mean(quality_runs, "celltype", "glia_acc")
    assert acc >= 0.75, f"mean celltype accuracy {acc:.2f}"
    assert glia >= 0.85, f"mean glia-vs-neuron accuracy {glia:.2f}"
    # per-seed floor (VERDICT r4 #4): the mean must not be carried by one
    # lucky world — every held-out seed has to clear 0.6 on its own
    mn = _min(quality_runs, "celltype", "acc")
    assert mn >= 0.6, f"worst-seed celltype accuracy {mn:.2f}"


def test_celltype_views_path(quality_runs):
    """The multi-view CMN path (splat renderer -> MultiViewCMN, reference
    flagship celltype_of_sso_nocache) scored independently of the pipeline's
    configured path. Skips when no trained view weights are packaged — the
    documented default is point-primary (views_infer refuses seed init)."""
    if all(r["celltype_views"]["n_cells"] == 0 for r in quality_runs.values()):
        pytest.skip("no trained view-CMN weights packaged")
    acc = _mean(quality_runs, "celltype_views", "acc")
    glia = _mean(quality_runs, "celltype_views", "glia_acc")
    assert acc >= 0.6, f"mean view-path celltype accuracy {acc:.2f}"
    assert glia >= 0.75, f"mean view-path glia accuracy {glia:.2f}"


def test_compartment_labels(quality_runs):
    for s, r in quality_runs.items():
        assert r["compartments"]["n_nodes"] >= 50, (
            f"seed {s}: too few labeled skeleton nodes")
    acc = _mean(quality_runs, "compartments", "acc")
    assert acc >= 0.70, f"mean compartment node accuracy {acc:.2f} (chance 1/3)"


def test_spinehead_volumes(quality_runs):
    """The spinehead-volume pipeline must FIRE on spine synapses (no skip:
    VERDICT r2 weak #3) and land within 8x of the GT head volumes in
    µm³ (the pipeline stores µm³; GT records voxels). The 8x bound (was
    30x) reflects the inscribed-ball measurement (r4): measured per-seed
    medians 0.93-3.9x. Firing is asserted per-suite (>=4 volumes across
    the worlds), not per-synapse: the toy worlds' spine heads are at the
    resolution floor (radius 2-3 voxels) and the spiness point model
    labels only the cleanest of them head at the synapse coordinate."""
    with_spines = [s for s, r in quality_runs.items()
                   if r["spinehead"]["n_spine_gt"] > 0]
    assert with_spines, "no held-out world built spine synapses"
    fired = [s for s in with_spines if quality_runs[s]["spinehead"]["n_vols"] > 0]
    print("spinehead fired on seeds:", fired, "of", with_spines)
    # the spiness model must label head synapses in most worlds
    assert len(fired) * 2 >= len(with_spines), (
        f"spinehead volumes only on {fired} of {with_spines}")
    n_total = sum(quality_runs[s]["spinehead"]["n_vols"] for s in fired)
    assert n_total >= 4, f"only {n_total} spinehead volumes across the suite"
    for s in fired:
        ratio = quality_runs[s]["spinehead"]["med_ratio"]
        assert 1 / 8 < ratio < 8, f"seed {s}: med pred/GT ratio {ratio:.2f}"


def test_myelin_on_axons(quality_runs):
    with_my = [s for s, r in quality_runs.items()
               if np.isfinite(r["myelin"]["recall"])]
    assert with_my, "no held-out world built myelin"
    my_runs = {s: quality_runs[s] for s in with_my}
    recall = _mean(my_runs, "myelin", "recall")
    assert recall >= 0.5, f"mean myelin node recall {recall:.2f}"
    # per-seed floor (VERDICT r4 #4): seed 1901 measured 0.375 in r4 while
    # the mean cleared the gate — every seed must recall >= 0.5 alone
    mn = _min(my_runs, "myelin", "recall")
    assert mn >= 0.5, f"worst-seed myelin recall {mn:.2f}"
    ax = _mean({s: quality_runs[s] for s in with_my}, "myelin", "axon_rate")
    de = _mean({s: quality_runs[s] for s in with_my}, "myelin", "dend_rate")
    assert ax >= de, f"myelin not axon-enriched (axon {ax:.3f} vs dend {de:.3f})"
