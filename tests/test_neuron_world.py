"""Neuron-morphology synthetic world: construction-consistency checks.

The generator (utils/testdata_neuro.py) is the ground-truth source for the
quality-parity tests (celltype / compartment / spine / myelin / synapse
scoring), so its internal consistency is itself test-worthy.
"""

import numpy as np
import pytest
from scipy import ndimage

from syconn_tpu.utils.testdata_neuro import (
    AXON,
    DENDRITE,
    SOMA,
    SP_HEAD,
    generate_neuron_world,
)

SHAPE = (128, 128, 64)


@pytest.fixture(scope="module")
def world():
    return generate_neuron_world(shape=SHAPE, n_cells=6, seed=3)


def test_schema_and_determinism(world):
    for k in ["raw", "seg", "cells", "mi", "vc", "sj", "sym", "asym",
              "er", "golgi", "rag", "sv2cell", "celltype_gt", "compart",
              "spiness", "myelin", "syn_gt", "cells_meta"]:
        assert k in world, k
    w2 = generate_neuron_world(shape=SHAPE, n_cells=6, seed=3)
    assert np.array_equal(world["cells"], w2["cells"])
    assert np.array_equal(world["raw"], w2["raw"])
    assert len(world["syn_gt"]) == len(w2["syn_gt"])


def test_compartments_cover_cells(world):
    cells = world["cells"]
    comp = world["compart"]
    # every cell voxel is labeled, background is 255
    assert set(np.unique(comp[cells > 0])) <= {DENDRITE, AXON, SOMA}
    assert (comp[cells == 0] == 255).all()
    # all three compartments occur, soma is the biggest single label blob
    counts = {int(v): int(c) for v, c in zip(*np.unique(comp[cells > 0],
                                                        return_counts=True))}
    assert counts.get(DENDRITE, 0) > 0
    assert counts.get(AXON, 0) > 0
    assert counts.get(SOMA, 0) > 0


def test_celltype_morphology(world):
    ct = world["celltype_gt"]
    cells = world["cells"]
    comp = world["compart"]
    spin = world["spiness"]
    for cid in range(1, len(ct)):
        sel = cells == cid
        if not sel.any():
            continue
        has_axon = (comp[sel] == AXON).any()
        if ct[cid] == 3:  # glia never grow an axon
            assert not has_axon
        has_heads = (spin[sel] == SP_HEAD).any()
        if ct[cid] == 1:  # inhibitory cells are aspiny
            # heads can only appear via an incoming synapse bulge mislabel;
            # the generator never paints them for IN
            meta = world["cells_meta"][cid]
            assert len(meta["spines"]) == 0
        if ct[cid] in (0, 2) and world["cells_meta"][cid]["spines"]:
            assert has_heads


def test_myelin_wraps_axons_only(world):
    my = world["myelin"] > 0
    if not my.any():
        pytest.skip("seed produced no myelinated axon")
    # myelin voxels sit within a few voxels of axon-labeled voxels
    ax = world["compart"] == AXON
    near_axon = ndimage.binary_dilation(ax, iterations=3)
    assert (my & ~near_axon).mean() < 0.05


def test_synapse_gt_consistent(world):
    sj = world["sj"] > 0
    ct = world["celltype_gt"]
    assert len(world["syn_gt"]) >= 5
    near_sj = ndimage.binary_dilation(sj, iterations=2)
    hits = 0
    for s in world["syn_gt"]:
        pre, post = s["pre_cell"], s["post_cell"]
        assert pre != post
        assert ct[pre] != 3 and ct[post] != 3  # glia make no synapses
        expected = "asym" if ct[pre] in (0, 2) else "sym"
        assert s["sign"] == expected
        c = np.clip(np.round(s["coord_vx"]).astype(int), 0,
                    np.asarray(SHAPE) - 1)
        hits += bool(near_sj[tuple(c)])
    # sj pruning to the interface can drop a few, most must survive
    assert hits / len(world["syn_gt"]) > 0.5


def test_sym_asym_split(world):
    sym = world["sym"] > 0
    asym = world["asym"] > 0
    assert not (sym & asym).any()
    sj = world["sj"] > 0
    assert ((sym | asym) == sj).all()


def test_seg_respects_cells(world):
    seg = world["seg"]
    cells = world["cells"]
    sv2cell = world["sv2cell"]
    assert (seg > 0).sum() == (cells > 0).sum()
    for sv, cid in sv2cell.items():
        sel = seg == sv
        assert (cells[sel] == cid).all()
    # rag edges join supervoxels of the same cell
    for a, b in world["rag"]:
        assert sv2cell[int(a)] == sv2cell[int(b)]


def test_write_neuron_world(tmp_path):
    from syconn_tpu.utils.testdata_neuro import write_neuron_world

    w = write_neuron_world(str(tmp_path), shape=(64, 64, 32), n_cells=3, seed=5)
    import os

    for name in ["raw", "seg", "mi", "vc", "sj", "sym", "asym"]:
        assert os.path.isfile(tmp_path / f"{name}.h5")
    assert os.path.isfile(tmp_path / "neuron_rag.bz2")
    gt = np.load(tmp_path / "neuron_gt.npz")
    assert gt["compart"].shape == (64, 64, 32)
    assert len(gt["syn_pre"]) == len(w["syn_gt"])
