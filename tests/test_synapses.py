import numpy as np
import pytest

from syconn_tpu.io.chunked import ChunkedVolume


@pytest.fixture()
def syn_world(working_dir):
    """Two touching cells with an sj patch at their interface."""
    from syconn_tpu import global_params
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.handler.config import generate_default_conf
    from syconn_tpu.io.graph import save_svgraph

    clear_kd_cache()
    generate_default_conf(
        working_dir,
        scaling=(10, 10, 20),
        key_value_pairs=[
            ("min_cc_size_ssv", 200),
            ("syntype_avail", True),
            ("cell_objects", {"min_obj_vx": {"syn_ssv": 10, "cs": 10, "syn": 10}}),
        ],
        force_overwrite=True,
    )
    from syconn_tpu import global_params as gp

    gp.config._parse_config()
    cfg = gp.config

    sh = (96, 64, 48)
    seg = np.zeros(sh, np.uint64)
    seg[4:46, 4:60, 4:44] = 7   # cell A (sv 7)
    seg[50:92, 4:60, 4:44] = 9  # cell B (sv 9)  -> 4-voxel gap at x in [46,50)
    sj = np.zeros(sh, np.uint8)
    sj[42:54, 20:40, 10:30] = 255  # junction patch spanning the gap
    sym = np.zeros(sh, np.uint8)
    asym = np.zeros(sh, np.uint8)
    asym[42:54, 20:40, 10:30] = 255  # purely asymmetric synapse

    kd = ChunkedVolume.create(cfg.kd_seg_path, scale=(10, 10, 20), boundary=sh, chunk_shape=(64, 64, 64))
    kd.save_seg(seg)
    for name, data in [("sj", sj), ("sym", sym), ("asym", asym)]:
        cv = ChunkedVolume.create(
            getattr(cfg, f"kd_{name}_path"), scale=(10, 10, 20), boundary=sh, chunk_shape=(64, 64, 64)
        )
        cv.save_raw(data)
    save_svgraph(np.zeros((0, 2), np.uint64), cfg.init_svgraph_path)
    return dict(seg=seg, sj=sj)


def test_syn_generation_end_to_end(syn_world, working_dir):
    from syconn_tpu import global_params
    from syconn_tpu.exec.exec_init import (
        init_cell_subcell_sds,
        run_create_neuron_ssd,
        run_create_rag,
    )
    from syconn_tpu.exec.exec_syns import run_matrix_export, run_syn_generation
    from syconn_tpu.ops.contacts import cs_pair_unpack
    from syconn_tpu.reps.segmentation import SegmentationDataset

    cfg = global_params.config
    # build SDs + SSD (no organelle prob maps -> restrict organelle list)
    cfg.entries["process_cell_organelles"] = []
    init_cell_subcell_sds(chunk_size=(64, 64, 64), overwrite=True)
    run_create_rag()
    ssd = run_create_neuron_ssd()
    assert len(ssd.ssv_ids) == 2

    stats = run_syn_generation(chunk_size=(64, 64, 64))
    assert stats["n_cs"] >= 1
    assert stats["n_syn"] >= 1
    assert stats["n_syn_ssv"] >= 1

    # cs partner decoding
    sd_cs = SegmentationDataset("cs", working_dir=working_dir)
    lo, hi = cs_pair_unpack(sd_cs.ids)
    assert {(int(a), int(b)) for a, b in zip(lo, hi)} == {(7, 9)}

    # syn fragments carry type ratios: asym-only world
    sd_syn = SegmentationDataset("syn", working_dir=working_dir)
    asym_prop = sd_syn.load_numpy_data("asym_prop")
    assert np.all(asym_prop > 0.9)
    assert np.all(sd_syn.load_numpy_data("sym_prop") < 0.1)

    # syn_ssv: one synapse between the two cells, excitatory sign (+1)
    sd_synssv = SegmentationDataset("syn_ssv", working_dir=working_dir)
    assert len(sd_synssv.ids) == 1
    partners = sd_synssv.load_numpy_data("neuron_partners")[0]
    assert set(int(p) for p in partners) == set(int(i) for i in ssd.ssv_ids)
    assert sd_synssv.load_numpy_data("syn_sign")[0] == 1
    # synapse sits in the gap region
    rep = sd_synssv.rep_coords[0]
    assert 40 <= rep[0] <= 56

    # mesh + voxels stored
    so = sd_synssv.get_segmentation_object(int(sd_synssv.ids[0]))
    so.load_attr_dict()
    assert so.attr_dict["asym_prop"] > 0.9

    # cells know their synapses
    ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    ssv.load_attr_dict()
    assert len(ssv.attr_dict["syn_ssv"]) == 1

    # matrix export
    csv_path = run_matrix_export()
    import os

    assert os.path.isfile(csv_path)
    with open(csv_path) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 2  # header + 1 synapse
    assert "partner_a" in lines[0]


def test_sym_synapse_sign(syn_world, working_dir):
    """Symmetric-dominated synapse must get sign -1."""
    from syconn_tpu import global_params
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.exec.exec_init import (
        init_cell_subcell_sds,
        run_create_neuron_ssd,
        run_create_rag,
    )
    from syconn_tpu.exec.exec_syns import run_syn_generation
    from syconn_tpu.reps.segmentation import SegmentationDataset

    cfg = global_params.config
    # overwrite sym/asym: make it symmetric
    sh = syn_world["seg"].shape
    sym = np.zeros(sh, np.uint8)
    sym[42:54, 20:40, 10:30] = 255
    cv = ChunkedVolume.open(cfg.kd_sym_path)
    cv.save_raw(sym)
    cv2 = ChunkedVolume.open(cfg.kd_asym_path)
    cv2.save_raw(np.zeros(sh, np.uint8))
    clear_kd_cache()

    cfg.entries["process_cell_organelles"] = []
    init_cell_subcell_sds(chunk_size=(64, 64, 64), overwrite=True)
    run_create_rag()
    run_create_neuron_ssd()
    run_syn_generation(chunk_size=(64, 64, 64))
    sd_synssv = SegmentationDataset("syn_ssv", working_dir=working_dir)
    assert sd_synssv.load_numpy_data("syn_sign")[0] == -1
