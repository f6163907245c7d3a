import numpy as np
import pytest

from syconn_tpu.io.chunked import ChunkedVolume


@pytest.fixture()
def toy_pipeline_wd(working_dir):
    """Toy world loaded into chunked volumes + SDs + RAG on disk."""
    from syconn_tpu import global_params
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.handler.config import generate_default_conf
    from syconn_tpu.io.graph import save_svgraph
    from syconn_tpu.utils.testdata import generate_toy_world

    clear_kd_cache()
    # toy-scale config: small volume -> small prune threshold, mild morphology
    generate_default_conf(
        working_dir,
        scaling=(10, 10, 20),
        key_value_pairs=[
            ("min_cc_size_ssv", 200),
            (
                "cell_objects",
                {
                    "extract_morph_op": {
                        "mi": ["binary_closing"],
                        "vc": ["binary_closing"],
                        "sj": [],
                    },
                    "min_obj_vx": {"mi": 100, "vc": 50, "sj": 20},
                    "sizethresholds": {"mi": 100, "vc": 50, "sj": 20},
                },
            ),
        ],
        force_overwrite=True,
    )
    global_params.config._parse_config()
    world = generate_toy_world(shape=(96, 96, 48), n_cells=3, svs_per_cell=2, seed=0)
    cfg = global_params.config
    kd = ChunkedVolume.create(
        cfg.kd_seg_path, scale=(10, 10, 20), boundary=world["seg"].shape, chunk_shape=(64, 64, 64)
    )
    kd.save_raw(world["raw"])
    kd.save_seg(world["seg"])
    for co in ["mi", "vc", "sj"]:
        cv = ChunkedVolume.create(
            getattr(cfg, f"kd_{co}_path"), scale=(10, 10, 20),
            boundary=world["seg"].shape, chunk_shape=(64, 64, 64),
        )
        cv.save_raw(world[co])
    save_svgraph(world["rag"], cfg.init_svgraph_path)
    return world


def test_full_init_and_ssd(toy_pipeline_wd, working_dir):
    from syconn_tpu import global_params
    from syconn_tpu.exec.exec_init import (
        init_cell_subcell_sds,
        run_create_neuron_ssd,
        run_create_rag,
    )
    from syconn_tpu.reps.segmentation import SegmentationDataset
    from syconn_tpu.reps.super_segmentation import SuperSegmentationDataset

    world = toy_pipeline_wd
    counts = init_cell_subcell_sds(chunk_size=(64, 64, 64), overwrite=True)
    n_svs = len(np.unique(world["seg"])) - 1
    assert counts["sv"] == n_svs

    run_create_rag()
    ssd = run_create_neuron_ssd()

    # every cell becomes one SSV (same-cell SVs are RAG-connected)
    sv2cell = world["sv2cell"]
    cells = set(sv2cell.values())
    assert len(ssd.ssv_ids) == len(cells)

    # mapping dict partitions all SVs
    mapped_svs = sorted(
        int(s) for svs in ssd.mapping_dict.values() for s in svs
    )
    assert mapped_svs == sorted(sv2cell.keys())

    # members agree with ground truth cells
    for ssv_id, svs in ssd.mapping_dict.items():
        cc = {sv2cell[int(s)] for s in svs}
        assert len(cc) == 1

    # reverse lookup
    some_svs = np.array(mapped_svs[:4], np.uint64)
    back = ssd.sv2ssv_ids(some_svs)
    for sv, ssv in zip(some_svs, back):
        assert int(sv) in set(int(x) for x in ssd.mapping_dict[int(ssv)])

    # aggregated per-cell attributes
    ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    ssv.load_attr_dict()
    assert ssv.size == sum(
        SegmentationDataset("sv", working_dir=working_dir).sizes[
            np.isin(SegmentationDataset("sv", working_dir=working_dir).ids, ssv.sv_ids)
        ]
    )
    assert ssv.bounding_box.shape == (2, 3)

    # organelle mapping: mapped mi objects lie (mostly) inside the cell
    seg = world["seg"]
    for ssv_id in ssd.ssv_ids:
        s = ssd.get_super_segmentation_object(int(ssv_id))
        s.load_attr_dict()
        assert "mi" in s.attr_dict
        assert "mapping_mi_ids" in s.attr_dict

    # merged cell mesh exists
    mesh = ssv.mesh
    assert len(mesh[1]) > 0

    # sv graph round trip
    g = ssv.load_sv_graph()
    assert set(g.nodes()) == {int(s) for s in ssv.sv_ids}
