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


def test_split_ssv_roundtrip(toy_pipeline_wd, working_dir):
    """assemble -> split: attributes, sv-graphs, skeleton and dataset
    caches stay consistent (reference: syconn/proc/ssd_proc.py:375)."""
    import numpy as np

    from syconn_tpu.exec.exec_init import (
        init_cell_subcell_sds,
        run_create_neuron_ssd,
        run_create_rag,
    )
    from syconn_tpu.proc.ssd_proc import split_ssv
    from syconn_tpu.reps.segmentation import SegmentationDataset

    init_cell_subcell_sds(chunk_size=(64, 64, 64), overwrite=True)
    run_create_rag()
    ssd = run_create_neuron_ssd()

    # pick a cell with >= 2 SVs
    cand = [i for i in ssd.ssv_ids if len(ssd.mapping_dict[int(i)]) >= 2]
    assert cand, "toy world must contain a multi-SV cell"
    orig_id = int(cand[0])
    ssv = ssd.get_super_segmentation_object(orig_id)
    ssv.load_attr_dict()
    orig_svs = sorted(int(s) for s in ssv.sv_ids)
    orig_size = int(ssv.size)
    # give the cell a skeleton spanning its SV rep coords
    sd_sv = SegmentationDataset("sv", working_dir=working_dir)
    reps = dict(zip(sd_sv.ids.tolist(), sd_sv.rep_coords))
    nodes = np.array([reps[s] for s in orig_svs], np.float32)
    ssv.skeleton = {
        "nodes": nodes,
        "edges": np.array([[i, i + 1] for i in range(len(nodes) - 1)], np.int64),
        "diameters": np.ones(len(nodes)),
    }
    ssv.save_skeleton()

    split_set = orig_svs[: len(orig_svs) // 2] or orig_svs[:1]
    s1, s2 = split_ssv(ssv, split_set)

    # membership partitions the original
    got1 = sorted(int(s) for s in s1.sv_ids)
    got2 = sorted(int(s) for s in s2.sv_ids)
    assert got2 == sorted(split_set)
    assert sorted(got1 + got2) == orig_svs

    # attributes re-derived consistently
    assert int(s1.attr_dict["size"]) + int(s2.attr_dict["size"]) == orig_size
    for s in (s1, s2):
        assert s.attr_dict["bounding_box"].shape == (2, 3)
        g = s.load_sv_graph()
        assert set(g.nodes()) == {int(x) for x in s.sv_ids}

    # skeleton nodes partitioned by side
    n1 = 0 if not s1.load_skeleton() else len(s1.skeleton["nodes"])
    n2 = 0 if not s2.load_skeleton() else len(s2.skeleton["nodes"])
    assert n1 + n2 == len(nodes)

    # dataset bookkeeping: mapping dict, caches, reverse index
    ssd2 = type(ssd)(working_dir=working_dir)
    assert orig_id not in set(int(i) for i in ssd2.ssv_ids)
    assert {int(s1.id), int(s2.id)} <= set(int(i) for i in ssd2.ssv_ids)
    back = ssd2.sv2ssv_ids(np.asarray(split_set, np.uint64))
    assert all(int(b) == int(s2.id) for b in back)
    # tombstone points to the new cells
    old = ssd2.get_super_segmentation_object(orig_id)
    old.load_attr_dict()
    assert tuple(old.attr_dict.get("split_into", ())) == (int(s1.id), int(s2.id))
    # caches aligned with ids
    ids = ssd2.load_numpy_data("id")
    sizes = ssd2.load_numpy_data("size")
    assert len(ids) == len(sizes)
    assert int(sizes[list(ids).index(s1.id)]) == int(s1.attr_dict["size"])
