import numpy as np
import pytest

from syconn_tpu.skeleton.sparsify import (
    merge_skeletons,
    prune_stub_branches,
    skeleton_to_nx,
    sparsify_skeleton,
)
from syconn_tpu.skeleton.teasar import skeletonize_object, teasar_skeleton


def _tube(length=60, radius=4, axis=0, shape=(70, 20, 20)):
    m = np.zeros(shape, bool)
    c = np.array(shape) // 2
    sl = [slice(c[d] - radius, c[d] + radius) for d in range(3)]
    sl[axis] = slice(5, 5 + length)
    m[tuple(sl)] = True
    return m


def test_teasar_tube():
    m = _tube()
    sk = teasar_skeleton(m, scale=(10, 10, 10))
    assert sk is not None
    nodes = sk["nodes"]
    edges = sk["edges"]
    assert len(nodes) >= 10
    # tree: connected, n_edges == n_nodes - 1
    import networkx as nx

    g = skeleton_to_nx(sk)
    assert nx.is_connected(g)
    assert g.number_of_edges() == g.number_of_nodes() - 1
    # skeleton spans the tube's long axis
    assert nodes[:, 0].max() - nodes[:, 0].min() > 40
    # centerline: y/z stay near the tube center
    assert np.all(np.abs(nodes[:, 1] - 10) <= 4)
    assert np.all(np.abs(nodes[:, 2] - 10) <= 4)
    # radii roughly match the tube radius (in nm)
    assert 20 <= np.median(sk["diameters"]) <= 90


def test_teasar_l_shape_branch():
    m = np.zeros((60, 60, 16), bool)
    m[5:55, 28:34, 5:11] = True   # bar along x
    m[26:32, 5:55, 5:11] = True   # bar along y -> crossing
    # invalidation ball scaled down to the toy geometry
    sk = teasar_skeleton(m, scale=(10, 10, 20), invalidation_const_nm=50, invalidation_scale=1.0)
    import networkx as nx

    g = skeleton_to_nx(sk)
    assert nx.is_connected(g)
    nodes = sk["nodes"]
    # spans both arms
    assert nodes[:, 0].max() - nodes[:, 0].min() > 35
    assert nodes[:, 1].max() - nodes[:, 1].min() > 35


def test_skeletonize_object_components():
    m = np.zeros((40, 20, 20), bool)
    m[2:12, 5:12, 5:12] = True
    m[25:38, 5:12, 5:12] = True
    sk = skeletonize_object(m, offset=(100, 0, 0), scale=(10, 10, 20))
    assert sk is not None
    # offset applied
    assert sk["nodes"][:, 0].min() >= 100


def test_sparsify_and_prune():
    # straight dense chain with a tiny stub
    nodes = np.array([[i, 0, 0] for i in range(20)] + [[10, 1, 0]], np.float32)
    edges = np.array([[i, i + 1] for i in range(19)] + [[10, 20]], np.int64)
    sk = {"nodes": nodes, "edges": edges, "diameters": np.ones(21, np.float32)}
    sp = sparsify_skeleton(sk, scale=(100, 100, 100), min_dist_nm=50)
    assert len(sp["nodes"]) < 21  # collinear nodes removed
    pr = prune_stub_branches(sk, scale=(100, 100, 100), len_thres_nm=150)
    assert len(pr["nodes"]) == 20  # stub (100 nm) removed


def test_merge_skeletons_stitch():
    a = {"nodes": np.array([[0, 0, 0], [5, 0, 0]], np.float32),
         "edges": np.array([[0, 1]], np.int64), "diameters": np.ones(2, np.float32)}
    b = {"nodes": np.array([[7, 0, 0], [12, 0, 0]], np.float32),
         "edges": np.array([[0, 1]], np.int64), "diameters": np.ones(2, np.float32)}
    merged = merge_skeletons([a, b], scale=(10, 10, 10), stitch=True)
    import networkx as nx

    g = skeleton_to_nx(merged)
    assert nx.is_connected(g)
    assert g.number_of_nodes() == 4


def test_full_skeleton_pipeline(working_dir):
    """Cells from the toy world get stitched, persisted skeletons."""
    from syconn_tpu import global_params
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.handler.config import generate_default_conf
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.io.graph import save_svgraph
    from syconn_tpu.exec.exec_init import (
        init_cell_subcell_sds,
        run_create_neuron_ssd,
        run_create_rag,
    )
    from syconn_tpu.exec.exec_skeleton import run_skeleton_generation
    from syconn_tpu.reps.super_segmentation import SuperSegmentationDataset
    from syconn_tpu.utils.testdata import generate_toy_world

    clear_kd_cache()
    generate_default_conf(
        working_dir, scaling=(10, 10, 20),
        key_value_pairs=[("min_cc_size_ssv", 200),
                         ("skeleton", {"kimimaro_skelgen": {"dust_threshold": 100},
                                       "kimimaro_merge": {"dust_threshold": 100, "tick_threshold": 200}})],
        force_overwrite=True,
    )
    global_params.config._parse_config()
    global_params.config.entries["process_cell_organelles"] = []
    cfg = global_params.config
    world = generate_toy_world(shape=(96, 96, 48), n_cells=3, svs_per_cell=2, seed=2)
    kd = ChunkedVolume.create(cfg.kd_seg_path, scale=(10, 10, 20), boundary=world["seg"].shape, chunk_shape=(64, 64, 64))
    kd.save_seg(world["seg"])
    save_svgraph(world["rag"], cfg.init_svgraph_path)
    init_cell_subcell_sds(chunk_size=(64, 64, 64), overwrite=True)
    run_create_rag()
    ssd = run_create_neuron_ssd()
    n = run_skeleton_generation(map_myelin=False, cube_size=(64, 64, 64))
    assert n == len(ssd.ssv_ids)
    import networkx as nx

    for ssv_id in ssd.ssv_ids:
        ssv = ssd.get_super_segmentation_object(int(ssv_id))
        assert ssv.load_skeleton()
        sk = ssv.skeleton
        assert len(sk["nodes"]) >= 1
        g = skeleton_to_nx(sk)
        assert nx.is_connected(g)
        # nodes lie inside the cell's bounding box (some slack for stitch)
        ssv.load_attr_dict()
        bb = ssv.bounding_box
        assert np.all(sk["nodes"] >= bb[0] - 8)
        assert np.all(sk["nodes"] <= bb[1] + 8)
