import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture()
def view_world(working_dir):
    from syconn_tpu import global_params
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.handler.config import generate_default_conf
    from syconn_tpu.exec.exec_init import (
        init_cell_subcell_sds,
        run_create_neuron_ssd,
        run_create_rag,
    )
    from syconn_tpu.exec.exec_skeleton import run_skeleton_generation
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.io.graph import save_svgraph
    from syconn_tpu.utils.testdata import generate_toy_world

    clear_kd_cache()
    generate_default_conf(
        working_dir, scaling=(10, 10, 20),
        key_value_pairs=[("min_cc_size_ssv", 200), ("use_point_models", False),
                         # plumbing test: exercises the view routes, not
                         # model quality — allow seed-initialized weights
                         ("views", {"allow_untrained_models": True}),
                         ("skeleton", {"kimimaro_skelgen": {"dust_threshold": 100},
                                       "kimimaro_merge": {"dust_threshold": 100, "tick_threshold": 200}})],
        force_overwrite=True,
    )
    global_params.config._parse_config()
    global_params.config.entries["process_cell_organelles"] = []
    cfg = global_params.config
    world = generate_toy_world(shape=(96, 96, 48), n_cells=2, svs_per_cell=2, seed=7)
    kd = ChunkedVolume.create(cfg.kd_seg_path, scale=(10, 10, 20),
                              boundary=world["seg"].shape, chunk_shape=(96, 96, 48))
    kd.save_seg(world["seg"])
    save_svgraph(world["rag"], cfg.init_svgraph_path)
    init_cell_subcell_sds(chunk_size=(96, 96, 48), overwrite=True)
    run_create_rag()
    ssd = run_create_neuron_ssd()
    run_skeleton_generation(map_myelin=False, cube_size=(96, 96, 48))
    return ssd


def test_view_based_inference_paths(view_world):
    """use_point_models=False routes celltype/axoness/embedding through the
    rendered-view CMN models."""
    from syconn_tpu.exec.exec_inference import (
        run_celltype_prediction,
        run_morphology_embedding,
        run_semsegaxoness_prediction,
    )

    ssd = view_world
    n = run_celltype_prediction()
    assert n == len(ssd.ssv_ids)
    s = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    s.load_attr_dict()
    assert 0 <= s.attr_dict["celltype_cnn_e3"] < 8

    n = run_semsegaxoness_prediction()
    assert n == len(ssd.ssv_ids)
    s = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    s.load_attr_dict()
    assert "axoness_vertex_labels" in s.attr_dict
    assert s.load_skeleton() and "axoness" in s.skeleton

    run_morphology_embedding()
    s.load_attr_dict()
    assert s.attr_dict["latent_morph"].shape == (10,)


def test_gliapred_views(view_world):
    from syconn_tpu.inference.views_infer import gliapred_sso_views

    ssd = view_world
    p = gliapred_sso_views(ssd.get_super_segmentation_object(int(ssd.ssv_ids[0])))
    assert 0.0 <= p <= 1.0


def test_viewer_client(view_world, working_dir):
    from syconn_tpu.analysis.server import serve_background
    from syconn_tpu.analysis.viewer_client import SyConnClient

    httpd, port = serve_background(working_dir)
    try:
        c = SyConnClient(port=port)
        ssvs = c.ssv_list()
        assert len(ssvs) >= 1
        mesh = c.ssv_mesh(ssvs[0])
        assert len(mesh["vert"]) > 0
        sk = c.ssv_skeleton(ssvs[0])
        assert "nodes" in sk
        assert c.ssv_of_sv(int(c.svs_of_ssv(ssvs[0])[0])) == ssvs[0]
        # attr round trip over HTTP
        assert c.push_so_attr(ssvs[0], "sv", "test_attr", 42)
        assert c.pull_so_attr(ssvs[0], "sv", "test_attr") == 42
    finally:
        httpd.shutdown()


def test_average_node_axoness_views(view_world):
    """Per-location scalar view predictions averaged onto skeleton nodes
    (reference ssh:1152): view_ixs assignment, path-window majority, and
    the smoothing property (every node label is one of the view preds)."""
    from syconn_tpu.inference.views_infer import (
        average_node_axoness_views,
        axoness_views_of_sso,
    )

    ssd = view_world
    ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    preds, locs = axoness_views_of_sso(ssv)
    assert len(preds) == len(locs) > 0
    assert ssv.load_skeleton()
    avg = average_node_axoness_views(ssv, max_dist=10000.0, return_res=True)
    assert avg is not None and len(avg) == len(ssv.skeleton["nodes"])
    assert set(np.unique(avg)) <= set(np.unique(preds))
    assert "view_ixs" in ssv.skeleton
    assert len(ssv.skeleton["view_ixs"]) == len(ssv.skeleton["nodes"])
    # persisted-key variant
    average_node_axoness_views(ssv, max_dist=10000.0)
    assert "axoness_avg10000" in ssv.skeleton
    # with a huge window every node sees every view -> constant label
    allv = average_node_axoness_views(ssv, max_dist=1e12, return_res=True)
    cls, cnts = np.unique(preds[np.unique(ssv.skeleton["view_ixs"])], return_counts=True)
    assert np.all(allv == cls[np.argmax(cnts)])


def test_write_sv_views_chunked(view_world):
    """Chunked per-SV view cache writes land in each SV's view storage."""
    from syconn_tpu.render.views import write_sv_views_chunked
    from syconn_tpu.reps.segmentation import SegmentationDataset

    ssd = view_world
    ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    svs = list(ssv.svs)
    rng = np.random.default_rng(0)
    counts = [int(rng.integers(1, 4)) for _ in svs]
    part = np.concatenate([[0], np.cumsum(counts)])
    views = rng.integers(0, 255, (int(part[-1]), 2, 1, 8, 4), dtype=np.uint8)
    write_sv_views_chunked(svs, views, part, view_key="raw")
    for i, sv in enumerate(svs):
        got = sv.load_views("raw")
        assert got is not None
        assert np.array_equal(got, views[part[i]:part[i + 1]])
