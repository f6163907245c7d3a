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
