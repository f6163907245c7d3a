import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_pointnet_shapes():
    import jax.numpy as jnp

    from syconn_tpu.models.pointnet import PointClassNet, PointSegNet

    m = PointClassNet(n_classes=5, widths=(16, 32), k=4, embed_dim=6)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 7))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out["logits"].shape == (2, 5)
    assert out["embedding"].shape == (2, 6)
    assert np.allclose(np.linalg.norm(np.asarray(out["embedding"]), axis=-1), 1.0, atol=1e-4)

    ms = PointSegNet(n_classes=3, widths=(16, 32), k=4)
    params = ms.init(jax.random.PRNGKey(0), x)["params"]
    seg = ms.apply({"params": params}, x)
    assert seg.shape == (2, 128, 3)


def test_cmn_shapes():
    import jax.numpy as jnp

    from syconn_tpu.models.cmn import MultiViewCMN, TripletCMN, ViewSemSegNet

    views = jnp.zeros((2, 4, 64, 32, 2), jnp.uint8)
    m = MultiViewCMN(n_classes=8, widths=(8, 16))
    params = m.init(jax.random.PRNGKey(0), views)["params"]
    out = m.apply({"params": params}, views)
    assert out.shape == (2, 8)

    t = TripletCMN(embed_dim=10, widths=(8, 16))
    params = t.init(jax.random.PRNGKey(0), views)["params"]
    z = t.apply({"params": params}, views)
    assert z.shape == (2, 10)

    s = ViewSemSegNet(n_classes=5, widths=(8, 16))
    x = jnp.zeros((3, 64, 32, 2), jnp.uint8)
    params = s.init(jax.random.PRNGKey(0), x)["params"]
    seg = s.apply({"params": params}, x)
    assert seg.shape == (3, 64, 32, 5)


def test_extract_contexts(rng):
    from syconn_tpu.inference.points import extract_contexts

    coords = rng.random((5000, 3)).astype(np.float32) * 10000
    types = rng.integers(0, 4, 5000).astype(np.int32)
    ctxs, idx_lists = extract_contexts(coords, types, ctx_size_nm=4000, npoints=256, n_contexts=5, rng=rng)
    assert ctxs.shape == (5, 256, 7)
    # coords normalized into the unit ball (radius 1)
    assert np.all(np.linalg.norm(ctxs[..., :3], axis=-1) <= 1.0 + 1e-5)
    # one-hot features valid
    assert np.all(ctxs[..., 3:].sum(-1) == 1.0)
    assert len(idx_lists) == 5 and all(len(i) == 256 for i in idx_lists)


def test_certainty_estimate():
    from syconn_tpu.inference.points import certainty_estimate

    sharp = np.array([100.0, 0.0, 0.0])
    flat = np.array([1.0, 1.0, 1.0])
    assert certainty_estimate(sharp) > 0.95
    assert certainty_estimate(flat) < 0.05


@pytest.fixture()
def inference_world(working_dir):
    """Assembled toy SSD ready for neural inference."""
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
        key_value_pairs=[("min_cc_size_ssv", 200),
                         ("skeleton", {"kimimaro_skelgen": {"dust_threshold": 100},
                                       "kimimaro_merge": {"dust_threshold": 100, "tick_threshold": 200}})],
        force_overwrite=True,
    )
    global_params.config._parse_config()
    global_params.config.entries["process_cell_organelles"] = []
    cfg = global_params.config
    world = generate_toy_world(shape=(96, 96, 48), n_cells=2, svs_per_cell=2, seed=4)
    kd = ChunkedVolume.create(cfg.kd_seg_path, scale=(10, 10, 20), boundary=world["seg"].shape, chunk_shape=(96, 96, 48))
    kd.save_seg(world["seg"])
    save_svgraph(world["rag"], cfg.init_svgraph_path)
    init_cell_subcell_sds(chunk_size=(96, 96, 48), overwrite=True)
    run_create_rag()
    ssd = run_create_neuron_ssd()
    run_skeleton_generation(map_myelin=False, cube_size=(96, 96, 48))
    return ssd


def test_celltype_and_compartment_inference(inference_world):
    from syconn_tpu.exec.exec_inference import (
        run_celltype_prediction,
        run_morphology_embedding,
        run_semsegaxoness_prediction,
    )

    ssd = inference_world
    n = run_celltype_prediction()
    assert n == len(ssd.ssv_ids)
    for i in ssd.ssv_ids:
        s = ssd.get_super_segmentation_object(int(i))
        s.load_attr_dict()
        assert 0 <= s.attr_dict["celltype_cnn_e3"] < 8
        assert 0.0 <= s.attr_dict["celltype_cnn_e3_certainty"] <= 1.0

    n = run_semsegaxoness_prediction()
    assert n == len(ssd.ssv_ids)
    for i in ssd.ssv_ids:
        s = ssd.get_super_segmentation_object(int(i))
        assert s.load_skeleton()
        assert "axoness" in s.skeleton
        assert "axoness_avg10000" in s.skeleton
        assert len(s.skeleton["axoness"]) == len(s.skeleton["nodes"])

    n = run_morphology_embedding()
    assert n == len(ssd.ssv_ids)
    s = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    s.load_attr_dict()
    assert s.attr_dict["latent_morph"].shape == (10,)


def test_glia_prediction_and_splitting(inference_world):
    from syconn_tpu import global_params
    from syconn_tpu.exec.exec_inference import (
        run_astrocyte_prediction_pts,
        run_astrocyte_splitting,
    )
    from syconn_tpu.io.graph import load_svgraph

    run_astrocyte_prediction_pts()
    stats = run_astrocyte_splitting()
    assert stats["n_neuron_sv"] + stats["n_glia_sv"] > 0
    cfg = global_params.config
    g = load_svgraph(cfg.neuron_svgraph_path)
    assert g.number_of_nodes() == stats["n_neuron_sv"]
