import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture()
def sso_world(working_dir):
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
    world = generate_toy_world(shape=(96, 96, 48), n_cells=2, svs_per_cell=2, seed=8)
    kd = ChunkedVolume.create(cfg.kd_seg_path, scale=(10, 10, 20),
                              boundary=world["seg"].shape, chunk_shape=(96, 96, 48))
    kd.save_seg(world["seg"])
    save_svgraph(world["rag"], cfg.init_svgraph_path)
    init_cell_subcell_sds(chunk_size=(96, 96, 48), overwrite=True)
    run_create_rag()
    ssd = run_create_neuron_ssd()
    run_skeleton_generation(map_myelin=False, cube_size=(96, 96, 48))
    return ssd


def test_semseg_for_coords_and_compartmentalize(sso_world):
    ssd = sso_world
    ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    # synthetic vertex labels: left half dendrite (0), right half axon (1)
    mesh = ssv.load_mesh("sv")
    verts = mesh[1].reshape(-1, 3)
    labels = (verts[:, 0] > np.median(verts[:, 0])).astype(np.int32)
    ssv.attr_dict["axoness_vertex_labels"] = labels
    ssv.save_attr_dict()

    coords_vx = np.array([verts[np.argmin(verts[:, 0])] / [10, 10, 20],
                          verts[np.argmax(verts[:, 0])] / [10, 10, 20]])
    out = ssv.semseg_for_coords(coords_vx, semseg_key="axoness", k=5)
    assert out[0] == 0 and out[1] == 1

    parts = ssv.compartmentalize_mesh("axoness")
    assert set(parts.keys()) == {0, 1}
    n0 = len(parts[0][1]) // 3
    n1 = len(parts[1][1]) // 3
    assert n0 > 0 and n1 > 0


def test_shortestpath2soma(sso_world):
    ssd = sso_world
    ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    ssv.load_skeleton()
    sk = ssv.skeleton
    n = len(sk["nodes"])
    ax = np.zeros(n, np.int64)
    ax[0] = 2  # node 0 is soma
    sk["axoness"] = ax
    ssv.save_skeleton()
    d = ssv.shortestpath2soma(sk["nodes"][:1])
    assert d[0] < 1e-6 or d[0] < 100  # at/near the soma node
    if n > 1:
        d2 = ssv.shortestpath2soma(sk["nodes"][n - 1 : n])
        assert np.isfinite(d2[0])
        assert d2[0] >= d[0]


def test_fallback_mesh_skeleton(sso_world):
    from syconn_tpu.reps.super_segmentation_helper import create_sso_skeleton_fast
    from syconn_tpu.skeleton.sparsify import skeleton_to_nx
    import networkx as nx

    ssd = sso_world
    ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    sk = create_sso_skeleton_fast(ssv, ds_factor_nm=500, save=False)
    assert sk is not None and len(sk["nodes"]) >= 2
    assert nx.is_connected(skeleton_to_nx(sk))


def test_total_edge_length_and_syn_ratio(sso_world):
    ssd = sso_world
    ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    assert ssv.total_edge_length() > 0
    # no synapses in this world -> nan
    assert np.isnan(ssv.syn_sign_ratio())


def test_gliasplit_method(sso_world):
    ssd = sso_world
    ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    # mark all SVs as neuron-like
    for sv in ssv.svs:
        sv.load_attr_dict()
        sv.attr_dict["glia_probas"] = 0.01
        sv.save_attr_dict()
    neuron, glia = ssv.gliasplit()
    assert len(neuron) == len(ssv.sv_ids)
    assert len(glia) == 0


def test_get_spine_compartments(sso_world):
    """Spine CCs from vertex labels (reference sso:2242): a labeled patch
    of head vertices yields one head component at the right location."""
    import numpy as np

    ssd = sso_world
    ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    mesh = ssv.load_mesh("sv")
    verts = np.asarray(mesh[1]).reshape(-1, 3)
    labels = np.full(len(verts), 2, np.int32)  # shaft everywhere
    # head patch: all vertices near the first vertex
    d = np.linalg.norm(verts - verts[0][None], axis=1)
    head_sel = d < 400
    labels[head_sel] = 1
    neck_sel = (d >= 400) & (d < 700)
    labels[neck_sel] = 0
    ssv.load_attr_dict()
    ssv.attr_dict["spiness_vertex_labels"] = labels
    ssv.save_attr_dict()
    neck_c, neck_s, head_c, head_s = ssv.get_spine_compartments(min_spine_cc_size=5)
    assert len(head_c) >= 1 and head_s.max() >= 5
    # the head location is inside the labeled patch's bounding region
    scale = np.asarray(ssv.scaling, np.float64)
    hc_nm = head_c.astype(np.float64) * scale
    assert np.linalg.norm(hc_nm[0] - verts[head_sel].mean(axis=0)) < 1e3
    if len(neck_c):
        nc_nm = neck_c.astype(np.float64) * scale
        assert np.all(np.linalg.norm(nc_nm - verts[0][None], axis=1) >= 200)


def test_kzip_exporters(sso_world, tmp_path):
    """SSO kzip export surface (reference sso:2357-2660): meshes2kzip,
    export2kzip round-trip, mergelist, locations, per-SV meshes."""
    import zipfile

    import numpy as np

    ssd = sso_world
    ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    ssv.load_skeleton()

    p = str(tmp_path / "all.k.zip")
    ssv.meshes2kzip(p, obj_types=("sv",))
    ssv.mergelist2kzip(p)
    ssv.write_locations2kzip(p)
    ssv.write_svmeshes2kzip(p)
    with zipfile.ZipFile(p) as zf:
        names = zf.namelist()
        assert "sv.ply" in names and "mergelist.txt" in names
        assert "sample_locations.nml" in names
        assert any(n.startswith("sv_") and n.endswith(".ply") for n in names)
        ml = zf.read("mergelist.txt").decode()
        for sv_id in ssv.sv_ids:
            assert str(int(sv_id)) in ml

    p2 = str(tmp_path / "bundle.k.zip")
    ssv.export2kzip(p2, obj_types=("sv",))
    from syconn_tpu.proc.ssd_assembly import init_sso_from_kzip

    back = init_sso_from_kzip(p2)
    assert back.id == ssv.id
    assert np.array_equal(back.load_mesh("sv")[1], ssv.load_mesh("sv")[1])
