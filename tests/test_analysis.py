import json
import os
import urllib.error
import urllib.request

import numpy as np
import pytest


@pytest.fixture()
def analysis_world(working_dir):
    """Assembled toy world with synapses + exported matrix."""
    from syconn_tpu import global_params
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.handler.config import generate_default_conf
    from syconn_tpu.exec.exec_init import (
        init_cell_subcell_sds,
        run_create_neuron_ssd,
        run_create_rag,
    )
    from syconn_tpu.exec.exec_skeleton import run_skeleton_generation
    from syconn_tpu.exec.exec_syns import run_matrix_export, run_syn_generation
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.io.graph import save_svgraph

    clear_kd_cache()
    generate_default_conf(
        working_dir, scaling=(10, 10, 20),
        key_value_pairs=[
            ("min_cc_size_ssv", 200), ("syntype_avail", True),
            ("cell_objects", {"min_obj_vx": {"syn_ssv": 10, "cs": 10, "syn": 10}}),
            ("skeleton", {"kimimaro_skelgen": {"dust_threshold": 100},
                          "kimimaro_merge": {"dust_threshold": 100, "tick_threshold": 200}}),
        ],
        force_overwrite=True,
    )
    global_params.config._parse_config()
    global_params.config.entries["process_cell_organelles"] = []
    cfg = global_params.config

    sh = (96, 64, 48)
    seg = np.zeros(sh, np.uint64)
    seg[4:46, 4:60, 4:44] = 7
    seg[50:92, 4:60, 4:44] = 9
    sj = np.zeros(sh, np.uint8)
    sj[42:54, 20:40, 10:30] = 255
    asym = sj.copy()
    kd = ChunkedVolume.create(cfg.kd_seg_path, scale=(10, 10, 20), boundary=sh, chunk_shape=(64, 64, 64))
    kd.save_seg(seg)
    for name, data in [("sj", sj), ("sym", np.zeros(sh, np.uint8)), ("asym", asym)]:
        cv = ChunkedVolume.create(getattr(cfg, f"kd_{name}_path"), scale=(10, 10, 20), boundary=sh, chunk_shape=(64, 64, 64))
        cv.save_raw(data)
    save_svgraph(np.zeros((0, 2), np.uint64), cfg.init_svgraph_path)
    init_cell_subcell_sds(chunk_size=(64, 64, 64), overwrite=True)
    run_create_rag()
    ssd = run_create_neuron_ssd()
    run_skeleton_generation(map_myelin=False, cube_size=(64, 64, 64))
    run_syn_generation(chunk_size=(64, 64, 64))
    run_matrix_export()
    return ssd


def test_rest_server(analysis_world, working_dir):
    from syconn_tpu.analysis.server import serve_background

    ssd = analysis_world
    httpd, port = serve_background(working_dir)
    try:
        def get(route):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{route}", timeout=10) as r:
                return json.loads(r.read())

        ssvs = get("/ssv_list")["ssvs"]
        assert sorted(ssvs) == sorted(int(i) for i in ssd.ssv_ids)
        ssv_id = ssvs[0]
        mesh = get(f"/ssv_mesh/{ssv_id}")
        assert len(mesh["vert"]) > 0
        skel = get(f"/ssv_skeleton/{ssv_id}")
        assert "nodes" in skel
        svs = get(f"/svs_of_ssv/{ssv_id}")["svs"]
        assert len(svs) >= 1
        back = get(f"/ssv_of_sv/{svs[0]}")
        assert back["ssv"] == ssv_id
        syn = get("/all_syn_meta")
        assert len(syn["ids"]) >= 1
        # unknown route -> 404 json
        with pytest.raises(urllib.error.HTTPError):
            get("/nope")

        # interactive viewer: the root serves the self-contained WebGL page
        # and /info carries the scaling it needs for synapse positions
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=10) as r:
            html = r.read().decode()
            assert r.headers.get("Content-Type", "").startswith("text/html")
        for needed in ("ssv_ind", "ssv_vert", "all_syn_meta", "webgl",
                       "syn_prob", "axodend"):
            assert needed in html or needed in html.lower(), needed
        inf = get("/info")
        assert inf["service"] == "syconn_tpu" and len(inf["scaling"]) == 3
    finally:
        httpd.shutdown()


def test_bio_interface(analysis_world, working_dir):
    from syconn_tpu.analysis.bio_interface import ConnectomeDataset

    ds = ConnectomeDataset(working_dir)
    assert len(ds.synapses) >= 1
    n = ds.neuron(int(ds.neuron_ids[0]))
    assert n.n_synapses >= 1
    assert n.total_synapse_size > 0
    assert n.skeleton_path_length_um > 0
    partners = n.partners()
    assert len(partners) == 1


def test_wiring_plots(analysis_world, working_dir, tmp_path):
    from syconn_tpu.reps.connectivity_helper import (
        cs_id_to_partner_ids_vec,
        cs_id_to_partner_inverse,
        generate_wiring_array,
        plot_cumul_wiring,
        plot_wiring,
    )

    # codec round trip
    packed = cs_id_to_partner_inverse([100, 200])
    pair = cs_id_to_partner_ids_vec([packed])[0]
    assert pair.tolist() == [100, 200]

    mat, cells = generate_wiring_array(wd=working_dir)
    assert mat.shape == (2, 2)
    assert mat[0, 1] != 0  # the two cells are connected
    p1 = plot_wiring(str(tmp_path / "wiring.png"), wd=working_dir)
    p2 = plot_cumul_wiring(str(tmp_path / "cumul.png"), wd=working_dir)
    assert os.path.isfile(p1) and os.path.isfile(p2)


def test_kzip_roundtrip(analysis_world, working_dir, tmp_path):
    from syconn_tpu.proc.ssd_assembly import init_sso_from_kzip, save_sso_to_kzip

    ssd = analysis_world
    ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    ssv.load_skeleton()
    p = str(tmp_path / f"{ssv.id}.k.zip")
    save_sso_to_kzip(ssv, p)
    sso2 = init_sso_from_kzip(p)
    assert sso2.id == ssv.id
    assert np.array_equal(sso2.load_mesh("sv")[1], ssv.load_mesh("sv")[1])
    assert np.array_equal(sso2.skeleton["nodes"], ssv.skeleton["nodes"])
    assert np.array_equal(np.sort(sso2.sv_ids), np.sort(ssv.sv_ids))
    # standalone: missing mesh types come back empty, not crash
    assert len(init_sso_from_kzip(p).load_mesh("er")[1]) == 0


def test_in_memory_bio_dataset(analysis_world, working_dir):
    """Full in-memory analysis model: compartments, organelle mapping,
    spines, path densities, features, skeleton path distance, conn mat."""
    import numpy as np

    from syconn_tpu.analysis.bio_interface import (
        build_conn_mat,
        feature_labels,
        get_skeleton_path_distance,
        init_in_mem_dataset,
        neuron_features,
    )
    from syconn_tpu.extraction.cs_processing import (
        collect_properties_from_ssv_partners,
        export_matrix,
    )
    from syconn_tpu.reps.segmentation import SegmentationDataset

    ssd = analysis_world
    # label cell 7's skeleton as axon, cell 9's as dendrite with spine heads
    for ssv_id, (axo, spin) in {7: (1, 2), 9: (0, 1)}.items():
        ssv = ssd.get_super_segmentation_object(ssv_id)
        assert ssv.load_skeleton()
        n = len(ssv.skeleton["nodes"])
        ssv.skeleton["axoness"] = np.full(n, axo, np.int64)
        ssv.skeleton["spiness"] = np.full(n, spin, np.int64)
        ssv.save_skeleton()
        ssv.attr_dict["celltype_cnn_e3"] = 2 if ssv_id == 9 else 3
        ssv.save_attr_dict()
    sd_syn = SegmentationDataset("syn_ssv", working_dir=working_dir)
    sd_syn.save_numpy_data("spinehead_vol", np.full(len(sd_syn.ids), 0.123))
    collect_properties_from_ssv_partners()
    export_matrix()

    ds = init_in_mem_dataset(working_dir)
    assert len(ds.synapses) >= 1 and len(ds.neurons) == 2
    s = next(iter(ds.synapses.values()))
    assert s.pre.ID == 7 and s.post.ID == 9  # axon side is presynaptic
    assert s.pre_morph == "axon"
    assert s.size > 0  # asymmetric -> positive signed size
    assert s.post_spine_vol == 0.123
    pre, post = ds.neurons[7], ds.neurons[9]
    # synapse containers: pre side in axon, post side in dendrite
    assert len(pre.axon.synapses) == len(ds.synapses)
    assert len(post.dendrite.synapses) == len(ds.synapses)
    assert len(pre.dendrite.synapses) == 0
    # spine-head synapse spawned a Spine with the measured volume
    assert len(post.spines) == len(ds.synapses)
    assert next(iter(post.spines.values())).volume == 0.123
    # compartment statistics
    assert pre.axon.skel_length > 0 and post.dendrite.skel_length > 0
    assert pre.soma.skel_length == 0
    assert pre.axon.synapse_path_density > 0
    assert pre.axon.synapse_vol_path_density > 0
    assert np.isclose(pre.axon.fraction_asym, 1.0)
    assert np.isclose(post.dendrite.head_other_ratio, 1.0)
    assert post.dendrite.pre_neurons[0] is pre
    # celltypes picked up from the matrix/attr chain
    assert pre.celltype == 3 and post.celltype == 2
    # features
    fv = neuron_features(pre)
    assert fv.shape == (len(feature_labels()),)
    assert np.isfinite(fv[feature_labels().index("axon_syn_path_density")])
    # skeleton path distance along one cell
    nodes = np.asarray(pre.skeleton["nodes"])
    d = get_skeleton_path_distance(pre, nodes[0], nodes[-1], max_query_coord_dist=5.0)
    assert np.isfinite(d) and d >= 0
    # conn mat: one directed entry pre -> post
    mat, ids = build_conn_mat(ds)
    assert mat.shape == (2, 2)
    assert mat[list(ids).index(7), list(ids).index(9)] > 0
    assert mat[list(ids).index(9), list(ids).index(7)] == 0


def test_binary_mesh_streams_and_viewer_client(analysis_world, working_dir, tmp_path):
    """Per-component mesh routes (JSON + raw binary) and the full gate
    client: streaming, download queue, filtered synapse table, scene kzip."""
    import urllib.request
    import zipfile

    import numpy as np

    from syconn_tpu.analysis.server import serve_background
    from syconn_tpu.analysis.viewer_client import SyConnClient, int2str_label_converter

    ssd = analysis_world
    httpd, port = serve_background(working_dir)
    try:
        client = SyConnClient(port=port, synthresh=0.0, axodend_only=False)
        ssvs = client.ssv_list()
        assert sorted(ssvs) == sorted(int(i) for i in ssd.ssv_ids)
        ssv_id = ssvs[0]

        # raw binary component streams == JSON streams
        def get_bytes(route):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{route}", timeout=10) as r:
                return r.read(), r.headers.get("Content-Type")

        raw, ct = get_bytes(f"/ssv_vert/{ssv_id}?format=raw")
        assert ct == "application/octet-stream"
        vert_raw = np.frombuffer(raw, np.float32)
        import json as _json

        js, ct2 = get_bytes(f"/ssv_vert/{ssv_id}")
        assert ct2 == "application/json"
        vert_js = np.asarray(_json.loads(js)["vert"], np.float32).ravel()
        assert np.array_equal(vert_raw, vert_js) and len(vert_raw) > 0
        ind_raw, _ = get_bytes(f"/ssv_obj_ind/{ssv_id}/sv?format=raw")
        assert len(np.frombuffer(ind_raw, np.uint32)) > 0

        # client mesh == server mesh
        mesh = client.ssv_mesh(ssv_id)
        assert len(mesh["vert"]) == len(vert_raw)

        # threaded download queue
        for i in ssvs:
            client.add_ssv_obj_mesh_to_down_queue(i, "sv")
        client.wait_for_all_downloads()
        for i in ssvs:
            m = client.get_ssv_obj_mesh_from_results_store(i, "sv")
            assert m is not None and len(m["vert"]) > 0

        # synapse table with filters (axoness unset -> axodend filter empties)
        tab = client.synapse_table(synthresh=0.0, axodend_only=False)
        assert len(tab["ids"]) >= 1
        tab2 = client.synapse_table(synthresh=1.1)
        assert len(tab2.get("ids", [])) == 0

        # label converter
        assert int2str_label_converter(1, "axgt") == "axon"
        assert int2str_label_converter(1, "spgt") == "head"
        assert isinstance(int2str_label_converter(2, "ctgt_j0251_v2"), str)

        # scene export -> valid kzip with plys + skeletons + synapse table
        out = client.export_scene_kzip(str(tmp_path / "scene.k.zip"), ssvs)
        with zipfile.ZipFile(out) as zf:
            names = zf.namelist()
            assert any(n.startswith("mesh_") and n.endswith(".ply") for n in names)
            assert any(n.startswith("skeleton_") for n in names)
            assert "synapses.json" in names
            assert zf.read(f"mesh_{ssvs[0]}_sv.ply").startswith(b"ply")
    finally:
        httpd.shutdown()
