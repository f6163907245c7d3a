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
