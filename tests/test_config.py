import os

import numpy as np

from syconn_tpu import global_params
from syconn_tpu.handler.config import Config, DynConfig, generate_default_conf


def test_generate_and_read(tmp_path):
    wd = str(tmp_path / "wd1")
    generate_default_conf(
        wd,
        scaling=np.array([10, 10, 20]),
        key_value_pairs=[
            ("use_point_models", True),
            ("glia", {"prior_astrocyte_removal": True}),
            ("cell_objects", {"cs_gap_nm": 123}),
        ],
    )
    conf = Config(wd)
    assert conf["scaling"] == [10, 10, 20]
    assert conf["use_point_models"] is True
    # nested merge must preserve sibling keys
    assert conf["glia"]["prior_astrocyte_removal"] is True
    assert conf["glia"]["glia_thresh"] == 0.161489
    assert conf["cell_objects"]["cs_gap_nm"] == 123
    assert conf["cell_objects"]["cs_filtersize"] == [13, 13, 7]


def test_default_fallback(tmp_path):
    wd = str(tmp_path / "wd2")
    os.makedirs(wd)
    with open(os.path.join(wd, "config.yml"), "w") as f:
        f.write("scaling: [1, 2, 3]\n")
    conf = Config(wd)
    assert conf["scaling"] == [1, 2, 3]
    # missing key falls back to packaged default
    assert conf["cell_objects"]["cs_filtersize"] == [13, 13, 7]
    assert "versions" in conf


def test_dynconfig_tracks_wd(tmp_path):
    wd_a = str(tmp_path / "a")
    wd_b = str(tmp_path / "b")
    generate_default_conf(wd_a, scaling=(1, 1, 1), key_value_pairs=[("ncores_per_node", 11)])
    generate_default_conf(wd_b, scaling=(2, 2, 2), key_value_pairs=[("ncores_per_node", 22)])
    prev = global_params.wd
    try:
        global_params.wd = wd_a
        assert global_params.config.working_dir == wd_a
        assert global_params.config["ncores_per_node"] == 11
        global_params.wd = wd_b
        assert global_params.config["ncores_per_node"] == 22
        assert global_params.config["scaling"] == [2, 2, 2]
    finally:
        global_params.wd = prev


def test_path_properties(tmp_path):
    wd = str(tmp_path / "wd3")
    generate_default_conf(wd, scaling=(10, 10, 20))
    conf = Config(wd)
    assert conf.kd_seg_path.endswith("knossosdatasets/seg")
    assert conf.kd_organelle_seg_paths["mi"].endswith("mi_seg")
    assert conf.mpath_myelin.startswith(wd)
