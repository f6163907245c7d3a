"""End-to-end integration: examples/start.py on a small synthetic cube
(reference: tests/test_run.py runs examples/start.py in a subprocess)."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_start_py_end_to_end(tmp_path):
    wd = str(tmp_path / "example_wd")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the ambient sitecustomize re-pins JAX_PLATFORMS=axon; this package
    # escape hatch forces the CPU backend inside the subprocess
    env["SYCONN_TPU_PLATFORM"] = "cpu"
    env.pop("syconn_wd", None)
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "examples", "start.py"),
            "--working_dir", wd,
            "--shape", "96", "96", "48",
            "--n_cells", "3",
            "--overwrite",
        ],
        capture_output=True,
        text=True,
        timeout=3600,
        env=env,
        cwd=repo,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout[-3000:]}\nstderr:\n{res.stderr[-5000:]}"

    # pipeline artifacts
    assert os.path.isfile(os.path.join(wd, "connectivity_matrix", "conn_mat.csv"))
    assert os.path.isfile(os.path.join(wd, ".timing.pkl"))

    from syconn_tpu import global_params
    from syconn_tpu.handler.basics import clear_kd_cache

    clear_kd_cache()
    prev = global_params.wd
    try:
        global_params.wd = wd
        global_params.config._parse_config()
        from syconn_tpu.reps.segmentation import SegmentationDataset
        from syconn_tpu.reps.super_segmentation import SuperSegmentationDataset

        ssd = SuperSegmentationDataset(working_dir=wd)
        assert len(ssd.ssv_ids) >= 2
        ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
        ssv.load_attr_dict()
        assert "celltype_cnn_e3" in ssv.attr_dict
        assert "latent_morph" in ssv.attr_dict
        assert ssv.load_skeleton()
        assert "axoness" in ssv.skeleton
        assert "myelin" in ssv.skeleton
        sd_syn = SegmentationDataset("syn_ssv", working_dir=wd)
        assert len(sd_syn.ids) >= 1
    finally:
        global_params.wd = prev


@pytest.mark.slow
def test_start_py_views_and_all_organelles(tmp_path):
    """Second pipeline variant: view-based inference (--use_views), all four
    organelles, astrocyte removal — exercises the code paths the default
    run skips."""
    wd = str(tmp_path / "views_wd")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SYCONN_TPU_PLATFORM"] = "cpu"
    env.pop("syconn_wd", None)
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "examples", "start.py"),
            "--working_dir", wd,
            "--shape", "96", "96", "48",
            "--n_cells", "3",
            "--overwrite",
            "--use_views",
            # plumbing smoke: the view routes run with whatever weights
            # resolve; view-CMN inference otherwise refuses seed init
            "--kv", "views.allow_untrained_models=true",
            "--organelles", "mi,vc,er,golgi",
            "--prior_astrocyte_removal",
        ],
        capture_output=True,
        text=True,
        timeout=3600,
        env=env,
        cwd=repo,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout[-3000:]}\nstderr:\n{res.stderr[-5000:]}"
    assert os.path.isfile(os.path.join(wd, "connectivity_matrix", "conn_mat.csv"))
    # er/golgi datasets materialized
    for co in ("er", "golgi"):
        assert os.path.isdir(os.path.join(wd, f"{co}s_0")) or any(
            d.startswith(co) for d in os.listdir(wd)
        ), co
