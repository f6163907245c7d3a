"""Worker-level idempotent resume (reference: syconn/proc/sd_proc.py:689-726,
syconn/extraction/cs_processing_steps.py:455).

Each test kills a step mid-run (fault injection into the per-chunk worker),
reruns with ``overwrite=False``, and checks (a) the rerun skips completed
work (resume log line) and (b) the final artifacts are identical to an
uninterrupted run.
"""

import logging

import numpy as np
import pytest

from syconn_tpu.io.chunked import ChunkedVolume


class _FailOnce:
    """Raise on the Nth call, succeed on all others (and after rerun)."""

    def __init__(self, fn, fail_at):
        self.fn = fn
        self.calls = 0
        self.fail_at = fail_at
        self.armed = True

    def __call__(self, *a, **kw):
        self.calls += 1
        if self.armed and self.calls >= self.fail_at:
            raise RuntimeError("injected crash")
        return self.fn(*a, **kw)


def _make_prob_volume(tmp_path, sh=(128, 64, 48)):
    prob = np.zeros(sh, np.uint8)
    prob[4:60, 4:28, 4:20] = 255
    prob[70:120, 10:50, 8:40] = 255
    src_p = str(tmp_path / "prob")
    src = ChunkedVolume.create(
        src_p, scale=(10, 10, 20), boundary=sh, chunk_shape=(32, 32, 48)
    )
    src.save_raw(prob)
    return src_p, sh


def test_object_extraction_resume(tmp_path, working_dir, caplog, monkeypatch):
    from syconn_tpu.extraction import object_extraction as oe

    src_p, sh = _make_prob_volume(tmp_path)
    kw = dict(thresh_uint8=128, morph_ops=["binary_closing"], min_seed_vx=1,
              chunk_shape=(32, 32, 48), mesh=None)

    # clean run -> golden volume
    oe.from_probabilities_to_kd(src_p, str(tmp_path / "seg_clean"), **kw)
    golden = ChunkedVolume.open(str(tmp_path / "seg_clean")).load_seg(size=sh)

    # crashed run: the 5th chunk's label encoding raises (hit by both the
    # serial and the sharded-slab path)
    failer = _FailOnce(oe.encode_chunk_labels, fail_at=5)
    monkeypatch.setattr(oe, "encode_chunk_labels", failer)
    with pytest.raises(RuntimeError):
        oe.from_probabilities_to_kd(
            src_p, str(tmp_path / "seg_resumed"), n_workers=1, **kw
        )
    failer.armed = False  # "restart": the fault disappears

    caplog.set_level(logging.INFO)
    oe.from_probabilities_to_kd(
        src_p, str(tmp_path / "seg_resumed"), n_workers=1, overwrite=False, **kw
    )
    assert any("resume:" in r.message for r in caplog.records), (
        "rerun must log skipped completed work"
    )
    resumed = ChunkedVolume.open(str(tmp_path / "seg_resumed")).load_seg(size=sh)
    assert np.array_equal(golden, resumed)


def _toy_wd(working_dir, tmp_path):
    from syconn_tpu import global_params
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.handler.config import generate_default_conf
    from syconn_tpu.io.graph import save_svgraph
    from syconn_tpu.utils.testdata import generate_toy_world

    clear_kd_cache()
    generate_default_conf(
        working_dir, scaling=(10, 10, 20),
        key_value_pairs=[
            ("min_cc_size_ssv", 200),
            ("syntype_avail", True),
            ("cell_objects", {
                "extract_morph_op": {"mi": ["binary_closing"], "vc": ["binary_closing"], "sj": []},
                "min_obj_vx": {"mi": 100, "vc": 50, "sj": 20, "cs": 1, "syn": 1},
                "sizethresholds": {"mi": 100, "vc": 50, "sj": 20},
            }),
        ],
        force_overwrite=True,
    )
    global_params.config._parse_config()
    world = generate_toy_world(shape=(96, 96, 48), n_cells=3, svs_per_cell=2, seed=0)
    cfg = global_params.config
    kd = ChunkedVolume.create(
        cfg.kd_seg_path, scale=(10, 10, 20), boundary=world["seg"].shape,
        chunk_shape=(64, 64, 64),
    )
    kd.save_raw(world["raw"])
    kd.save_seg(world["seg"])
    for co in ["mi", "vc", "sj", "sym", "asym"]:
        data = world[co] if co in world else (world["sj"] * 0)
        cv = ChunkedVolume.create(
            getattr(cfg, f"kd_{co}_path"), scale=(10, 10, 20),
            boundary=world["seg"].shape, chunk_shape=(64, 64, 64),
        )
        cv.save_raw(data)
    save_svgraph(world["rag"], cfg.init_svgraph_path)
    return world


def test_sd_props_resume(tmp_path, working_dir, caplog, monkeypatch):
    from syconn_tpu import global_params
    from syconn_tpu.proc import sd_proc
    from syconn_tpu.reps.segmentation import SegmentationDataset

    _toy_wd(working_dir, tmp_path)
    cfg = global_params.config
    org_paths = {}
    for co in ["mi", "vc"]:
        from syconn_tpu.extraction.object_extraction import generate_subcell_kd_from_proba

        generate_subcell_kd_from_proba(co, chunk_size=(48, 48, 48))
        org_paths[co] = cfg.kd_organelle_seg_paths[co]

    kw = dict(chunk_shape=(48, 48, 48))
    counts_clean = sd_proc.map_subcell_extract_props(
        cfg.kd_seg_path, org_paths, **kw
    )
    sd_sv = SegmentationDataset("sv", working_dir=working_dir)
    golden_ids = sd_sv.ids.copy()
    golden_sizes = sd_sv.sizes.copy()

    # crash on the 3rd chunk's meshing, then resume
    failer = _FailOnce(sd_proc.find_meshes, fail_at=5)
    monkeypatch.setattr(sd_proc, "find_meshes", failer)
    with pytest.raises(RuntimeError):
        sd_proc.map_subcell_extract_props(
            cfg.kd_seg_path, org_paths, n_workers=1, **kw
        )
    failer.armed = False

    caplog.set_level(logging.INFO, logger="syconn_tpu.stepcache")
    counts_resumed = sd_proc.map_subcell_extract_props(
        cfg.kd_seg_path, org_paths, n_workers=1, overwrite=False, **kw
    )
    assert any("resume:" in r.message for r in caplog.records)
    assert counts_resumed == counts_clean
    sd_sv2 = SegmentationDataset("sv", working_dir=working_dir)
    assert np.array_equal(sd_sv2.load_numpy_data("id"), golden_ids)
    assert np.array_equal(sd_sv2.load_numpy_data("size"), golden_sizes)


def test_contact_extraction_resume(tmp_path, working_dir, caplog, monkeypatch):
    from syconn_tpu import global_params
    from syconn_tpu.extraction import cs_extraction
    from syconn_tpu.reps.segmentation import SegmentationDataset

    _toy_wd(working_dir, tmp_path)
    cfg = global_params.config
    sh = tuple(ChunkedVolume.open(cfg.kd_seg_path).boundary)

    stats_clean = cs_extraction.extract_contact_sites(chunk_shape=(48, 48, 48))
    golden_cs = ChunkedVolume.open(
        f"{cfg.working_dir}/knossosdatasets/cs_seg"
    ).load_seg(size=sh)
    sd_syn = SegmentationDataset("syn", working_dir=working_dir)
    golden_syn_ids = np.sort(sd_syn.ids).copy()

    failer = _FailOnce(cs_extraction.extract_cs_syntype, fail_at=2)
    monkeypatch.setattr(cs_extraction, "extract_cs_syntype", failer)
    with pytest.raises(RuntimeError):
        cs_extraction.extract_contact_sites(chunk_shape=(48, 48, 48), n_workers=1)
    failer.armed = False

    caplog.set_level(logging.INFO, logger="syconn_tpu.cs_extraction")
    stats_resumed = cs_extraction.extract_contact_sites(
        chunk_shape=(48, 48, 48), n_workers=1, overwrite=False
    )
    assert any("resume:" in r.message for r in caplog.records)
    assert stats_resumed == stats_clean
    cs_resumed = ChunkedVolume.open(
        f"{cfg.working_dir}/knossosdatasets/cs_seg"
    ).load_seg(size=sh)
    assert np.array_equal(golden_cs, cs_resumed)
    sd_syn2 = SegmentationDataset("syn", working_dir=working_dir)
    assert np.array_equal(np.sort(sd_syn2.ids), golden_syn_ids)
