"""Production pipeline steps sharded over an 8-device mesh == serial.

The round-1 gap: mesh/halo machinery existed but no pipeline step ran
sharded. These tests run the *actual* production entry points (object
extraction, contact-site detection, the property scan, dense CNN
inference) over the 8 virtual CPU devices (conftest) and assert
bit-identical outputs to the serial path.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh


@pytest.fixture()
def sp_mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("sp",))


@pytest.fixture()
def data_mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("data",))


def _toy_seg(sh, rng, n_labels=6, blocks=40):
    """Blocky multi-label segmentation with plenty of contact surface."""
    seg = np.zeros(sh, np.uint32)
    for _ in range(blocks):
        o = [rng.integers(0, s - 4) for s in sh]
        e = [min(s, o[i] + int(rng.integers(4, 16))) for i, s in enumerate(sh)]
        seg[o[0]:e[0], o[1]:e[1], o[2]:e[2]] = rng.integers(1, n_labels + 1)
    return seg


def test_detect_cs_sharded_bitidentical(rng, sp_mesh):
    from syconn_tpu.ops.contacts import detect_cs
    from syconn_tpu.parallel.sharded import detect_cs_slab_sharded

    stencil = (13, 13, 7)
    h = (6, 6, 3)
    core = (64, 48, 24)  # 8 x-shards of 8
    padded_sh = tuple(core[i] + 2 * h[i] for i in range(3))
    seg = _toy_seg(padded_sh, rng)
    serial = detect_cs(seg, stencil=np.asarray(stencil, np.int32))
    sharded = detect_cs_slab_sharded(seg, sp_mesh, stencil=stencil)
    assert sharded.shape == serial.shape == core
    assert np.array_equal(sharded, serial)


def test_object_properties_sharded_identical(rng, sp_mesh):
    from syconn_tpu.ops.props import object_properties_arrays, pair_counts
    from syconn_tpu.parallel.sharded import (
        object_properties_sharded,
        pair_counts_sharded,
    )

    vol = _toy_seg((64, 32, 16), rng, n_labels=9)
    ids_s, rep_s, bb_s, sz_s = object_properties_arrays(vol)
    ids_m, rep_m, bb_m, sz_m = object_properties_sharded(vol, sp_mesh)
    assert np.array_equal(ids_s.astype(np.uint64), ids_m.astype(np.uint64))
    assert np.array_equal(rep_s, rep_m)
    assert np.array_equal(bb_s, bb_m)
    assert np.array_equal(sz_s, sz_m)

    other = _toy_seg((64, 32, 16), rng, n_labels=5)
    a_s, b_s, c_s = pair_counts(vol, other)
    a_m, b_m, c_m = pair_counts_sharded(vol, other, sp_mesh)
    assert np.array_equal(a_s.astype(np.uint64), a_m.astype(np.uint64))
    assert np.array_equal(b_s.astype(np.uint64), b_m.astype(np.uint64))
    assert np.array_equal(c_s, c_m)


def test_object_properties_sharded_dense_labels(rng, sp_mesh):
    """A dense segmentation holding far more than 4096 unique labels per
    shard must not hit a hard table cap: the padded device tables grow
    (one recompile) until every shard fits."""
    from syconn_tpu.ops.props import object_properties_arrays, pair_counts
    from syconn_tpu.parallel.sharded import (
        object_properties_sharded,
        pair_counts_sharded,
    )

    sh = (64, 96, 96)
    # ~6100 unique labels per 8-voxel-thick x-shard (> the old 4096 cap)
    vol = (np.arange(np.prod(sh), dtype=np.uint32).reshape(sh) // 12) + 1
    ids_s, rep_s, bb_s, sz_s = object_properties_arrays(vol)
    ids_m, rep_m, bb_m, sz_m = object_properties_sharded(vol, sp_mesh)
    assert len(ids_s) > 8 * 4096
    assert np.array_equal(ids_s.astype(np.uint64), ids_m.astype(np.uint64))
    assert np.array_equal(rep_s, rep_m)
    assert np.array_equal(bb_s, bb_m)
    assert np.array_equal(sz_s, sz_m)

    other = (vol % 7).astype(np.uint32) + 1  # one dense pair per vol label
    a_s, b_s, c_s = pair_counts(vol, other)
    a_m, b_m, c_m = pair_counts_sharded(vol, other, sp_mesh)
    assert len(a_s) > 8 * 4096
    assert np.array_equal(a_s.astype(np.uint64), a_m.astype(np.uint64))
    assert np.array_equal(b_s.astype(np.uint64), b_m.astype(np.uint64))
    assert np.array_equal(c_s, c_m)


def test_object_extraction_sharded_identical(tmp_path, working_dir, sp_mesh):
    """from_probabilities_to_kd with a mesh == serial, voxel-exact,
    including the erosion-seeded watershed path and cross-chunk stitching."""
    from syconn_tpu.extraction.object_extraction import from_probabilities_to_kd
    from syconn_tpu.io.chunked import ChunkedVolume

    sh = (128, 32, 24)
    prob = np.zeros(sh, np.uint8)
    prob[4:60, 4:28, 4:20] = 255     # crosses several 16-voxel x-chunks
    prob[60:124, 4:28, 4:20] = 255   # touching slab -> watershed split
    prob[58:62, :, :] = 200          # weaker neck
    src_p = str(tmp_path / "prob")
    src = ChunkedVolume.create(
        src_p, scale=(10, 10, 20), boundary=sh, chunk_shape=(16, 32, 32)
    )
    src.save_raw(prob)

    kw = dict(
        thresh_uint8=128,
        morph_ops=["binary_erosion"] * 2,
        min_seed_vx=5,
        chunk_shape=(16, 32, 32),
    )
    s1 = from_probabilities_to_kd(src_p, str(tmp_path / "seg_serial"), **kw)
    s2 = from_probabilities_to_kd(
        src_p, str(tmp_path / "seg_sharded"), mesh=sp_mesh, **kw
    )
    assert s1["n_objects"] == s2["n_objects"] > 0
    a = ChunkedVolume.open(str(tmp_path / "seg_serial")).load_seg(size=sh)
    b = ChunkedVolume.open(str(tmp_path / "seg_sharded")).load_seg(size=sh)
    assert np.array_equal(a, b)


def test_contact_extraction_sharded_identical(tmp_path, working_dir, sp_mesh):
    """extract_contact_sites with a mesh: the written cs label volume and
    the cs/syn datasets match the serial run exactly (slab + remainder
    chunks both exercised: 12 x-chunks over an 8-way mesh)."""
    from syconn_tpu import global_params
    from syconn_tpu.extraction.cs_extraction import extract_contact_sites
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.handler.config import generate_default_conf
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.reps.segmentation import SegmentationDataset

    clear_kd_cache()
    generate_default_conf(
        working_dir, scaling=(10, 10, 20),
        key_value_pairs=[
            ("syntype_avail", True),
            ("cell_objects", {"min_obj_vx": {"cs": 1, "syn": 1}}),
        ],
        force_overwrite=True,
    )
    global_params.config._parse_config()
    cfg = global_params.config

    sh = (96, 64, 48)
    seg = np.zeros(sh, np.uint64)
    seg[4:46, 4:60, 4:44] = 7
    seg[50:92, 4:60, 4:44] = 9
    sj = np.zeros(sh, np.uint8)
    sj[42:54, 20:40, 10:30] = 255
    kd = ChunkedVolume.create(
        cfg.kd_seg_path, scale=(10, 10, 20), boundary=sh, chunk_shape=(64, 64, 64)
    )
    kd.save_seg(seg)
    for name, data in [("sj", sj), ("sym", sj * 0), ("asym", sj)]:
        cv = ChunkedVolume.create(
            getattr(cfg, f"kd_{name}_path"), scale=(10, 10, 20),
            boundary=sh, chunk_shape=(64, 64, 64),
        )
        cv.save_raw(data)

    r = extract_contact_sites(chunk_shape=(8, 64, 48), mesh=sp_mesh)
    assert r["n_cs"] >= 1 and r["n_syn"] >= 1

    # the written contact segmentation must equal the serial whole-volume
    # detection (+ background-only closing/dilation applied per chunk is
    # deterministic, so compare against a serial extract run)
    cs_shard = ChunkedVolume.open(
        f"{cfg.working_dir}/knossosdatasets/cs_seg"
    ).load_seg(size=sh)
    sd_syn = SegmentationDataset("syn", working_dir=cfg.working_dir)
    ids_shard = np.sort(sd_syn.ids)
    sizes_shard = sd_syn.load_numpy_data("size")[np.argsort(sd_syn.ids)]

    # serial reference in a second working dir
    wd2 = str(tmp_path / "wd_serial")
    generate_default_conf(
        wd2, scaling=(10, 10, 20),
        key_value_pairs=[
            ("syntype_avail", True),
            ("cell_objects", {"min_obj_vx": {"cs": 1, "syn": 1}}),
        ],
    )
    prev = global_params.wd
    clear_kd_cache()
    try:
        global_params.wd = wd2
        cfg2 = global_params.config
        kd2 = ChunkedVolume.create(
            cfg2.kd_seg_path, scale=(10, 10, 20), boundary=sh, chunk_shape=(64, 64, 64)
        )
        kd2.save_seg(seg)
        for name, data in [("sj", sj), ("sym", sj * 0), ("asym", sj)]:
            cv = ChunkedVolume.create(
                getattr(cfg2, f"kd_{name}_path"), scale=(10, 10, 20),
                boundary=sh, chunk_shape=(64, 64, 64),
            )
            cv.save_raw(data)
        r2 = extract_contact_sites(chunk_shape=(8, 64, 48), mesh=None)
        assert (r2["n_cs"], r2["n_syn"]) == (r["n_cs"], r["n_syn"])
        cs_serial = ChunkedVolume.open(
            f"{cfg2.working_dir}/knossosdatasets/cs_seg"
        ).load_seg(size=sh)
        assert np.array_equal(cs_shard, cs_serial)
        sd2 = SegmentationDataset("syn", working_dir=wd2)
        assert np.array_equal(np.sort(sd2.ids), ids_shard)
        assert np.array_equal(
            sd2.load_numpy_data("size")[np.argsort(sd2.ids)], sizes_shard
        )
    finally:
        global_params.wd = prev
        clear_kd_cache()


def test_dense_prediction_data_sharded_identical(tmp_path, rng, data_mesh):
    """predict_dense_to_kd with the tile batch sharded over 'data' == serial."""
    from syconn_tpu.inference.dense import DenseTilePredictor, predict_dense_to_kd
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.models.io import init_model_params
    from syconn_tpu.models.unet3d import UNet3D

    src_p = str(tmp_path / "src")
    vol = rng.integers(0, 255, (64, 64, 32), dtype=np.uint8)
    src = ChunkedVolume.create(
        src_p, scale=(10, 10, 20), boundary=vol.shape, chunk_shape=(32, 32, 32)
    )
    src.save_raw(vol)

    model = UNet3D(features=(16, 32), strides=((2, 2, 2),), patch=(2, 2, 2), n_classes=3)
    params = init_model_params(model, (1, 32, 32, 32, 1))
    kw = dict(
        model=model, params=params, channel_mapping={"a": 1},
        tile_shape=(32, 32, 32), halo=(8, 8, 8), target_mags=(1,),
    )
    predict_dense_to_kd(src_p, target_paths={"a": str(tmp_path / "serial")}, **kw)
    predict_dense_to_kd(
        src_p, target_paths={"a": str(tmp_path / "sharded")}, mesh=data_mesh, **kw
    )
    a = ChunkedVolume.open(str(tmp_path / "serial")).load_raw(size=vol.shape)
    b = ChunkedVolume.open(str(tmp_path / "sharded")).load_raw(size=vol.shape)
    assert np.array_equal(a, b)

    # predictor-level: sharded batch == per-tile serial forward
    pred_m = DenseTilePredictor(
        model, params, tile_shape=(32, 32, 32), halo=(8, 8, 8), mesh=data_mesh
    )
    assert pred_m.batch_size == 8
    tiles = rng.integers(0, 255, (8, 48, 48, 48), dtype=np.uint8)
    pred_s = DenseTilePredictor(model, params, tile_shape=(32, 32, 32), halo=(8, 8, 8))
    out_m = pred_m.fetch(pred_m.dispatch(tiles))
    out_s = np.concatenate([pred_s.fetch(pred_s.dispatch(tiles[i:i + 1])) for i in range(8)])
    assert np.array_equal(out_m, out_s)
