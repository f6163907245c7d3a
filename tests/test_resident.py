"""HBM-resident volume store + device-resident pipeline paths.

The CPU test backend is not an accelerator, so resident mode is forced on
via SYCONN_TPU_RESIDENT=1. All resident paths must be bit-identical to
their disk-streaming counterparts.
"""

import numpy as np
import pytest


@pytest.fixture()
def resident_on(monkeypatch):
    from syconn_tpu.io import resident

    monkeypatch.setenv("SYCONN_TPU_RESIDENT", "1")
    monkeypatch.setattr(resident, "_TRIPPED", False)
    resident.clear()
    yield resident
    resident.clear()


def test_put_get_roundtrip_and_mag_derivation(tmp_path, resident_on):
    resident = resident_on
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (64, 32, 16), np.uint8)
    seg = rng.integers(0, 9, (64, 32, 16), np.uint64)

    assert resident.put(str(tmp_path / "v"), "raw", raw)
    assert resident.put(str(tmp_path / "v"), "seg", seg)
    got = np.asarray(resident.get(str(tmp_path / "v"), "raw"))
    assert np.array_equal(got, raw)
    # seg held as int32
    gs = np.asarray(resident.get(str(tmp_path / "v"), "seg"))
    assert gs.dtype == np.int32 and np.array_equal(gs, seg.astype(np.int32))

    # mag-2 derivation matches the chunked store's pyramid semantics
    from syconn_tpu.io.chunked import ChunkedVolume

    cv = ChunkedVolume.create(
        str(tmp_path / "cv"), scale=(10, 10, 20), boundary=raw.shape,
        chunk_shape=(32, 32, 16),
    )
    cv.save_raw(raw, mags=(1, 2))
    cv.save_seg(seg, mags=(1, 2))
    r2 = np.asarray(resident.get(str(tmp_path / "v"), "raw", mag=2))
    r2_disk = cv.load_raw(size=cv.mag_shape(2), mag=2)
    assert np.abs(r2.astype(int) - r2_disk.astype(int)).max() <= 1  # rounding
    s2 = np.asarray(resident.get(str(tmp_path / "v"), "seg", mag=2))
    s2_disk = cv.load_seg(size=cv.mag_shape(2), mag=2)
    assert np.array_equal(s2.astype(np.uint64), s2_disk)

    assert resident.drop(str(tmp_path / "v")) >= 2
    assert resident.get(str(tmp_path / "v"), "raw") is None


def test_budget_refusal(tmp_path, resident_on, monkeypatch):
    from syconn_tpu.io import resident as resident_mod

    resident = resident_on
    monkeypatch.setattr(resident_mod, "_budget_bytes", lambda: 100_000)
    big = np.zeros((128, 128, 16), np.uint8)  # 256 KB
    assert not resident.put(str(tmp_path / "big"), "raw", big)
    small = np.zeros((32, 32, 16), np.uint8)
    assert resident.put(str(tmp_path / "small"), "raw", small)


def test_resident_contact_extraction_identical(tmp_path, working_dir, resident_on):
    """extract_contact_sites from an HBM-resident segmentation (sparse
    compacted readback) == the host kernel path, voxel-exact."""
    from syconn_tpu import global_params
    from syconn_tpu.extraction.cs_extraction import extract_contact_sites
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.handler.config import generate_default_conf
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.reps.segmentation import SegmentationDataset

    resident = resident_on
    clear_kd_cache()
    sh = (96, 64, 48)
    seg = np.zeros(sh, np.uint64)
    seg[4:46, 4:60, 4:44] = 7
    seg[48:92, 4:60, 4:44] = 9
    sj = np.zeros(sh, np.uint8)
    sj[40:54, 20:40, 10:30] = 255

    def build_wd(wd):
        generate_default_conf(
            wd, scaling=(10, 10, 20),
            key_value_pairs=[
                ("syntype_avail", True),
                ("cell_objects", {"min_obj_vx": {"cs": 1, "syn": 1}}),
                ("tpu", {"shard_pipeline": False}),  # exercise 1-chip path
            ],
            force_overwrite=True,
        )
        global_params.wd = wd
        cfg = global_params.config
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
        return cfg

    cfg = build_wd(working_dir)
    r_host = extract_contact_sites(chunk_shape=(32, 64, 48))
    cs_host = ChunkedVolume.open(
        f"{cfg.working_dir}/knossosdatasets/cs_seg"
    ).load_seg(size=sh)
    syn_ids_host = np.sort(SegmentationDataset("syn", working_dir=working_dir).ids)

    wd2 = str(tmp_path / "wd_res")
    clear_kd_cache()
    cfg2 = build_wd(wd2)
    assert resident.put(cfg2.kd_seg_path, "seg", seg)
    r_res = extract_contact_sites(chunk_shape=(32, 64, 48))
    assert r_res == r_host
    cs_res = ChunkedVolume.open(
        f"{cfg2.working_dir}/knossosdatasets/cs_seg"
    ).load_seg(size=sh)
    assert np.array_equal(cs_host, cs_res)
    syn_ids_res = np.sort(SegmentationDataset("syn", working_dir=wd2).ids)
    assert np.array_equal(syn_ids_host, syn_ids_res)


def test_resident_object_extraction_identical(tmp_path, working_dir, resident_on):
    """from_probabilities_to_kd from an HBM-resident probability map (device
    blur/threshold/morphology, packed readback) == the host chain."""
    from syconn_tpu import global_params
    from syconn_tpu.extraction.object_extraction import from_probabilities_to_kd
    from syconn_tpu.handler.config import generate_default_conf
    from syconn_tpu.io.chunked import ChunkedVolume

    resident = resident_on
    generate_default_conf(
        working_dir, scaling=(10, 10, 20),
        key_value_pairs=[("tpu", {"shard_pipeline": False})],
        force_overwrite=True,
    )
    global_params.wd = working_dir

    sh = (96, 48, 48)
    rng = np.random.default_rng(3)
    prob = (rng.random(sh) * 255).astype(np.uint8)
    prob[10:40, 10:40, 10:40] = 255
    prob[50:90, 8:30, 8:30] = 230
    src_p = str(tmp_path / "prob")
    src = ChunkedVolume.create(src_p, scale=(10, 10, 20), boundary=sh, chunk_shape=(32, 48, 48))
    src.save_raw(prob)

    kw = dict(thresh_uint8=128, morph_ops=["binary_closing", "binary_erosion"],
              min_seed_vx=2, chunk_shape=(32, 48, 48), mesh=None)
    from_probabilities_to_kd(src_p, str(tmp_path / "seg_host"), **kw)
    a = ChunkedVolume.open(str(tmp_path / "seg_host")).load_seg(size=sh)

    assert resident.put(src_p, "raw", prob)
    from_probabilities_to_kd(src_p, str(tmp_path / "seg_res"), **kw)
    b = ChunkedVolume.open(str(tmp_path / "seg_res")).load_seg(size=sh)
    assert a.max() > 0
    assert np.array_equal(a, b)


def test_device_worldgen_passthrough(resident_on):
    """Device-generated worlds hand their in-HBM fields to the caller
    (world['_device']) consistent with the host copies."""
    from syconn_tpu.utils.testdata import generate_toy_world

    w = generate_toy_world(shape=(64, 64, 32), n_cells=3, device=True)
    dev = w.get("_device") or {}
    assert "seg" in dev and "mi" in dev and "sj" in dev
    assert np.array_equal(np.asarray(dev["seg"]), w["seg"].astype(np.int32))
    for co in ("mi", "vc", "sj"):
        assert np.array_equal(np.asarray(dev[co]), w[co])


def test_resident_props_scanner_identical(resident_on):
    """ResidentPropsScanner == the host scan, including boundary chunks and
    the >4096-labels growth path."""
    import jax.numpy as jnp

    from syconn_tpu.ops.props import object_properties_arrays
    from syconn_tpu.ops.props_jax import ResidentPropsScanner

    rng = np.random.default_rng(7)
    sh = (70, 48, 40)  # not a chunk multiple -> boundary windows
    vol = rng.integers(0, 50, sh).astype(np.uint32)
    scanner = ResidentPropsScanner(jnp.asarray(vol.astype(np.int32)), chunk=(32, 32, 32))
    for cix in [(0, 0, 0), (1, 0, 0), (2, 1, 1)]:
        off = np.array(cix) * 32
        size = np.minimum(32, np.array(sh) - off)
        chunk = vol[off[0]:off[0] + size[0], off[1]:off[1] + size[1], off[2]:off[2] + size[2]]
        ids_h, rep_h, bb_h, sz_h = object_properties_arrays(chunk)
        ids_d, rep_d, bb_d, sz_d = scanner.props(cix)
        assert np.array_equal(ids_h.astype(np.uint64), ids_d)
        assert np.array_equal(rep_h, rep_d)
        assert np.array_equal(bb_h, bb_d)
        assert np.array_equal(sz_h, sz_d)

    # dense-label growth: > 4096 unique ids in one chunk
    dense = (np.arange(32 * 32 * 32, dtype=np.uint32).reshape(32, 32, 32) // 4) + 1
    big = np.zeros((64, 32, 32), np.uint32)
    big[:32] = dense
    scanner2 = ResidentPropsScanner(jnp.asarray(big.astype(np.int32)), chunk=(32, 32, 32))
    ids_h, rep_h, bb_h, sz_h = object_properties_arrays(dense)
    ids_d, rep_d, bb_d, sz_d = scanner2.props((0, 0, 0))
    assert len(ids_d) > 4096
    assert np.array_equal(ids_h.astype(np.uint64), ids_d)
    assert np.array_equal(sz_h, sz_d)


def test_resident_dense_prediction_identical(tmp_path, resident_on):
    """predict_dense_to_kd from a resident source: outputs on disk match
    the streaming path bit-for-bit, and per-class outputs register
    resident."""
    import os

    from syconn_tpu.inference.dense import predict_dense_to_kd
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.models.io import init_model_params
    from syconn_tpu.models.unet3d import UNet3D, unet_variants

    resident = resident_on
    rng = np.random.default_rng(1)
    sh = (64, 64, 32)
    vol = rng.integers(0, 255, sh, np.uint8)
    src_p = str(tmp_path / "src")
    src = ChunkedVolume.create(src_p, scale=(10, 10, 20), boundary=sh, chunk_shape=(64, 64, 32))
    src.save_raw(vol)

    model = UNet3D(**unet_variants("organelles"))
    params = init_model_params(model, (1, 64, 64, 32, 1))
    kw = dict(
        model=model, params=params, channel_mapping={"mi": 1, "vc": 2},
        tile_shape=(64, 64, 32), halo=(16, 16, 8), target_mags=(1,),
        show_progress=False,
    )

    predict_dense_to_kd(src_p, {"mi": str(tmp_path / "miA"), "vc": str(tmp_path / "vcA")}, **kw)

    assert resident.put(src_p, "raw", vol)
    predict_dense_to_kd(src_p, {"mi": str(tmp_path / "miB"), "vc": str(tmp_path / "vcB")}, **kw)

    for name in ("mi", "vc"):
        a = ChunkedVolume.open(str(tmp_path / f"{name}A")).load_raw(size=sh)
        b = ChunkedVolume.open(str(tmp_path / f"{name}B")).load_raw(size=sh)
        assert np.array_equal(a, b), name
        # the class output is registered resident and matches disk
        dev = resident.get(str(tmp_path / f"{name}B"), "raw")
        assert dev is not None
        assert np.array_equal(np.asarray(dev), b)
