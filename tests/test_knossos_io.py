"""KNOSSOS-native dataset interop (reference: knossos_utils usage across
syconn/handler/prediction.py; cube tree + knossos.conf + .seg.sz.zip)."""
import os

import numpy as np
import pytest


def test_snappy_roundtrip_and_copies():
    from syconn_tpu.io import snappy_py

    rng = np.random.default_rng(0)
    for n in [0, 1, 59, 60, 61, 1 << 8, (1 << 16) + 3, 300000]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert snappy_py.decompress(snappy_py.compress(data)) == data
    # hand-built stream with an overlapping copy (RLE): literal "ab" then
    # copy(offset=2, len=6) -> "abababab"
    stream = bytes([8]) + bytes([1 << 2]) + b"ab" + bytes([((6 - 4) << 2) | 1 | (0 << 5), 2])
    assert snappy_py.decompress(stream) == b"abababab"
    # corrupt offset must raise
    bad = bytes([4]) + bytes([((6 - 4) << 2) | 1, 9])
    with pytest.raises(ValueError):
        snappy_py.decompress(bad)


def test_knossos_conf_roundtrip(tmp_path):
    from syconn_tpu.io.knossos import parse_knossos_conf, write_knossos_conf

    d = str(tmp_path / "ds")
    write_knossos_conf(d, "toy world", (512, 256, 128), (9.0, 9.0, 21.0))
    conf = parse_knossos_conf(d)
    assert conf["experiment_name"] == "toy world"
    assert conf["boundary"] == [512, 256, 128]
    assert conf["scale"] == [9.0, 9.0, 21.0]
    assert conf["magnification"] == 1


def test_knossos_dataset_roundtrip(tmp_path):
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.io.knossos import export_to_knossos_dataset, import_knossos_dataset

    rng = np.random.default_rng(1)
    shape = (150, 140, 70)  # non-multiple of the 128 cube edge
    raw = rng.integers(0, 256, shape).astype(np.uint8)
    seg = np.zeros(shape, np.uint64)
    seg[10:80, 20:90, 5:40] = 7
    seg[90:140, 30:120, 10:60] = (1 << 40) + 3  # >32-bit label survives

    cv = ChunkedVolume.create(str(tmp_path / "cv"), scale=(10, 10, 20),
                              boundary=shape, experiment_name="toy",
                              chunk_shape=(64, 64, 32))
    cv.save_raw(raw, mags=[1])
    cv.save_seg(seg, mags=[1])

    kdir = str(tmp_path / "kns")
    export_to_knossos_dataset(cv, kdir, channel="raw")
    export_to_knossos_dataset(cv, kdir, channel="seg")
    assert os.path.isfile(os.path.join(kdir, "knossos.conf"))
    # seg cubes are zip-wrapped snappy; empty cubes skipped
    segs = [f for _r, _d, fs in os.walk(kdir) for f in fs if f.endswith(".seg.sz.zip")]
    assert len(segs) >= 1

    cv_r = import_knossos_dataset(kdir, str(tmp_path / "cv_raw"), channel="raw")
    cv_s = import_knossos_dataset(kdir, str(tmp_path / "cv_seg"), channel="seg")
    assert np.array_equal(cv_r.load_raw(size=shape), raw)
    assert np.array_equal(cv_s.load_seg(size=shape), seg)
    assert cv_r.experiment_name == "toy"
