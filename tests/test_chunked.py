import numpy as np

from syconn_tpu.io.chunked import ChunkedVolume


def test_raw_roundtrip(tmp_path, rng):
    p = str(tmp_path / "vol")
    data = rng.integers(0, 255, size=(100, 120, 80), dtype=np.uint8)
    cv = ChunkedVolume.create(p, scale=(10, 10, 20), boundary=data.shape, chunk_shape=(64, 64, 64))
    cv.save_raw(data)
    got = cv.load_raw(size=data.shape)
    assert np.array_equal(got, data)
    # sub-region read
    sub = cv.load_raw(offset=(10, 20, 30), size=(50, 40, 30))
    assert np.array_equal(sub, data[10:60, 20:60, 30:60])


def test_seg_roundtrip_and_reopen(tmp_path, rng):
    p = str(tmp_path / "vol_seg")
    data = rng.integers(0, 1 << 40, size=(70, 60, 50)).astype(np.uint64)
    cv = ChunkedVolume.create(p, scale=(10, 10, 20), boundary=data.shape, chunk_shape=(32, 32, 32))
    cv.save_seg(data)
    cv2 = ChunkedVolume.open(p)
    got = cv2.load_seg(size=data.shape)
    assert np.array_equal(got, data)
    assert got.dtype == np.uint64


def test_unaligned_writes(tmp_path, rng):
    p = str(tmp_path / "vol_un")
    cv = ChunkedVolume.create(p, scale=(1, 1, 1), boundary=(100, 100, 100), chunk_shape=(32, 32, 32))
    a = rng.integers(0, 255, size=(40, 40, 40), dtype=np.uint8)
    b = rng.integers(0, 255, size=(40, 40, 40), dtype=np.uint8)
    cv.save_raw(a, offset=(5, 5, 5))
    cv.save_raw(b, offset=(30, 30, 30))
    got = cv.load_raw(size=(100, 100, 100))
    expect = np.zeros((100, 100, 100), np.uint8)
    expect[5:45, 5:45, 5:45] = a
    expect[30:70, 30:70, 30:70] = b
    assert np.array_equal(got, expect)


def test_mags(tmp_path, rng):
    p = str(tmp_path / "vol_mag")
    data = rng.integers(0, 10, size=(64, 64, 64)).astype(np.uint64)
    cv = ChunkedVolume.create(p, scale=(10, 10, 20), boundary=data.shape, chunk_shape=(32, 32, 32))
    cv.save_seg(data, mags=[1, 2, 4])
    m2 = cv.load_seg(size=(32, 32, 32), mag=2)
    assert np.array_equal(m2, data[::2, ::2, ::2])
    m4 = cv.load_seg(size=(16, 16, 16), mag=4)
    assert np.array_equal(m4, data[::4, ::4, ::4])
    assert sorted(cv.available_mags) == [1, 2, 4]


def test_initialize_from_matrix(tmp_path, rng):
    import h5py

    h5p = str(tmp_path / "raw.h5")
    data = rng.integers(0, 255, size=(50, 60, 70), dtype=np.uint8)
    with h5py.File(h5p, "w") as f:
        f.create_dataset("raw", data=data)
    p = str(tmp_path / "vol_h5")
    cv = ChunkedVolume.initialize_from_matrix(
        p, scale=(10, 10, 20), experiment_name="test", data_path=h5p,
        hdf5_names=["raw"], mags=[1, 2], chunk_shape=(32, 32, 32),
    )
    assert np.array_equal(cv.load_raw(size=data.shape), data)
    assert np.array_equal(cv.boundary, data.shape)


def test_missing_chunks_zero(tmp_path):
    p = str(tmp_path / "vol_z")
    cv = ChunkedVolume.create(p, scale=(1, 1, 1), boundary=(64, 64, 64), chunk_shape=(32, 32, 32))
    got = cv.load_raw(size=(64, 64, 64))
    assert got.sum() == 0
