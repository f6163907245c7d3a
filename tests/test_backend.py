import os
import pickle

import numpy as np
import pytest

from syconn_tpu.backend import (
    AttributeDict,
    BinarySearchStore,
    CompressedStorage,
    MeshStorage,
    SkeletonStorage,
    VoxelStorage,
    VoxelStorageLazyLoading,
)


def test_attribute_dict_roundtrip(tmp_path):
    p = str(tmp_path / "attr_0.pkl")
    ad = AttributeDict(p, read_only=False)
    ad[1] = {"size": 10, "rep_coord": [1, 2, 3]}
    ad[2]["foo"] = "bar"  # auto-vivified entry
    ad.push()
    ad2 = AttributeDict(p, read_only=True)
    assert ad2[1]["size"] == 10
    assert ad2[2]["foo"] == "bar"
    assert 3 not in ad2
    assert len(ad2) == 2


def test_compressed_storage_roundtrip(tmp_path):
    p = str(tmp_path / "comp_0.pkl")
    cs = CompressedStorage(p, read_only=False)
    arr = np.random.default_rng(0).normal(size=(17, 5)).astype(np.float32)
    cs[7] = arr
    cs.push()
    cs2 = CompressedStorage(p, read_only=True)
    assert np.array_equal(cs2[7], arr)
    assert cs2[7].dtype == np.float32


def test_voxel_storage(tmp_path):
    p = str(tmp_path / "vx_0.pkl")
    vs = VoxelStorage(p, read_only=False)
    m1 = np.zeros((4, 4, 4), dtype=bool)
    m1[1:3, 1:3, 1:3] = True
    vs.append(5, m1, (10, 10, 10))
    vs.append(5, m1, (20, 20, 20))
    vs.push()
    vs2 = VoxelStorage(p, read_only=True)
    masks, offsets = vs2[5]
    assert len(masks) == 2
    assert np.array_equal(masks[0], m1)
    assert np.array_equal(offsets[1], [20, 20, 20])
    assert vs2.object_size(5) == 16


def test_voxel_storage_lazy(tmp_path):
    p = str(tmp_path / "vx_lazy.npz")
    arr = np.arange(90).reshape((30, 3))
    vl = VoxelStorageLazyLoading(p)
    assert len(vl) == 0
    vl[10] = arr
    vl.push()
    vl2 = VoxelStorageLazyLoading(p)
    assert 10 in vl2
    assert np.array_equal(vl2[10], arr)
    assert len(vl2) == 1


def test_mesh_storage(tmp_path):
    p = str(tmp_path / "mesh_0.pkl")
    ms = MeshStorage(p, read_only=False)
    ind = np.arange(9, dtype=np.int64)
    vert = np.random.default_rng(1).normal(size=(9,)).astype(np.float32)
    ms[3] = [ind, vert, np.zeros(0, np.float32)]
    ms.push()
    ms2 = MeshStorage(p, read_only=True)
    got = ms2[3]
    assert np.array_equal(got[0], ind)
    assert np.allclose(got[1], vert)


def test_skeleton_storage(tmp_path):
    p = str(tmp_path / "skel_0.pkl")
    ss = SkeletonStorage(p, read_only=False)
    skel = {
        "nodes": np.array([[0, 0, 0], [1, 1, 1]], np.float32),
        "edges": np.array([[0, 1]], np.int64),
        "diameters": np.array([1.0, 2.0], np.float32),
    }
    ss[9] = skel
    ss.push()
    ss2 = SkeletonStorage(p, read_only=True)
    got = ss2[9]
    for k in skel:
        assert np.array_equal(got[k], skel[k])


def test_read_only_enforced(tmp_path):
    p = str(tmp_path / "ro_0.pkl")
    cs = CompressedStorage(p, read_only=False)
    cs[1] = np.zeros(3)
    cs.push()
    ro = CompressedStorage(p, read_only=True)
    with pytest.raises(RuntimeError):
        ro[2] = np.ones(3)


def test_binary_search_store(tmp_path):
    rng = np.random.default_rng(0)
    n = 100_000
    ids = rng.choice(400_000, n, replace=False).astype(np.uint64)
    attr = {"ssv_ids": rng.integers(1, 1 << 40, n).astype(np.uint64)}
    p = str(tmp_path / "bst.h5")
    bss = BinarySearchStore(p, ids, attr, n_shards=5)
    assert bss.n_shards == 5
    assert np.array_equal(bss.id_array, np.sort(ids))
    sample = rng.permutation(n)[:1000]
    got = bss.get_attributes(ids[sample], "ssv_ids")
    assert np.array_equal(got, attr["ssv_ids"][sample])
    # pickling round-trip (workers receive the store by value)
    bss2 = pickle.loads(pickle.dumps(bss))
    got2 = bss2.get_attributes(ids[sample], "ssv_ids")
    assert np.array_equal(got2, attr["ssv_ids"][sample])
    with pytest.raises(KeyError):
        missing = np.setdiff1d(np.arange(500_000, 500_010, dtype=np.uint64), ids)
        bss.get_attributes(missing[:1], "ssv_ids")


def test_storage_locking(tmp_path):
    """Two writers to the same shard must serialize, not corrupt."""
    import multiprocessing as mp

    p = str(tmp_path / "locked_0.pkl")

    def writer(key):
        ad = AttributeDict(p, read_only=False, timeout=30)
        ad.pull()
        ad[key] = {"v": key}
        ad.push()

    procs = [mp.Process(target=writer, args=(k,)) for k in range(4)]
    for pr in procs:
        pr.start()
    for pr in procs:
        pr.join()
    ad = AttributeDict(p, read_only=True)
    # at least the last writer's key must be present and the file valid
    assert len(ad) >= 1
    for k in ad.keys():
        assert ad[k]["v"] == k
