import numpy as np
import pytest

from syconn_tpu.mesh.surface_nets import mesh_area, simplify_mesh, surface_net_mesh
from syconn_tpu.ops.cc import (
    connected_components,
    encode_chunk_labels,
    face_merge_pairs,
    merge_pairs_to_map,
    watershed_from_seeds,
)
from syconn_tpu.ops.morphology import (
    apply_morphological_operations,
    get_aniso_struct,
    multi_mop_backgroundonly,
)


def test_connected_components():
    m = np.zeros((10, 10, 10), bool)
    m[1:3, 1:3, 1:3] = True
    m[6:9, 6:9, 6:9] = True
    lab, n = connected_components(m)
    assert n == 2
    assert len(np.unique(lab)) == 3


def test_watershed_splits_touching_blobs():
    m = np.zeros((20, 10, 10), bool)
    m[2:9, 2:8, 2:8] = True
    m[9:17, 2:8, 2:8] = True  # one connected slab
    seeds = np.zeros((20, 10, 10), np.uint32)
    seeds[4, 5, 5] = 1
    seeds[14, 5, 5] = 2
    out = watershed_from_seeds(m, seeds)
    assert set(np.unique(out)) == {0, 1, 2}
    assert (out > 0).sum() == m.sum()  # all mask voxels assigned
    assert out[3, 5, 5] == 1 and out[16, 5, 5] == 2


def test_union_find_merge():
    labels = np.array([1, 2, 3, 10, 11], np.uint64)
    pairs = np.array([[1, 2], [10, 11]], np.uint64)
    mm = merge_pairs_to_map(labels, pairs)
    assert mm[1] == mm[2] != mm[3]
    assert mm[10] == mm[11]
    assert sorted(set(mm.values())) == [1, 2, 3]


def test_face_merge_pairs():
    a = np.array([[1, 0], [2, 2]], np.uint64)
    b = np.array([[5, 9], [0, 7]], np.uint64)
    pairs = face_merge_pairs(a, b)
    assert {(int(x), int(y)) for x, y in pairs} == {(1, 5), (2, 7)}


def test_aniso_struct():
    s = get_aniso_struct((10, 10, 20))
    assert s.shape == (5, 5, 3)
    assert s[2, 2, 0] and s[2, 2, 2]  # z neighbors present
    assert s[:, :, 1].sum() > s[:, :, 0].sum()  # wider in-plane


def test_multi_mop_backgroundonly():
    seg = np.zeros((10, 10, 10), np.uint64)
    seg[2:5, 2:5, 2:5] = 1
    seg[6, 2, 2] = 2
    out = multi_mop_backgroundonly("binary_dilation", seg, iterations=1)
    # label 1 grew into background
    assert (out == 1).sum() > (seg == 1).sum()
    # existing foreground never overwritten
    assert np.all(out[seg != 0] == seg[seg != 0])


# ------------------------------------------------------------ surface nets
def test_surface_net_cube_mesh():
    m = np.zeros((12, 12, 12), bool)
    m[2:9, 2:9, 2:9] = True  # 7-voxel cube
    ind, vert, norm = surface_net_mesh(m, scale=(1, 1, 1))
    v = vert.reshape(-1, 3)
    f = ind.reshape(-1, 3)
    assert len(v) > 0 and len(f) > 0
    # closed surface: every directed edge appears exactly once (manifold)
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    keys = edges[:, 0].astype(np.int64) * len(v) + edges[:, 1]
    rev = edges[:, 1].astype(np.int64) * len(v) + edges[:, 0]
    assert len(np.unique(keys)) == len(keys)
    assert set(keys.tolist()) == set(rev.tolist())
    # area close to cube surface 6*7^2 = 294 (surface nets round corners)
    area_um2 = mesh_area(ind, vert) * 1e6
    assert 200 < area_um2 < 300
    # vertices inside the bounding region
    assert v.min() >= 1.0 and v.max() <= 9.0


def test_surface_net_offset_scale():
    m = np.zeros((6, 6, 6), bool)
    m[2:4, 2:4, 2:4] = True
    ind, vert, _ = surface_net_mesh(m, offset=(100, 0, 0), scale=(10, 10, 20))
    v = vert.reshape(-1, 3)
    assert v[:, 0].min() >= 1000  # offset applied in nm
    assert v[:, 2].max() <= 6 * 20


def test_simplify_mesh():
    m = np.zeros((20, 20, 20), bool)
    m[2:18, 2:18, 2:18] = True
    ind, vert, _ = surface_net_mesh(m, scale=(1, 1, 1))
    ind2, vert2 = simplify_mesh(ind, vert, cell_size_nm=4.0)
    assert len(vert2) < len(vert)
    assert len(ind2) < len(ind)
    # area roughly preserved
    a1, a2 = mesh_area(ind, vert), mesh_area(ind2, vert2)
    assert abs(a1 - a2) / a1 < 0.35


# ----------------------------------------------------- extraction pipeline
def test_from_probabilities_to_kd(tmp_path, working_dir):
    from syconn_tpu.extraction.object_extraction import from_probabilities_to_kd
    from syconn_tpu.io.chunked import ChunkedVolume

    # synthetic prob map: two blobs, one crossing a chunk border
    sh = (64, 64, 32)
    prob = np.zeros(sh, np.uint8)
    prob[10:20, 10:20, 10:20] = 255
    prob[28:40, 28:40, 8:24] = 255  # crosses x=32 border with chunk (32,32,32)
    src_p = str(tmp_path / "prob")
    src = ChunkedVolume.create(src_p, scale=(10, 10, 20), boundary=sh, chunk_shape=(32, 32, 32))
    src.save_raw(prob)

    stats = from_probabilities_to_kd(
        src_p,
        str(tmp_path / "seg_out"),
        thresh_uint8=128,
        morph_ops=[],
        chunk_shape=(32, 32, 32),
    )
    assert stats["n_objects"] == 2
    seg = ChunkedVolume.open(str(tmp_path / "seg_out")).load_seg(size=sh)
    ids = set(np.unique(seg)) - {0}
    assert ids == {1, 2}
    # the cross-border object has ONE consistent id
    assert len(np.unique(seg[28:40, 28:40, 8:24])) == 1
    assert (seg[10:20, 10:20, 10:20] > 0).all()
    # voxel-exact against the thresholded mask
    assert np.array_equal(seg > 0, prob >= 128)


def test_extraction_with_watershed_split(tmp_path, working_dir):
    from syconn_tpu.extraction.object_extraction import from_probabilities_to_kd
    from syconn_tpu.io.chunked import ChunkedVolume

    # two touching slabs -> erosion-seeded watershed must split them
    sh = (40, 24, 24)
    prob = np.zeros(sh, np.uint8)
    prob[4:19, 4:20, 4:20] = 255
    prob[19:36, 4:20, 4:20] = 255  # touching -> 1 CC without watershed
    prob[17:21, :, :] = 200  # weaker neck at the junction (still above thresh)
    src_p = str(tmp_path / "prob_ws")
    src = ChunkedVolume.create(src_p, scale=(10, 10, 10), boundary=sh, chunk_shape=(64, 64, 64))
    src.save_raw(prob)

    # plain CC: one object
    stats_cc = from_probabilities_to_kd(
        src_p, str(tmp_path / "seg_cc"), thresh_uint8=128, morph_ops=[], chunk_shape=(64, 64, 64)
    )
    assert stats_cc["n_objects"] == 1
