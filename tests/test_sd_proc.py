import numpy as np
import pytest

from syconn_tpu.io.chunked import ChunkedVolume


@pytest.fixture()
def seg_world(working_dir, rng):
    """Cell seg with 2 SVs + one organelle type volume overlapping them."""
    from syconn_tpu import global_params

    sh = (64, 64, 32)
    cell = np.zeros(sh, np.uint64)
    cell[4:30, 4:60, 4:28] = 10
    cell[34:60, 4:60, 4:28] = 22
    mi = np.zeros(sh, np.uint64)
    mi[10:20, 10:20, 10:20] = 1  # inside sv 10
    mi[36:44, 10:20, 10:20] = 2  # inside sv 22
    mi[28:38, 30:40, 10:20] = 3  # straddles both
    cfg = global_params.config
    kd = ChunkedVolume.create(cfg.kd_seg_path, scale=(10, 10, 20), boundary=sh, chunk_shape=(32, 32, 32))
    kd.save_seg(cell)
    kd_mi = ChunkedVolume.create(
        cfg.kd_organelle_seg_paths["mi"], scale=(10, 10, 20), boundary=sh, chunk_shape=(32, 32, 32)
    )
    kd_mi.save_seg(mi)
    return dict(sh=sh, cell=cell, mi=mi)


def test_map_subcell_extract_props(seg_world, working_dir):
    from syconn_tpu import global_params
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.proc.sd_proc import dataset_analysis, map_subcell_extract_props
    from syconn_tpu.reps.segmentation import SegmentationDataset

    clear_kd_cache()
    cfg = global_params.config
    counts = map_subcell_extract_props(
        cfg.kd_seg_path,
        {"mi": cfg.kd_organelle_seg_paths["mi"]},
        chunk_shape=(32, 32, 32),
    )
    assert counts["sv"] == 2
    assert counts["mi"] == 3  # all three mi blobs exceed min_obj_vx (500)
    sd_sv = SegmentationDataset("sv", working_dir=working_dir)
    cell = seg_world["cell"]
    assert set(sd_sv.ids.tolist()) == {10, 22}
    sizes = dict(zip(sd_sv.ids.tolist(), sd_sv.sizes.tolist()))
    assert sizes[10] == int((cell == 10).sum())
    assert sizes[22] == int((cell == 22).sum())

    # organelle dataset with mapping ratios
    sd_mi = SegmentationDataset("mi", working_dir=working_dir)
    mi_ids = set(sd_mi.ids.tolist())
    mi = seg_world["mi"]
    expected = {int(i) for i in np.unique(mi) if i != 0 and (mi == i).sum() >= 500}
    assert mi_ids == expected
    so3 = sd_mi.get_segmentation_object(3)
    so3.load_attr_dict()
    m_ids = so3.attr_dict["mapping_ids"].tolist()
    m_ratios = so3.attr_dict["mapping_ratios"]
    assert set(m_ids) == {10, 22}
    # overlap ratios exact
    for mid, ratio in zip(m_ids, m_ratios):
        expect = ((mi == 3) & (cell == mid)).sum() / (mi == 3).sum()
        assert abs(ratio - expect) < 1e-9

    # SV got reverse mapping attrs
    so10 = sd_sv.get_segmentation_object(10)
    so10.load_attr_dict()
    assert 1 in so10.attr_dict["mapping_mi_ids"].tolist()

    # meshes exist and are plausible
    mesh = so10.mesh
    assert len(mesh[1]) > 0
    v = mesh[1].reshape(-1, 3)
    bb_nm = so10.bounding_box * np.array([10, 10, 20])
    assert v.min() >= bb_nm[0].min() - 100
    assert v.max() <= bb_nm[1].max() * 1.2 + 100

    # voxels via VoxelStorageDyn requery
    mask, off = so10.voxel_mask_offset()
    assert mask.sum() == sizes[10]

    # dataset_analysis collects attrs into npy caches
    dataset_analysis(sd_sv)
    sd_sv2 = SegmentationDataset("sv", working_dir=working_dir)
    assert set(sd_sv2.ids.tolist()) == {10, 22}
    assert sd_sv2.load_numpy_data("mapping_mi_ids") is not None


def test_sample_locations(seg_world, working_dir):
    from syconn_tpu import global_params
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.proc.sd_proc import map_subcell_extract_props
    from syconn_tpu.reps.segmentation import SegmentationDataset

    clear_kd_cache()
    cfg = global_params.config
    map_subcell_extract_props(cfg.kd_seg_path, {}, chunk_shape=(64, 64, 32))
    sd = SegmentationDataset("sv", working_dir=working_dir)
    so = sd.get_segmentation_object(10)
    locs = so.sample_locations()
    assert locs.shape[1] == 3 and len(locs) >= 1
