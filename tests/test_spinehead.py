"""Spinehead volume extraction on a constructed spine scene.

Ground truth by construction: a dendrite shaft + thin neck + spherical
head; the computed ``spinehead_vol`` must match the constructed head
volume (reference algorithm: super_segmentation_helper.py:2068).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

SV_ID = 7
SSV_ID = 7
SYN_ID = 1


def _build_scene():
    """(seg, head_mask, neck_mask, shaft_mask, syn_coord) on a 128^3/64 grid."""
    shape = (128, 128, 64)
    x, y, z = np.mgrid[0 : shape[0], 0 : shape[1], 0 : shape[2]]
    shaft = (x >= 20) & (x < 110) & (y >= 20) & (y < 44) & (z >= 20) & (z < 44)
    neck = (
        (np.abs(x - 64) <= 2)
        & (y >= 44)
        & (y < 58)
        & (np.abs(z - 32) <= 2)
    )
    head = (x - 64) ** 2 + (y - 66) ** 2 + (z - 32) ** 2 <= 8**2
    seg = np.where(shaft | neck | head, SV_ID, 0).astype(np.uint64)
    syn_coord = np.array([64, 74, 32])  # on the head surface, far from neck
    return seg, head, neck, shaft, syn_coord


@pytest.fixture()
def spine_world(working_dir):
    from syconn_tpu import global_params
    from syconn_tpu.backend import AttributeDict, MeshStorage
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.handler.config import generate_default_conf
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.reps.rep_helper import subfold_from_ix
    from syconn_tpu.reps.segmentation import SegmentationDataset
    from syconn_tpu.reps.super_segmentation import SuperSegmentationObject

    clear_kd_cache()
    generate_default_conf(working_dir, scaling=(10, 10, 10), force_overwrite=True)
    global_params.wd = working_dir
    global_params.config._parse_config()
    cfg = global_params.config

    seg, head, neck, shaft, syn_coord = _build_scene()
    kd = ChunkedVolume.create(
        cfg.kd_seg_path, scale=(10, 10, 10), boundary=seg.shape, chunk_shape=(64, 64, 64)
    )
    kd.save_seg(seg)

    # cell surface mesh: boundary voxels of the mask, labeled by region
    from scipy import ndimage

    mask = seg > 0
    surf = mask & ~ndimage.binary_erosion(mask)
    sv_coords = np.argwhere(surf)
    labels = np.zeros(len(sv_coords), np.uint8)  # shaft/other = 0
    labels[head[tuple(sv_coords.T)]] = 1  # spine head
    labels[neck[tuple(sv_coords.T)]] = 2  # spine neck
    verts_nm = (sv_coords * 10.0).astype(np.float32)

    ssv = SuperSegmentationObject(SSV_ID, working_dir=working_dir)
    os.makedirs(ssv.ssv_dir, exist_ok=True)
    ms = MeshStorage(ssv.mesh_path("sv"), read_only=False, disable_locking=True)
    ms[SSV_ID] = [
        np.zeros(0, np.int64),
        verts_nm.reshape(-1),
        np.zeros(0, np.float32),
    ]
    ms.push()
    ssv.attr_dict.update(
        sv_ids=np.array([SV_ID], np.uint64),
        spiness_vertex_labels=labels,
        syn_ssv=np.array([SYN_ID], np.uint64),
    )
    ssv.save_attr_dict()

    # one syn_ssv object on the head
    sd_syn = SegmentationDataset(
        "syn_ssv", working_dir=working_dir, n_folders_fs=100, create=True
    )
    shard = subfold_from_ix(SYN_ID, 100)
    shard_dir = os.path.join(sd_syn.so_storage_path, shard.strip("/"))
    os.makedirs(shard_dir, exist_ok=True)
    ad = AttributeDict(
        os.path.join(shard_dir, "attr_dict.pkl"), read_only=False, disable_locking=True
    )
    ad[SYN_ID] = {
        "id": SYN_ID,
        "rep_coord": syn_coord,
        "size": 10,
        "bounding_box": np.array([syn_coord - 2, syn_coord + 2]),
        "neuron_partners": np.array([SSV_ID, 999], np.uint64),
    }
    ad.push()
    sd_syn.save_numpy_data("id", np.array([SYN_ID], np.uint64))
    sd_syn.save_numpy_data("rep_coord", np.array([syn_coord], np.int64))
    sd_syn.save_numpy_data("size", np.array([10], np.int64))
    return ssv, head


def test_spinehead_volume_matches_construction(spine_world):
    from syconn_tpu.reps.super_segmentation_helper import extract_spinehead_volume

    ssv, head = spine_world
    vols = extract_spinehead_volume(ssv, ctx_vol=(40, 40, 24))
    assert SYN_ID in vols, "spine-head synapse not measured"
    got = vols[SYN_ID]
    # constructed head volume in µm³ (1000 nm³ per voxel)
    expect = head.sum() * 1000.0 / 1e9
    # watershed places the head/neck boundary within a voxel or two of the
    # construction; accept 35% tolerance
    assert got == pytest.approx(expect, rel=0.35), (got, expect)
    assert ssv.attr_dict["spinehead_vol"][SYN_ID] == got


def test_spinehead_volume_skips_shaft_synapse(spine_world, working_dir):
    """A synapse on the shaft (spiness 0) must not get a head volume."""
    from syconn_tpu.backend import AttributeDict
    from syconn_tpu.reps.rep_helper import subfold_from_ix
    from syconn_tpu.reps.segmentation import SegmentationDataset
    from syconn_tpu.reps.super_segmentation_helper import extract_spinehead_volume

    ssv, _ = spine_world
    sd_syn = SegmentationDataset("syn_ssv", working_dir=working_dir)
    shaft_coord = np.array([40, 32, 32])
    syn2 = 2
    shard = subfold_from_ix(syn2, 100)
    shard_dir = os.path.join(sd_syn.so_storage_path, shard.strip("/"))
    os.makedirs(shard_dir, exist_ok=True)
    ad = AttributeDict(
        os.path.join(shard_dir, "attr_dict.pkl"), read_only=False, disable_locking=True
    )
    ad[syn2] = {
        "id": syn2,
        "rep_coord": shaft_coord,
        "size": 10,
        "bounding_box": np.array([shaft_coord - 2, shaft_coord + 2]),
    }
    ad.push()
    ssv.attr_dict["syn_ssv"] = np.array([SYN_ID, syn2], np.uint64)
    ssv.save_attr_dict()
    vols = extract_spinehead_volume(ssv, ctx_vol=(40, 40, 24))
    assert syn2 not in vols
    assert SYN_ID in vols
