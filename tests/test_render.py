"""Renderer tests, modeled on the reference's golden render tests
(tests/test_render.py: determinism + backend-equivalence tolerances)."""

import numpy as np
import pytest

from syconn_tpu.render.raster import BACKGROUND, SplatRenderer, render_views_splat


def _sphere_points(center, r, n=20000, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return center + r * v


def test_depth_view_sphere():
    center = np.array([5000.0, 5000.0, 5000.0])
    pts = _sphere_points(center, 2000.0)
    depth, index = render_views_splat(
        pts, center[None], comp_window=8000.0, ws=(128, 64), nb_views=1
    )
    d = depth[0, 0]
    fg = d < BACKGROUND
    assert fg.mean() > 0.1  # sphere visible
    # center pixels are nearer (smaller depth) than rim pixels
    cx, cy = 64, 32
    assert d[cx, cy] < np.percentile(d[fg], 80)
    # background outside the sphere
    assert d[0, 0] == BACKGROUND
    assert index[0, 0][~fg].max() == -1


def test_zbuffer_occlusion():
    # two parallel walls; the nearer one must win everywhere they overlap
    xs, ys = np.meshgrid(np.linspace(-900, 900, 60), np.linspace(-450, 450, 30))
    near = np.stack([xs.ravel(), ys.ravel(), np.full(xs.size, -500.0)], 1)
    far = np.stack([xs.ravel(), ys.ravel(), np.full(xs.size, 500.0)], 1)
    pts = np.concatenate([near, far])
    depth, index = render_views_splat(
        pts, np.zeros((1, 3)), comp_window=2000.0, ws=(64, 32), nb_views=1
    )
    ix = index[0, 0]
    covered = ix >= 0
    assert covered.mean() > 0.5
    # all winning vertices belong to the near wall (indices < len(near))
    assert ix[covered].max() < len(near)


def test_render_deterministic():
    pts = _sphere_points(np.zeros(3), 1000.0)
    locs = np.array([[0.0, 0, 0], [200.0, 0, 0]])
    d1, i1 = render_views_splat(pts, locs, comp_window=4000.0, ws=(64, 32), nb_views=2)
    d2, i2 = render_views_splat(pts, locs, comp_window=4000.0, ws=(64, 32), nb_views=2)
    assert np.array_equal(d1, d2)
    assert np.array_equal(i1, i2)


def test_views_rotate():
    # a bar along y: view 0 (identity) vs view 1 (rotated about x) differ
    ys = np.linspace(-1500, 1500, 5000)
    pts = np.stack([np.zeros_like(ys), ys, np.zeros_like(ys)], 1)
    pts += np.random.default_rng(0).normal(scale=30, size=pts.shape)
    depth, _ = render_views_splat(pts, np.zeros((1, 3)), comp_window=4000.0, ws=(64, 32), nb_views=2)
    assert not np.array_equal(depth[0, 0], depth[0, 1])


def test_semseg2mesh_via_views():
    from syconn_tpu.render.views import semseg2mesh_via_views

    index_views = np.array([[0, 1, 2, -1], [0, 0, 1, 2]])
    label_views = np.array([[1, 0, 2, 0], [1, 1, 0, 2]])
    out = semseg2mesh_via_views(index_views, label_views, n_vertices=4, n_classes=3,
                                unpredicted_label=9)
    assert out[0] == 1  # three votes for 1
    assert out[2] == 2
    assert out[3] == 9  # never seen -> unpredicted


def test_render_sso_coords(working_dir):
    """End-to-end: cell views from an assembled toy SSD."""
    from syconn_tpu import global_params
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.handler.config import generate_default_conf
    from syconn_tpu.exec.exec_init import (
        init_cell_subcell_sds,
        run_create_neuron_ssd,
        run_create_rag,
    )
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.io.graph import save_svgraph
    from syconn_tpu.render.views import render_sampled_sso, render_sso_coords_index_views
    from syconn_tpu.utils.testdata import generate_toy_world

    clear_kd_cache()
    generate_default_conf(working_dir, scaling=(10, 10, 20),
                          key_value_pairs=[("min_cc_size_ssv", 200)], force_overwrite=True)
    global_params.config._parse_config()
    global_params.config.entries["process_cell_organelles"] = []
    cfg = global_params.config
    world = generate_toy_world(shape=(96, 96, 48), n_cells=2, svs_per_cell=2, seed=5)
    kd = ChunkedVolume.create(cfg.kd_seg_path, scale=(10, 10, 20), boundary=world["seg"].shape,
                              chunk_shape=(96, 96, 48))
    kd.save_seg(world["seg"])
    save_svgraph(world["rag"], cfg.init_svgraph_path)
    init_cell_subcell_sds(chunk_size=(96, 96, 48), overwrite=True)
    run_create_rag()
    ssd = run_create_neuron_ssd()
    ssv = ssd.get_super_segmentation_object(int(ssd.ssv_ids[0]))
    views, locs = render_sampled_sso(ssv, ws=(64, 32), nb_views=2, comp_window=2000.0)
    assert views.ndim == 5 and views.shape[1] == 2 and views.shape[3:] == (64, 32)
    # cell channel has foreground
    assert (views[:, :, 0] < 255).any()
    idx = render_sso_coords_index_views(ssv, locs[:2], ws=(64, 32), nb_views=2, comp_window=2000.0)
    n_verts = len(ssv.mesh[1]) // 3
    assert idx.max() < n_verts
    assert (idx >= 0).any()
