"""Independent golden validation of the splat renderer.

Round-1 gap: tests/test_render.py checks the splat renderer against itself.
Here an independent pure-numpy TRIANGLE rasterizer (barycentric coverage at
pixel centers, z-buffer) renders the same scenes under the same orthographic
conventions, in the spirit of the reference's EGL-vs-OSMesa tolerance tests
(reference tests/test_render.py:84-120): coverage disagreement bounded by a
small fraction, depth deviation bounded on the common foreground.
"""

import numpy as np
import pytest

from syconn_tpu.render.raster import BACKGROUND, render_views_splat

WS = (128, 128)
WINDOW = 128.0  # nm -> 1 nm per pixel in x


def triangle_raster_golden(verts, faces, center, window, ws):
    """Reference orthographic triangle rasterizer (identity rotation).

    Projection conventions match render/raster.py:_splat_kernel:
    px = (x/window + .5) * W, py = (y/(window*H/W) + .5) * H,
    depth = z/window + .5 encoded as round(d * 254), background 255.
    Coverage is evaluated at pixel centers.
    """
    W, H = ws
    p = np.asarray(verts, np.float64) - np.asarray(center, np.float64)[None]
    px = (p[:, 0] / window + 0.5) * W
    py = (p[:, 1] / (window * H / W) + 0.5) * H
    pz = p[:, 2] / window + 0.5
    zbuf = np.full((W, H), np.inf)
    xs = np.arange(W) + 0.5
    ys = np.arange(H) + 0.5
    for tri in np.asarray(faces, np.int64).reshape(-1, 3):
        ax, ay, az = px[tri[0]], py[tri[0]], pz[tri[0]]
        bx, by, bz = px[tri[1]], py[tri[1]], pz[tri[1]]
        cx, cy, cz = px[tri[2]], py[tri[2]], pz[tri[2]]
        lo_x = max(0, int(np.floor(min(ax, bx, cx))))
        hi_x = min(W - 1, int(np.ceil(max(ax, bx, cx))))
        lo_y = max(0, int(np.floor(min(ay, by, cy))))
        hi_y = min(H - 1, int(np.ceil(max(ay, by, cy))))
        if lo_x > hi_x or lo_y > hi_y:
            continue
        den = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        if abs(den) < 1e-12:
            continue
        gx = xs[lo_x:hi_x + 1][:, None]
        gy = ys[lo_y:hi_y + 1][None, :]
        w0 = ((by - cy) * (gx - cx) + (cx - bx) * (gy - cy)) / den
        w1 = ((cy - ay) * (gx - cx) + (ax - cx) * (gy - cy)) / den
        w2 = 1.0 - w0 - w1
        cover = (w0 >= -1e-9) & (w1 >= -1e-9) & (w2 >= -1e-9)
        z = w0 * az + w1 * bz + w2 * cz
        ok = cover & (z >= 0) & (z <= 1)
        sub = zbuf[lo_x:hi_x + 1, lo_y:hi_y + 1]
        sub[ok & (z < sub)] = z[ok & (z < sub)]
    out = np.where(np.isfinite(zbuf), np.round(zbuf * 254.0), BACKGROUND)
    return out.astype(np.uint8)


def _splat(verts, center):
    depth, _ = render_views_splat(
        np.asarray(verts, np.float32), np.asarray([center], np.float32),
        comp_window=WINDOW, ws=WS, nb_views=1,
    )
    return depth[0, 0]


def _tessellated_quad(z, extent=40.0, step=1.0):
    """Dense triangulated quad at depth z (vertex spacing ~1 px)."""
    xs = np.arange(-extent, extent + step, step)
    ys = np.arange(-extent, extent + step, step)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    verts = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, z)], axis=1)
    n = len(xs)
    ix = np.arange(gx.size).reshape(n, n)
    a, b, c, d = ix[:-1, :-1], ix[1:, :-1], ix[:-1, 1:], ix[1:, 1:]
    faces = np.concatenate(
        [np.stack([a, b, c], -1).reshape(-1, 3), np.stack([b, d, c], -1).reshape(-1, 3)]
    )
    return verts, faces


def _compare(splat, golden, max_disagree=0.05, med_tol=2, affected_tol=0.05):
    """Reference-style tolerances (tests/test_render.py:102-120): bounded
    coverage disagreement, small median depth deviation, and a bounded
    fraction of 'affected' pixels (> 8 depth units off — the half-pixel
    boundary ring where splat and triangle-center coverage legitimately
    pick different surfaces)."""
    fg_s = splat != BACKGROUND
    fg_g = golden != BACKGROUND
    disagree = np.mean(fg_s != fg_g)
    assert disagree < max_disagree, f"coverage disagreement {disagree:.4f}"
    both = fg_s & fg_g
    assert both.sum() > 100
    diff = np.abs(splat[both].astype(int) - golden[both].astype(int))
    assert np.median(diff) <= med_tol, f"median depth diff {np.median(diff)}"
    affected = np.mean(diff > 8)
    assert affected < affected_tol, f"affected-pixel fraction {affected:.4f}"


def test_flat_quad_depth_analytic():
    """A flat quad at known z: splat depth equals the analytic encoding."""
    z = -20.0
    verts, faces = _tessellated_quad(z)
    splat = _splat(verts, (0.0, 0.0, 0.0))
    golden = triangle_raster_golden(verts, faces, (0.0, 0.0, 0.0), WINDOW, WS)
    expected = int(round((z / WINDOW + 0.5) * 254.0))
    fg = splat != BACKGROUND
    assert fg.sum() > 1000
    assert np.all(splat[fg] == expected)
    assert np.all(golden[golden != BACKGROUND] == expected)
    _compare(splat, golden)


def test_occlusion_two_quads():
    """Two overlapping quads: the nearer one must win in both renderers."""
    v1, f1 = _tessellated_quad(-30.0, extent=30.0)   # nearer (smaller z)
    v2, f2 = _tessellated_quad(10.0, extent=45.0)    # farther, larger
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)])
    splat = _splat(verts, (0.0, 0.0, 0.0))
    golden = triangle_raster_golden(verts, faces, (0.0, 0.0, 0.0), WINDOW, WS)
    _compare(splat, golden)
    near = int(round((-30.0 / WINDOW + 0.5) * 254.0))
    # center pixel shows the NEAR quad in both
    assert splat[WS[0] // 2, WS[1] // 2] == near
    assert golden[WS[0] // 2, WS[1] // 2] == near


def test_sphere_mesh_golden():
    """Surface-net sphere: splat vs triangle rasterization within tolerance
    and within quantization error of the analytic sphere depth."""
    from syconn_tpu.mesh.surface_nets import surface_net_mesh

    r_vx = 24
    n = 2 * r_vx + 8
    g = np.arange(n) - n / 2
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    ball = gx**2 + gy**2 + gz**2 <= r_vx**2
    ind, vert, _ = surface_net_mesh(ball, scale=(1, 1, 1))
    verts = vert.reshape(-1, 3) - n / 2  # center at origin (1 nm voxels)
    faces = ind.reshape(-1, 3)
    splat = _splat(verts, (0.0, 0.0, 0.0))
    golden = triangle_raster_golden(verts, faces, (0.0, 0.0, 0.0), WINDOW, WS)
    _compare(splat, golden, max_disagree=0.05, med_tol=3, affected_tol=0.08)
    # analytic: depth at the sphere center pixel = front pole z = -r
    expected = (-(r_vx) / WINDOW + 0.5) * 254.0
    assert abs(int(splat[WS[0] // 2, WS[1] // 2]) - expected) <= 6
    assert abs(int(golden[WS[0] // 2, WS[1] // 2]) - expected) <= 6
