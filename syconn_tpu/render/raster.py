"""Orthographic multi-view renderer on TPU (point-splat, z-buffered).

Replaces the reference's OpenGL fixed-function rasterizer (EGL:
syconn/proc/rendering_egl.py:460 ``multi_view_mesh_coords``; OSMesa variant
rendering_osmesa.py; driver syconn/proc/rendering.py:204
``render_sso_coords``) with an accelerator-native design:

* the rendering primitive is the *vertex* (surface-net meshes carry ~one
  vertex per boundary voxel, denser than the 31 nm/pixel raster of the
  reference's 8 µm / 256 px views), splatted with a z-buffer;
* the z-buffer is a ``scatter-min`` — a first-class XLA op — so one jitted
  kernel renders a whole batch of (location, view) frames at once; no GL
  contexts, no per-GPU worker fan-out;
* index views (winning-vertex id per pixel) use a second masked scatter at
  the winning depth, replacing the reference's RGBA id encoding
  (syconn/handler/multiviews.py:219).

Views are orthographic boxes of ``comp_window`` nm, rotated per location
(PCA of the local vertex cloud) and around the first principal axis for
``nb_views`` viewing angles.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jaxcfg import setup_jax

setup_jax()

__all__ = ["render_views_splat", "SplatRenderer", "view_rotations"]

BACKGROUND = 255


def view_rotations(rot: np.ndarray, nb_views: int) -> np.ndarray:
    """Per-location view matrices: the base (PCA) rotation plus
    ``nb_views`` rotations about the first principal axis
    (reference: per-view glRotate, rendering_egl.py:505)."""
    rots = []
    for v in range(nb_views):
        ang = np.pi * v / nb_views
        c, s = np.cos(ang), np.sin(ang)
        spin = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
        rots.append(spin @ rot)
    return np.stack(rots)  # (nb_views, 3, 3)


def _splat_kernel(verts, mask, center, rotmats, window, ws, splat: int = 1):
    """Render one location: verts (V, 3), rotmats (nviews, 3, 3).

    Returns (nviews, W, H) uint8 depth + (nviews, W, H) int32 vertex index
    (-1 = background).
    """
    nviews = rotmats.shape[0]
    W, H = ws

    def one_view(rot):
        p = (verts - center[None]) @ rot.T  # view frame
        # orthographic: x -> W pixels over window nm, y -> H pixels over window/2?
        # reference uses an (x, y) box of comp_window x comp_window/2 (ws 256x128)
        px = (p[:, 0] / window + 0.5) * W
        py = (p[:, 1] / (window * H / W) + 0.5) * H
        depth = p[:, 2] / window + 0.5  # [0, 1] inside the box
        ix = jnp.floor(px).astype(jnp.int32)
        iy = jnp.floor(py).astype(jnp.int32)
        valid = (
            mask
            & (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            & (depth >= 0.0) & (depth <= 1.0)
        )
        d_q = jnp.where(valid, depth, jnp.inf).astype(jnp.float32)
        flat = jnp.where(valid, ix * H + iy, 0)
        zbuf = jnp.full((W * H,), jnp.inf, jnp.float32)
        zbuf = zbuf.at[flat].min(d_q, mode="drop")
        # second pass: vertex index at the winning depth
        win = valid & (zbuf[flat] == d_q)
        vidx = jnp.arange(verts.shape[0], dtype=jnp.int32)
        ibuf = jnp.full((W * H,), -1, jnp.int32)
        ibuf = ibuf.at[jnp.where(win, flat, 0)].max(jnp.where(win, vidx, -1), mode="drop")
        depth_img = jnp.where(
            jnp.isfinite(zbuf), jnp.round(zbuf * 254.0), float(BACKGROUND)
        ).astype(jnp.uint8)
        return depth_img.reshape(W, H), ibuf.reshape(W, H)

    return jax.vmap(one_view)(rotmats)


class SplatRenderer:
    """Batched jitted renderer with a fixed vertex-buffer size."""

    def __init__(self, ws: Tuple[int, int] = (256, 128), nb_views: int = 2):
        self.ws = tuple(int(x) for x in ws)
        self.nb_views = int(nb_views)
        self._jits = {}

    def _get_fn(self, vbucket: int):
        if vbucket not in self._jits:
            ws = self.ws

            @jax.jit
            def run(verts, mask, centers, rotmats, window):
                # centers (L, 3), rotmats (L, nviews, 3, 3)
                return jax.vmap(
                    lambda c, r: _splat_kernel(verts, mask, c, r, window, ws)
                )(centers, rotmats)

            self._jits[vbucket] = run
        return self._jits[vbucket]

    def render(
        self,
        vertices_nm: np.ndarray,
        locations_nm: np.ndarray,
        rotations: np.ndarray,
        comp_window: float,
        loc_batch: int = 16,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Render all locations.

        Args:
            vertices_nm: (V, 3).
            locations_nm: (L, 3) view-box centers.
            rotations: (L, 3, 3) base rotations (PCA); expanded to
                ``nb_views`` per location.
        Returns:
            depth views (L, nb_views, W, H) uint8,
            index views (L, nb_views, W, H) int32 (vertex id, -1 = bg).
        """
        v = np.asarray(vertices_nm, np.float32).reshape(-1, 3)
        L = len(locations_nm)
        if L == 0 or len(v) == 0:
            return (
                np.full((L, self.nb_views, *self.ws), BACKGROUND, np.uint8),
                np.full((L, self.nb_views, *self.ws), -1, np.int32),
            )
        # pad vertex buffer to the next power-of-two bucket (jit reuse)
        vbucket = 1 << int(np.ceil(np.log2(max(len(v), 1024))))
        verts = np.zeros((vbucket, 3), np.float32)
        verts[: len(v)] = v
        mask = np.zeros(vbucket, bool)
        mask[: len(v)] = True
        fn = self._get_fn(vbucket)

        rotm = np.stack([view_rotations(r, self.nb_views) for r in rotations])
        depth_out = np.empty((L, self.nb_views, *self.ws), np.uint8)
        index_out = np.empty((L, self.nb_views, *self.ws), np.int32)
        for i in range(0, L, loc_batch):
            cb = np.asarray(locations_nm[i : i + loc_batch], np.float32)
            rb = np.asarray(rotm[i : i + loc_batch], np.float32)
            n = len(cb)
            if n < loc_batch:
                cb = np.concatenate([cb, np.zeros((loc_batch - n, 3), np.float32)])
                rb = np.concatenate(
                    [rb, np.tile(np.eye(3, dtype=np.float32), (loc_batch - n, self.nb_views, 1, 1))]
                )
            d, ix = fn(jnp.asarray(verts), jnp.asarray(mask), jnp.asarray(cb), jnp.asarray(rb), float(comp_window))
            depth_out[i : i + n] = np.asarray(d)[:n]
            index_out[i : i + n] = np.asarray(ix)[:n]
        return depth_out, index_out


def render_views_splat(
    vertices_nm: np.ndarray,
    locations_nm: np.ndarray,
    rotations: Optional[np.ndarray] = None,
    comp_window: float = 8000.0,
    ws: Tuple[int, int] = (256, 128),
    nb_views: int = 2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Convenience wrapper; identity rotations when none are given."""
    if rotations is None:
        rotations = np.tile(np.eye(3, dtype=np.float32), (len(locations_nm), 1, 1))
    r = SplatRenderer(ws=ws, nb_views=nb_views)
    return r.render(vertices_nm, locations_nm, rotations, comp_window)
