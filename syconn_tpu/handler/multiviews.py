"""View/ID codecs and rendering-location helpers.

Reference parity: syconn/handler/multiviews.py —
``id2rgba_array_contiguous`` :219, ``rgba2id_array`` :306,
``generate_palette`` :69, ``remap_rgb_labelviews`` :91,
``generate_rendering_locs`` :339 (the TPU renderer uses integer index
buffers natively — these codecs exist for KNOSSOS/legacy-view interop).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

__all__ = [
    "id2rgba_array_contiguous",
    "rgba2id_array",
    "generate_palette",
    "remap_rgb_labelviews",
    "generate_rendering_locs",
]


def id2rgba_array_contiguous(ids: np.ndarray) -> np.ndarray:
    """Contiguous IDs -> RGBA uint8 (little-endian byte split)."""
    arr = np.asarray(ids, np.uint32).reshape(-1)
    return arr.view(np.uint8).reshape(-1, 4).copy()


def rgba2id_array(rgba: np.ndarray) -> np.ndarray:
    """Inverse of :func:`id2rgba_array_contiguous`."""
    arr = np.ascontiguousarray(np.asarray(rgba, np.uint8))
    flat = arr.reshape(-1, 4)
    return flat.view(np.uint32).reshape(arr.shape[:-1]).copy()


def generate_palette(n_classes: int, return_rgba: bool = True) -> np.ndarray:
    """Distinct color palette for label views (reference: :69)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm

    cmap = cm.get_cmap("tab20" if n_classes <= 20 else "hsv")
    cols = (np.array([cmap(i / max(n_classes - 1, 1)) for i in range(n_classes)]) * 255).astype(
        np.uint8
    )
    return cols if return_rgba else cols[:, :3]


def remap_rgb_labelviews(views_rgb: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """RGB label views -> integer labels via palette matching (:91)."""
    v = np.asarray(views_rgb, np.uint8)
    flat = v.reshape(-1, v.shape[-1])[:, :3].astype(np.int32)
    pal = np.asarray(palette, np.uint8)[:, :3].astype(np.int32)
    d = np.abs(flat[:, None, :] - pal[None]).sum(-1)
    return np.argmin(d, axis=1).reshape(v.shape[:-1]).astype(np.int32)


def generate_rendering_locs(verts_nm: np.ndarray, ds_factor_nm: float) -> np.ndarray:
    from ..render.views import generate_rendering_locs as _impl

    return _impl(verts_nm, ds_factor_nm)
