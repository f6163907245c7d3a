"""View-based (CMN) inference on cell reconstructions.

Reference parity: the multi-view inference paths of
syconn/reps/super_segmentation_helper.py — ``celltype_of_sso_nocache``
:1670, ``view_embedding_of_sso_nocache`` :1758, ``semseg_of_sso_nocache``
:1820, ``gliapred_sso_nocache`` :1495 — and ``predict_views_semseg``
:1353. Views come from the TPU splat renderer (render/views.py); the
``views.use_onthefly_views`` semantics hold: views are rendered on demand,
no view caches required.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import global_params
from .points import certainty_estimate

log = logging.getLogger("syconn_tpu.views_infer")

__all__ = [
    "views_to_model_input",
    "celltype_of_sso_views",
    "view_embedding_of_sso",
    "semseg_of_sso_views",
    "gliapred_sso_views",
    "axoness_views_of_sso",
    "average_node_axoness_views",
]


def views_to_model_input(views: np.ndarray) -> np.ndarray:
    """(L, nb_views, C, W, H) renderer output -> (L, nb_views, W, H, C)."""
    return np.moveaxis(np.asarray(views), 2, -1)


def _get_view_model(mpath: str, builder):
    """View-CMN weights loader: refuses seed initialization by default.

    A view model with random weights predicts plausible-looking noise
    (reference flagship path ssh:1670 celltype_of_sso_nocache), so unless
    ``views.allow_untrained_models`` is set, a missing model is an error —
    the documented default for these tasks is the point-model path
    (``use_point_models: true``)."""
    from ..models.io import get_or_init_model

    allow = bool(global_params.config["views"].get(
        "allow_untrained_models", False))
    return get_or_init_model(mpath, builder, require_trained=not allow)


def _batched_apply(model, params, x: np.ndarray, batch: int = 8):
    @jax.jit
    def fwd(p, xx):
        return model.apply({"params": p}, xx)

    outs = []
    n = len(x)
    for i in range(0, n, batch):
        chunk = x[i : i + batch]
        if len(chunk) < batch:
            pad = np.zeros((batch - len(chunk),) + chunk.shape[1:], chunk.dtype)
            chunk = np.concatenate([chunk, pad])
        outs.append(np.asarray(fwd(params, jnp.asarray(chunk))))
    return np.concatenate(outs)[:n]


def celltype_of_sso_views(ssv, pred_key: str = "celltype_cnn_e3", save: bool = True):
    """Multi-view celltype (reference: ssh:1670): render sampled views,
    average CMN logits over locations, store prediction + certainty."""
    from ..models.cmn import MultiViewCMN
    from ..render.views import render_sampled_sso

    cfg = global_params.config
    views, _ = render_sampled_sso(ssv, ws=(128, 64), nb_views=2)
    if len(views) == 0:
        return None
    model, params = _get_view_model(
        cfg.mpath_celltype_e3,
        lambda: (MultiViewCMN(n_classes=8, widths=(16, 32, 64)), (1, 2, 128, 64, views.shape[2])),
    )
    x = views_to_model_input(views).astype(np.float32)
    logits = _batched_apply(model, params, x)
    ssv.load_attr_dict()
    ssv.attr_dict[pred_key] = int(np.argmax(logits.mean(axis=0)))
    ssv.attr_dict[f"{pred_key}_probas"] = logits
    ssv.attr_dict[f"{pred_key}_certainty"] = certainty_estimate(logits)
    if save:
        ssv.save_attr_dict()
    return ssv.attr_dict[pred_key]


def view_embedding_of_sso(ssv, pred_key: str = "latent_morph", save: bool = True):
    """tCMN morphology embedding from views (reference: ssh:1758)."""
    from ..models.cmn import TripletCMN
    from ..render.views import render_sampled_sso

    cfg = global_params.config
    views, _ = render_sampled_sso(ssv, ws=(128, 64), nb_views=2)
    if len(views) == 0:
        return None
    ndim = int(cfg["tcmn"]["ndim_embedding"])
    model, params = _get_view_model(
        cfg.mpath_tnet,
        lambda: (TripletCMN(embed_dim=ndim, widths=(16, 32, 64)), (1, 2, 128, 64, views.shape[2])),
    )
    x = views_to_model_input(views).astype(np.float32)
    z = _batched_apply(model, params, x).mean(axis=0)
    ssv.load_attr_dict()
    ssv.attr_dict[pred_key] = z.astype(np.float32)
    if save:
        ssv.save_attr_dict()
    return z


def semseg_of_sso_views(
    ssv,
    semseg_key: str = "axoness",
    n_classes: int = 3,
    mpath: Optional[str] = None,
    nb_views: int = 2,
    ws=(128, 64),
    comp_window: Optional[float] = None,
    save_skeleton: bool = True,
):
    """Per-pixel view semseg -> vertex labels -> skeleton nodes
    (reference: ssh:1820 + rendering.py index views + ssh:1527
    ``semseg2mesh``)."""
    from ..models.cmn import ViewSemSegNet
    from ..render.views import (
        generate_rendering_locs,
        render_sso_coords,
        render_sso_coords_index_views,
        semseg2mesh_via_views,
    )

    cfg = global_params.config
    if comp_window is None:
        comp_window = float(cfg["compartments"]["view_properties_semsegax"]["comp_window"])
    mesh = ssv.load_mesh("sv")
    verts = np.asarray(mesh[1], np.float32).reshape(-1, 3)
    if len(verts) == 0:
        return None
    locs = generate_rendering_locs(verts, comp_window / 3)
    views = render_sso_coords(ssv, locs, ws=ws, nb_views=nb_views, comp_window=comp_window)
    index_views = render_sso_coords_index_views(
        ssv, locs, ws=ws, nb_views=nb_views, comp_window=comp_window
    )
    if mpath is None:
        mpath = cfg.mpath_axonsem
    model, params = _get_view_model(
        mpath, lambda: (ViewSemSegNet(n_classes=n_classes, widths=(16, 32, 64)), (1, ws[0], ws[1], views.shape[2])),
    )
    # flatten (L, V) into the batch; channels last
    x = views_to_model_input(views).astype(np.float32)
    flat = x.reshape((-1,) + x.shape[2:])
    logits = _batched_apply(model, params, flat)
    labels = np.argmax(logits, axis=-1).reshape(index_views.shape)
    vert_labels = semseg2mesh_via_views(
        index_views, labels, n_vertices=len(verts), n_classes=n_classes,
        unpredicted_label=n_classes,
    )
    ssv.attr_dict[f"{semseg_key}_vertex_labels"] = vert_labels.astype(np.int32)
    if save_skeleton and ssv.load_skeleton():
        from scipy import spatial

        from ..proc.skeleton import majorityvote_skeleton_property

        scale = np.asarray(ssv.scaling, np.float64)
        nodes_nm = np.asarray(ssv.skeleton["nodes"], np.float64) * scale[None]
        predicted = vert_labels < n_classes
        if predicted.any():
            tree = spatial.cKDTree(verts[predicted])
            k = min(50, int(predicted.sum()))
            _, ixs = tree.query(nodes_nm, k=k)
            lv = vert_labels[predicted]
            node_labels = np.array(
                [
                    np.bincount(lv[np.atleast_1d(row)].astype(np.int64), minlength=n_classes).argmax()
                    for row in np.atleast_2d(ixs)
                ],
                np.int64,
            )
            ssv.skeleton[semseg_key] = node_labels
            window = float(cfg["compartments"]["dist_axoness_averaging"])
            ssv.skeleton[f"{semseg_key}_avg10000"] = majorityvote_skeleton_property(
                ssv.skeleton, semseg_key, window, scale
            )
            ssv.save_skeleton()
    ssv.save_attr_dict()
    return vert_labels


def axoness_views_of_sso(
    ssv, pred_key: str = "axoness_preds_cnn", save: bool = True
):
    """Per-view-location scalar compartment predictions of one cell
    (reference chain: per-SV ``axoness_preds`` via the AxonViews CMN,
    consumed by ``average_node_axoness_views`` ssh:1152): render the
    sampled views, classify each location with the 3-class view CMN, store
    per-location predictions + the locations.

    Returns (preds (L,), locations (L, 3) nm)."""
    from ..models.cmn import MultiViewCMN
    from ..render.views import render_sampled_sso

    cfg = global_params.config
    views, locs = render_sampled_sso(ssv, ws=(128, 64), nb_views=2)
    if len(views) == 0:
        return np.zeros(0, np.int64), np.zeros((0, 3), np.float32)
    model, params = _get_view_model(
        cfg.mpath_axoness_views,
        lambda: (MultiViewCMN(n_classes=3, widths=(16, 32, 64)), (1, 2, 128, 64, views.shape[2])),
    )
    x = views_to_model_input(views).astype(np.float32)
    logits = _batched_apply(model, params, x)
    preds = np.argmax(logits, axis=-1).astype(np.int64)
    ssv.load_attr_dict()
    ssv.attr_dict[pred_key] = preds
    ssv.attr_dict["view_locations"] = np.asarray(locs, np.float32)
    if save:
        ssv.save_attr_dict()
    return preds, np.asarray(locs, np.float32)


def average_node_axoness_views(
    ssv,
    pred_key: str = "axoness_preds_cnn",
    max_dist: float = 10000.0,
    dest_key: Optional[str] = None,
    return_res: bool = False,
):
    """Average per-view compartment predictions along the skeleton
    (reference: super_segmentation_helper.py:1152
    ``average_node_axoness_views``): every node is assigned the view index
    of its nearest sample location; for each node, all nodes within
    ``max_dist`` nm path length are collected (batched multi-source
    Dijkstra over the edge-length graph instead of the reference's
    per-node networkx loop) and the majority over the *unique* view
    predictions in that window becomes the node's label.

    Writes ``skeleton['axoness_avg{max_dist}']`` (the key the downstream
    compartment consumers read) unless ``return_res``.
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import dijkstra
    from scipy.spatial import cKDTree

    if ssv.skeleton is None and not ssv.load_skeleton():
        log.error("no skeleton for ssv %d; skipping view averaging", ssv.id)
        return None
    sk = ssv.skeleton
    edges = np.asarray(sk.get("edges", np.zeros((0, 2))), np.int64).reshape(-1, 2)
    if len(edges) == 0:
        log.error("zero edges in skeleton of ssv %d; skipping", ssv.id)
        return None
    ssv.load_attr_dict()
    preds = np.asarray(ssv.attr_dict.get(pred_key, []))
    locs = np.asarray(ssv.attr_dict.get("view_locations", np.zeros((0, 3))), np.float64)
    if len(preds) == 0 or len(preds) != len(locs):
        preds, locs = axoness_views_of_sso(ssv, pred_key=pred_key)
        if len(preds) == 0:
            return None
    scale = np.asarray(ssv.scaling, np.float64)
    nodes_nm = np.asarray(sk["nodes"], np.float64) * scale[None]
    # view index of each node = nearest sample location (reference
    # cnn_axoness2skel with k=1)
    view_ixs = cKDTree(locs).query(nodes_nm, k=1)[1]
    sk["view_ixs"] = view_ixs.astype(np.int64)

    n = len(nodes_nm)
    w = np.linalg.norm(nodes_nm[edges[:, 0]] - nodes_nm[edges[:, 1]], axis=1)
    g = coo_matrix(
        (np.concatenate([w, w]),
         (np.concatenate([edges[:, 0], edges[:, 1]]),
          np.concatenate([edges[:, 1], edges[:, 0]]))),
        shape=(n, n),
    ).tocsr()
    avg = np.empty(n, preds.dtype)
    chunk = max(1, int(2**22 // max(n, 1)))  # bound the dist-matrix block
    for s in range(0, n, chunk):
        srcs = list(range(s, min(s + chunk, n)))
        dmat = dijkstra(g, directed=False, indices=srcs, limit=float(max_dist))
        for row, src in enumerate(srcs):
            neighs = np.flatnonzero(np.isfinite(dmat[row]))
            uix = np.unique(view_ixs[neighs])
            cls, cnts = np.unique(preds[uix], return_counts=True)
            avg[src] = cls[np.argmax(cnts)]
    if return_res:
        return avg
    sk[f"axoness_avg{int(max_dist)}"] = avg
    return avg


def gliapred_sso_views(ssv, save: bool = True) -> float:
    """Per-cell glia probability from views (reference: ssh:1495)."""
    from ..models.cmn import MultiViewCMN
    from ..render.views import render_sampled_sso

    cfg = global_params.config
    views, _ = render_sampled_sso(ssv, ws=(128, 64), nb_views=2)
    if len(views) == 0:
        return 0.0
    model, params = _get_view_model(
        cfg.mpath_glia_e3,
        lambda: (MultiViewCMN(n_classes=2, widths=(16, 32, 64)), (1, 2, 128, 64, views.shape[2])),
    )
    x = views_to_model_input(views).astype(np.float32)
    logits = _batched_apply(model, params, x)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    proba = float(probs[:, 1].mean())
    if save:
        ssv.load_attr_dict()
        ssv.attr_dict["glia_probas"] = proba
        ssv.save_attr_dict()
    return proba
