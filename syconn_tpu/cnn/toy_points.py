"""Point-model training on the neuron-morphology synthetic world.

The reference trains its point models (celltype, glia, compartments,
triplet morphology embeddings — syconn/cnn/cnn_celltype_ptcnv.py,
cnn_glia_ptcnv.py, cnn_semseg_ptcnv.py, cnn_tnet_ptcnv.py) on curated GT
cells. Here the neuron world's construction IS the ground truth: cells are
converted to the same labeled point clouds the deployment path consumes
(``inference/points.py`` — surface + organelle + synapse points, one-hot
typed, fixed-size contexts via the SAME ``extract_contexts``), and the
per-cell / per-point labels come from the generator's celltype_gt and
compart volumes.

Training through the deployment code path keeps train/deploy consistent:
identical context size, normalization and feature layout.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage

from .. import global_params

log = logging.getLogger("syconn_tpu.toy_train_pts")

__all__ = ["world2cloud", "train_toy_point_models", "eval_toy_point_models"]


def world2cloud(
    world: Dict, cid: int, max_per_type: int = 20_000,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Cell -> (coords_nm, type_index, compartment_label, spiness_label).

    Mirrors ``inference.points.sso2pointcloud``'s channels (0 cell surface,
    1 mi, 2 vc, 3 sj) but samples voxel masks instead of meshes. Surface
    points carry the compart/spiness labels at their voxel; sj points get
    -1 (undefined on the interface). Spiness follows the reference's 4-class
    convention: non-dendrite points are class 3 "other".
    """
    if rng is None:
        rng = np.random.default_rng(cid)
    scale = np.asarray(world.get("scale", (10, 10, 20)), np.float64)
    cells = world["cells"]
    comp = world["compart"]
    spin = world["spiness"]
    cell = cells == cid
    if not cell.any():
        z = np.zeros((0, 3), np.float32)
        zi = np.zeros(0, np.int32)
        return z, zi, zi.copy(), zi.copy()
    surface = cell & ~ndimage.binary_erosion(cell)
    near_cell = ndimage.binary_dilation(cell, iterations=3)

    def surf(m):
        # deployment clouds are MESH VERTICES (surfaces); voxel-filled
        # organelle clouds skew the per-type point ratios the celltype
        # classifier keys on (volume vs area scaling), so sample surfaces
        return m & ~ndimage.binary_erosion(m)

    masks = [
        surface,
        surf((world["mi"] > 0) & cell),
        surf((world["vc"] > 0) & cell),
        surf((world["sj"] > 0) & near_cell),
    ]
    coords, types, labels, slabels = [], [], [], []
    for ti, m in enumerate(masks):
        c = np.argwhere(m)
        if len(c) == 0:
            continue
        if len(c) > max_per_type:
            c = c[rng.choice(len(c), size=max_per_type, replace=False)]
        coords.append(c.astype(np.float64) * scale[None])
        types.append(np.full(len(c), ti, np.int32))
        if ti == 3:
            labels.append(np.full(len(c), -1, np.int32))
            slabels.append(np.full(len(c), -1, np.int32))
        else:
            lv = comp[c[:, 0], c[:, 1], c[:, 2]].astype(np.int32)
            labels.append(np.where(lv == 255, -1, lv))
            sv = spin[c[:, 0], c[:, 1], c[:, 2]].astype(np.int32)
            sv = np.where(sv == 255, 3, sv)  # non-dendrite -> "other"
            slabels.append(np.where(lv == 255, -1, sv))
    return (
        np.concatenate(coords).astype(np.float32),
        np.concatenate(types),
        np.concatenate(labels),
        np.concatenate(slabels),
    )


def _cell_contexts(world, cid, npoints, ctx_size_nm, n_contexts, rng,
                   surface_only=False, label_kind="compart",
                   centers_nm=None):
    """Contexts + per-point labels through the deployment extractor
    (``inference.points.extract_contexts``). ``label_kind``: "compart",
    "spiness", or "both" (returns (ctxs, comp_labels, spin_labels)).
    ``centers_nm`` pins the context centers (e.g. on spine-head synapses)
    instead of surface sampling."""
    from ..inference.points import extract_contexts

    coords, types, labels, slabels = world2cloud(world, cid, rng=rng)
    if len(coords) == 0:
        return (None, None, None) if label_kind == "both" else (None, None)
    if surface_only:
        sel = types == 0
        coords, types = coords[sel], types[sel] * 0
        labels, slabels = labels[sel], slabels[sel]
    ctxs, idx_lists = extract_contexts(
        coords, types, ctx_size_nm=ctx_size_nm, npoints=npoints,
        n_contexts=n_contexts, rng=rng, centers_nm=centers_nm,
    )
    gather = lambda lab: (np.stack([lab[ixs] for ixs in idx_lists])
                          if idx_lists else None)
    if label_kind == "both":
        return ctxs, gather(labels), gather(slabels)
    return ctxs, gather(slabels if label_kind == "spiness" else labels)


def pipeline_cloud_pools(
    wd: str, npoints: int = 2048, n_contexts: int = 8, seed: int = 0,
    spiness_npoints: int = 512,
    comp_geom: Optional[Tuple[int, float]] = None,
    ct_geom: Optional[Tuple[int, float]] = None,
):
    """Training pools from a PIPELINE-PROCESSED working dir: clouds come
    from the same mesh-based ``sso2pointcloud`` the deployment path uses,
    labels from the world's construction GT (``neuron_gt.npz``).

    Voxel-derived training clouds do not match deployment clouds (mesh
    vertices; syn_ssv-mesh-dominated sj channel) — celltype accuracy
    through the pipeline stayed ~0.5 while voxel-cloud eval scored 1.0.
    The reference trains on reconstructions for the same reason.

    Returns (pools, surf_pools, sp_spine_pools, sp_general_pools[,
    comp_pools]) in ``train_toy_point_models`` format: the spiness pools
    are at ``spiness_npoints`` (spine-head-centered / general), each entry
    (ctxs, spin_labels) — without them the spiness semseg trains on voxel
    clouds only and collapses on reconstruction clouds (0 head vertices
    predicted through the pipeline). ``comp_geom`` (npoints, ctx_nm) adds
    compartment-geometry pools (ctxs, comp_labels) as a 5th element.
    ``ct_geom`` (npoints, ctx_nm) adds HYBRID celltype pools (ctxs,
    global_morph_scalars, celltype) as a 6th element — point contexts at
    the celltype geometry plus the whole-cell scalars the deployed
    ``predict_celltype_ssd`` injects for ``PointClassNet(n_global>0)``.
    """
    import os

    from .. import global_params
    from ..inference.points import (extract_contexts, global_morph_scalars,
                                    sso2pointcloud)
    from ..reps.super_segmentation import SuperSegmentationDataset

    gt = np.load(os.path.join(wd, "neuron_gt.npz"))
    prev = global_params.wd
    pools, surf_pools = [], []
    sp_spine_pools, sp_general_pools = [], []
    comp_pools = []
    ct_pools = []
    try:
        global_params.wd = wd
        global_params.config._parse_config()
        scale = np.asarray(global_params.config["scaling"], np.float64)
        comp_vol = gt["compart"]
        spin_vol = gt["spiness"]
        shape = np.asarray(comp_vol.shape)
        # mesh vertices sit ON the carved membrane voxels (GT label 255 =
        # unlabeled), so a direct voxel lookup leaves ~2/3 of the cloud
        # without labels. Fill each unlabeled voxel from its nearest
        # labeled one (EDT index map), capped at a few voxels so far-away
        # points (detached synapse clouds) stay ignored.
        from scipy import ndimage as ndi

        def _nearest_fill(vol, max_dist_vox=4.0):
            unl = vol == 255
            if not unl.any() or unl.all():
                return vol
            dist, (ix, iy, iz) = ndi.distance_transform_edt(
                unl, return_indices=True, sampling=(1.0, 1.0, 2.0))
            return np.where(unl & (dist <= max_dist_vox), vol[ix, iy, iz], vol)

        comp_vol = _nearest_fill(comp_vol)
        spin_vol = _nearest_fill(spin_vol)
        sv2cell = dict(zip(gt["sv_ids"].tolist(), gt["sv_cells"].tolist()))
        ct_gt = gt["celltype_gt"]
        ssd = SuperSegmentationDataset(working_dir=wd)
        for sid in ssd.ssv_ids:
            ssv = ssd.get_super_segmentation_object(int(sid))
            coords, types = sso2pointcloud(ssv)
            if len(coords) == 0:
                continue
            cells = [sv2cell.get(int(s), -1) for s in ssv.sv_ids]
            cells = [c for c in cells if c > 0]
            if not cells:
                continue
            vals, cnt = np.unique(cells, return_counts=True)
            cell = int(vals[np.argmax(cnt)])
            vox = np.clip(np.round(coords / scale[None]).astype(np.int64),
                          0, shape - 1)
            cl = comp_vol[vox[:, 0], vox[:, 1], vox[:, 2]].astype(np.int32)
            sl_ = spin_vol[vox[:, 0], vox[:, 1], vox[:, 2]].astype(np.int32)
            labels = np.where(cl == 255, -1, cl)
            slabels = np.where(cl == 255, -1, np.where(sl_ == 255, 3, sl_))
            r = np.random.default_rng(seed * 1000 + int(sid))
            ctxs, idx_lists = extract_contexts(
                coords, types, ctx_size_nm=20_000.0, npoints=npoints,
                n_contexts=n_contexts, rng=r,
            )
            if not len(ctxs):
                continue
            pls = np.stack([labels[ix] for ix in idx_lists])
            sls = np.stack([slabels[ix] for ix in idx_lists])
            pools.append((ctxs, pls, sls, int(ct_gt[cell]), ct_gt[cell] == 3))
            # spiness-geometry pools at the spiness model's deployment
            # density: spine-head-centered (the sites the spinehead-volume
            # step later queries) + general coverage
            spine_centers = (
                gt["syn_coords"][gt["syn_on_spine"] & (gt["syn_post"] == cell)]
                * scale[None]
            )
            if len(spine_centers):
                spx, sp_ix = extract_contexts(
                    coords, types, ctx_size_nm=20_000.0,
                    npoints=spiness_npoints, centers_nm=spine_centers, rng=r,
                )
                if len(spx):
                    sp_spine_pools.append(
                        (spx, np.stack([slabels[ix] for ix in sp_ix])))
            gx, g_ix = extract_contexts(
                coords, types, ctx_size_nm=20_000.0, npoints=spiness_npoints,
                n_contexts=4, rng=r,
            )
            if len(gx):
                sp_general_pools.append(
                    (gx, np.stack([slabels[ix] for ix in g_ix])))
            sel = types == 0
            if sel.any():
                sctx, _ = extract_contexts(
                    coords[sel], types[sel] * 0, ctx_size_nm=15_000.0,
                    npoints=npoints, n_contexts=6, rng=r,
                )
                if len(sctx):
                    surf_pools.append((sctx, int(ct_gt[cell] == 3)))
            if comp_geom is not None:
                cx, c_ix = extract_contexts(
                    coords, types, ctx_size_nm=comp_geom[1],
                    npoints=comp_geom[0], n_contexts=n_contexts, rng=r,
                )
                if len(cx):
                    comp_pools.append((cx, np.stack([labels[i] for i in c_ix])))
            if ct_geom is not None:
                tcx, _ = extract_contexts(
                    coords, types, ctx_size_nm=ct_geom[1],
                    npoints=ct_geom[0], n_contexts=16, rng=r,
                )
                if len(tcx):
                    ct_pools.append((tcx, global_morph_scalars(ssv),
                                     int(ct_gt[cell])))
    finally:
        global_params.wd = prev
    out = [pools, surf_pools, sp_spine_pools, sp_general_pools]
    if comp_geom is not None or ct_geom is not None:
        out.append(comp_pools)
    if ct_geom is not None:
        out.append(ct_pools)
    return tuple(out)


def augment_context(ctx: np.ndarray, rng: np.random.Generator,
                    resample: float = 0.25) -> np.ndarray:
    """Random z-rotation + axis mirror + jitter + point resampling of a
    (npoints, 3+F) context.

    Deployment contexts arrive in arbitrary world orientation; without
    this the classifier memorizes the training cells' absolute layouts
    (observed: celltype train acc 1.0, held-out 0.33). ``resample``
    replaces up to that fraction of points with duplicates of others —
    every deployment context is a fresh random subsample of the cell
    cloud, and fixed pre-extracted training contexts are otherwise
    memorized verbatim (observed again at 103 cells: train 1.0,
    held-out 0.68)."""
    out = ctx.copy()
    a = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(a), np.sin(a)
    xy = out[:, :2] @ np.array([[c, -s], [s, c]], np.float32)
    out[:, :2] = xy
    if rng.random() < 0.5:
        out[:, 0] = -out[:, 0]
    if rng.random() < 0.5:
        out[:, 2] = -out[:, 2]
    out[:, :3] += rng.normal(0, 0.01, (1, 3)).astype(np.float32)
    if resample:
        n = len(out)
        k = int(n * rng.uniform(0.0, resample))
        if k:
            dst = rng.choice(n, size=k, replace=False)
            src = rng.choice(n, size=k, replace=True)
            out[dst] = out[src]
    return out


def train_toy_point_models(
    worlds: Sequence[Dict],
    tasks: Sequence[str] = ("celltype", "glia", "compartment", "spiness", "tnet"),
    steps: int = 800,
    npoints: int = 2048,
    batch: int = 8,
    learning_rate: float = 1e-3,
    seed: int = 0,
    log_cb=None,
    extra_pools=None,
    extra_weight: float = 0.75,
    task_npoints: Optional[Dict[str, int]] = None,
    comp_geom: Optional[Tuple[int, float]] = None,
    ct_geom: Optional[Tuple[int, float]] = None,
    task_steps: Optional[Dict[str, int]] = None,
) -> Dict[str, float]:
    """Train the point models on neuron worlds and persist them to the
    working directory's ``mpath_*_pts`` model dirs. Returns final metrics.

    ``extra_pools``: (pools, surf_pools) built from PIPELINE-PROCESSED
    working dirs (``pipeline_cloud_pools``) — reconstruction clouds in the
    deployment distribution. When present, batches draw from them with
    probability ``extra_weight`` (voxel-cloud training alone scored 1.0 on
    voxel eval but ~0.5 through the pipeline — distribution shift).

    ``comp_geom``: optional (npoints, ctx_nm) for the COMPARTMENT semseg.
    A 20 um context on the ~1.6 um toy worlds compresses the axon/dendrite
    caliber cue (30-100 nm radius difference) to 0.3-1% of the normalized
    coordinate range; a world-scaled context makes it visible. The chosen
    geometry is written to the model meta and read back at deployment
    (inference.points._meta_ctx). ``task_steps`` overrides the step count
    per task (e.g. fewer for the un-gated tnet embeddings)."""
    import jax.numpy as jnp

    from ..models.io import save_model
    from ..models.pointnet import PointClassNet, PointSegNet
    from ..models.train import (
        make_class_train_step,
        make_train_step,
        make_triplet_train_step,
        make_train_state,
    )

    cfg = global_params.config
    rng = np.random.default_rng(seed)
    emit = log_cb or log.info
    if task_npoints is None:
        # spiness deploys on small, spine-scale contexts (the pipeline reads
        # the npoints from the model meta); compartment/celltype/glia use
        # the full 2048-point contexts — training each task at a different
        # density than its deployment costs ~20 accuracy points (measured
        # on the 512-pt-trained compartment model: 0.36 on 2048-pt clouds)
        task_npoints = {"spiness": 512}
    np_sp = int(task_npoints.get("spiness", npoints))

    # ---- pre-extract per-cell context pools (the expensive host work)
    # each entry: (ctxs, comp_labels, spin_labels, celltype, is_glia)
    pools: List[Tuple[np.ndarray, np.ndarray, np.ndarray, int, bool]] = []
    surf_pools: List[Tuple[np.ndarray, int]] = []  # surface-only (glia path)
    spine_pools: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []  # head-centered
    pools_sp: List[Tuple[np.ndarray, np.ndarray]] = []  # spiness-npoints general
    comp_pools: List[Tuple[np.ndarray, np.ndarray]] = []  # compartment geometry
    for wi, world in enumerate(worlds):
        ct = world["celltype_gt"]
        for cid in range(1, len(ct)):
            if not (world["cells"] == cid).any():
                continue
            r = np.random.default_rng(seed * 1000 + wi * 100 + cid)
            ctxs, pls, sls = _cell_contexts(world, cid, npoints, 20_000.0, 8, r,
                                            label_kind="both")
            if ctxs is None or not len(ctxs):
                continue
            pools.append((ctxs, pls, sls, int(ct[cid]), ct[cid] == 3))
            # spine-head-centered contexts: heads are a few points per
            # surface-sampled context, so the spiness semseg rarely sees
            # them anchored — pin extra contexts on the cell's spine-head
            # synapses (the exact sites the spinehead-volume pipeline
            # later queries)
            scale_nm = np.asarray(world.get("scale", (10, 10, 20)), np.float64)
            spine_centers = np.asarray(
                [s["coord_vx"] for s in world.get("syn_gt", [])
                 if s.get("on_spine") and int(s.get("post_cell", -1)) == cid],
                np.float64,
            ).reshape(-1, 3) * scale_nm[None]
            if len(spine_centers):
                spx, spls, ssls = _cell_contexts(
                    world, cid, np_sp, 20_000.0, None, r,
                    label_kind="both", centers_nm=spine_centers,
                )
                if spx is not None and len(spx):
                    spine_pools.append((spx, spls, ssls))
            if np_sp != npoints and "spiness" in tasks:
                sx, _spl, ssl = _cell_contexts(world, cid, np_sp, 20_000.0, 4,
                                               r, label_kind="both")
                if sx is not None and len(sx):
                    pools_sp.append((sx, ssl))
            if comp_geom is not None and "compartment" in tasks:
                cx, cpl = _cell_contexts(world, cid, comp_geom[0],
                                         comp_geom[1], 8, r)
                if cx is not None and len(cx):
                    comp_pools.append((cx, cpl))
            sctx, _ = _cell_contexts(world, cid, npoints, 15_000.0, 6, r,
                                     surface_only=True)
            if sctx is not None and len(sctx):
                surf_pools.append((sctx, int(ct[cid] == 3)))
    e_pools: List[Tuple[np.ndarray, np.ndarray, np.ndarray, int, bool]] = []
    e_surf: List[Tuple[np.ndarray, int]] = []
    e_sp_spine: List[Tuple[np.ndarray, np.ndarray]] = []
    e_sp_general: List[Tuple[np.ndarray, np.ndarray]] = []
    e_comp: List[Tuple[np.ndarray, np.ndarray]] = []
    e_ct: List[Tuple[np.ndarray, np.ndarray, int]] = []  # hybrid celltype
    if extra_pools is not None:
        e_pools, e_surf = extra_pools[0], extra_pools[1]
        if len(extra_pools) >= 4:
            e_sp_spine, e_sp_general = extra_pools[2], extra_pools[3]
        if len(extra_pools) >= 5:
            e_comp = extra_pools[4]
        if len(extra_pools) >= 6:
            e_ct = extra_pools[5]
    emit(f"[pts] context pools: {len(pools)} voxel cells "
         f"({sum(len(p[0]) for p in pools)} ctxs), {len(e_pools)} "
         f"reconstruction cells ({sum(len(p[0]) for p in e_pools)} ctxs)")

    metrics: Dict[str, float] = {}
    task_steps = task_steps or {}

    def steps_for(task):
        return int(task_steps.get(task, steps))

    def pick(vox_list, ex_list):
        """One cell entry, reconstruction-weighted when both exist."""
        if ex_list and (not vox_list or rng.random() < extra_weight):
            return ex_list[rng.integers(len(ex_list))]
        return vox_list[rng.integers(len(vox_list))]

    def batches_cls(key):
        while True:
            xs, ys = [], []
            for _ in range(batch):
                ctxs, pls, sls, ct_i, is_g = pick(
                    pools if key == "celltype" else surf_pools_cls,
                    e_pools if key == "celltype" else e_surf_cls)
                j = rng.integers(len(ctxs))
                xs.append(augment_context(ctxs[j], rng))
                ys.append(ct_i if key == "celltype" else int(is_g))
            yield np.stack(xs), np.asarray(ys, np.int32)

    # surface pools normalized to the 5-tuple shape for `pick`
    surf_pools_cls = [(s, None, None, None, g) for s, g in surf_pools]
    e_surf_cls = [(s, None, None, None, g) for s, g in e_surf]

    # --------------------------------------------------------- celltype
    if "celltype" in tasks and e_ct and ct_geom is not None:
        # HYBRID head: local point contexts + whole-cell morphology scalars
        # (reference scalar injection: syconn/cnn/cnn_celltype_cmn.py:21-103).
        # Trained ONLY on pipeline-processed reconstruction clouds — the
        # scalars come from pipeline artifacts that voxel worlds lack.
        # Measured r4: local-only capped at 0.56 end-to-end; hybrid 0.77.
        from ..inference.points import N_GLOBAL_MORPH, append_global_scalars

        steps_t = steps_for("celltype")
        np_ct, ctx_ct = int(ct_geom[0]), float(ct_geom[1])
        S = np.stack([p[1] for p in e_ct])
        mu, sd = S.mean(0), S.std(0) + 1e-9
        model = PointClassNet(n_classes=8, n_global=N_GLOBAL_MORPH)
        state = make_train_state(model, (1, np_ct, 7 + N_GLOBAL_MORPH),
                                 learning_rate=learning_rate,
                                 total_steps=steps_t)
        step_fn = make_class_train_step(dict_output=True)
        acc = 0.0
        for i in range(steps_t):
            xs, ys = [], []
            for _ in range(batch):
                ctxs, scal, ct_i = e_ct[rng.integers(len(e_ct))]
                x = augment_context(ctxs[rng.integers(len(ctxs))], rng)
                xs.append(append_global_scalars(x[None], scal, (mu, sd))[0])
                ys.append(ct_i)
            state, m = step_fn(state, jnp.asarray(np.stack(xs)),
                               jnp.asarray(np.asarray(ys, np.int32)))
            if (i + 1) % 50 == 0:
                acc = float(m["acc"])
                emit(f"[celltype_pts hybrid] step {i + 1}/{steps_t} acc {acc:.3f}")
        save_model(cfg.mpath_celltype_pts, model, state.params,
                   extra_meta={"task": "celltype_pts", "toy_steps": steps_t,
                               "npoints": np_ct, "ctx_nm": ctx_ct,
                               "global_norm_mu": [float(v) for v in mu],
                               "global_norm_sd": [float(v) for v in sd]})
        metrics["celltype"] = acc
    elif "celltype" in tasks:
        steps_t = steps_for("celltype")
        model = PointClassNet(n_classes=8)
        state = make_train_state(model, (1, npoints, 7), learning_rate=learning_rate,
                                 total_steps=steps_t)
        step_fn = make_class_train_step(dict_output=True)
        gen = batches_cls("celltype")
        acc = 0.0
        for i in range(steps_t):
            x, y = next(gen)
            state, m = step_fn(state, jnp.asarray(x), jnp.asarray(y))
            if (i + 1) % 50 == 0:
                acc = float(m["acc"])
                emit(f"[celltype_pts] step {i + 1}/{steps_t} acc {acc:.3f}")
        save_model(cfg.mpath_celltype_pts, model, state.params,
                   extra_meta={"task": "celltype_pts", "toy_steps": steps_t,
                               "npoints": npoints, "ctx_nm": 20_000.0})
        metrics["celltype"] = acc

    # ------------------------------------------------------------- glia
    if "glia" in tasks:
        steps_t = steps_for("glia")
        model = PointSegNet(n_classes=2)
        state = make_train_state(model, (1, npoints, 7), learning_rate=learning_rate,
                                 total_steps=steps_t)
        step_fn = make_train_step()
        acc = 0.0
        for i in range(steps_t):
            xs, ys = [], []
            for _ in range(batch):
                sctx, *_unused, is_g = pick(surf_pools_cls, e_surf_cls)
                j = rng.integers(len(sctx))
                xs.append(augment_context(sctx[j], rng))
                ys.append(np.full(npoints, int(is_g), np.int32))
            state, m = step_fn(state, jnp.asarray(np.stack(xs)),
                               jnp.asarray(np.stack(ys)))
            if (i + 1) % 50 == 0:
                acc = float(m["acc"])
                emit(f"[glia_pts] step {i + 1}/{steps_t} acc {acc:.3f}")
        save_model(cfg.mpath_glia_pts, model, state.params,
                   extra_meta={"task": "glia_pts", "toy_steps": steps_t,
                               "npoints": npoints, "ctx_nm": 15_000.0})
        metrics["glia"] = acc

    # --------------------------------------- compartment + spiness semseg
    for task, n_cls, lab_ix, mpath in (
        ("compartment", 3, 1, cfg.mpath_compartment_pts),
        ("spiness", 4, 2, cfg.mpath_spiness),
    ):
        if task not in tasks:
            continue
        steps_t = steps_for(task)
        use_comp_geom = task == "compartment" and comp_geom is not None
        t_np = np_sp if task == "spiness" else (
            comp_geom[0] if use_comp_geom else npoints)
        t_ctx = comp_geom[1] if use_comp_geom else 20_000.0
        # two stacked kNN stages: per-point semseg needs mid-range geometry
        # (tube caliber, soma curvature) that one local stage + a global
        # pool cannot express (measured node acc ~0.46 with 1 stage)
        model = PointSegNet(n_classes=n_cls, knn_stages=2)
        state = make_train_state(model, (1, t_np, 7), learning_rate=learning_rate,
                                 total_steps=steps_t)
        # spiness pools at the model's own point density: voxel-cloud
        # spine-centered/general + the RECONSTRUCTION-cloud equivalents
        # (deployment distribution — voxel-only training collapsed on the
        # head class through the pipeline)
        sp_spine_all = [(p[0], p[2]) for p in spine_pools] + e_sp_spine
        sp_gen_all = (list(pools_sp) if np_sp != npoints else []) + e_sp_general
        # class-weighted loss: spine heads/necks are a few points per
        # 2048-point context, and the unweighted model never predicted
        # the head class at all (pipeline spinehead extraction found 0
        # spine synapses); sqrt-inverse-frequency over the pooled labels
        from ..models.train import weighted_xent

        freqs = np.ones(n_cls, np.float64)
        if task == "spiness" and (sp_spine_all or sp_gen_all):
            for ctxs_, lab_ in sp_spine_all + sp_gen_all:
                lv = lab_.reshape(-1)
                freqs += np.bincount(lv[lv >= 0], minlength=n_cls)
        elif use_comp_geom:
            for ctxs_, lab_ in comp_pools + e_comp:
                lv = lab_.reshape(-1)
                freqs += np.bincount(lv[lv >= 0], minlength=n_cls)
        else:
            for entry in pools + (e_pools if task == "compartment" else []):
                lv = entry[lab_ix].reshape(-1)
                freqs += np.bincount(lv[lv >= 0], minlength=n_cls)
        cw = np.sqrt(freqs.sum() / freqs)
        cw = np.minimum(cw / cw.min(), 16.0)
        cw = cw / cw.mean()
        step_fn = make_train_step(loss_fn=weighted_xent(cw))
        acc = 0.0
        for i in range(steps_t):
            xs, ys = [], []
            for _ in range(batch):
                if task == "spiness":
                    # half the stream from spine-head-centered contexts so
                    # the head class anchors enough batches
                    if sp_spine_all and (not sp_gen_all or rng.random() < 0.5):
                        ctxs, lab = sp_spine_all[rng.integers(len(sp_spine_all))]
                    elif sp_gen_all:
                        ctxs, lab = sp_gen_all[rng.integers(len(sp_gen_all))]
                    else:
                        entry = pools[rng.integers(len(pools))]
                        ctxs, lab = entry[0], entry[lab_ix]
                elif use_comp_geom:
                    ctxs, lab = pick(comp_pools, e_comp)[:2]
                else:
                    entry = pick(pools, e_pools)
                    ctxs, lab = entry[0], entry[lab_ix]
                j = rng.integers(len(ctxs))
                xs.append(augment_context(ctxs[j], rng))
                ys.append(lab[j])
            state, m = step_fn(state, jnp.asarray(np.stack(xs)),
                               jnp.asarray(np.stack(ys).astype(np.int32)))
            if (i + 1) % 50 == 0:
                acc = float(m["acc"])
                emit(f"[{task}_pts] step {i + 1}/{steps_t} acc {acc:.3f}")
        save_model(mpath, model, state.params,
                   extra_meta={"task": f"{task}_pts", "toy_steps": steps_t,
                               "npoints": t_np, "ctx_nm": t_ctx})
        metrics[task] = acc

    # ------------------------------------------------------------- tnet
    if "tnet" in tasks:
        steps_t = steps_for("tnet")
        ndim = int(cfg["tcmn"]["ndim_embedding"])
        model = PointClassNet(n_classes=2, embed_dim=ndim)
        state = make_train_state(model, (1, npoints, 7), learning_rate=learning_rate,
                                 total_steps=steps_t)
        step_fn = make_triplet_train_step()
        lossv = 0.0
        tn_pools = pools + e_pools
        for i in range(steps_t):
            xa, xp, xn = [], [], []
            for _ in range(batch):
                ia = rng.integers(len(tn_pools))
                ctxa = tn_pools[ia][0]
                # (pools entries are (ctxs, comp, spin, ct, is_glia))
                j1, j2 = rng.integers(len(ctxa)), rng.integers(len(ctxa))
                inn = rng.integers(len(tn_pools))
                while inn == ia and len(tn_pools) > 1:
                    inn = rng.integers(len(tn_pools))
                ctxn = tn_pools[inn][0]
                xa.append(augment_context(ctxa[j1], rng))
                xp.append(augment_context(ctxa[j2], rng))
                xn.append(augment_context(ctxn[rng.integers(len(ctxn))], rng))
            state, m = step_fn(state, jnp.asarray(np.stack(xa)),
                               jnp.asarray(np.stack(xp)), jnp.asarray(np.stack(xn)))
            if (i + 1) % 50 == 0:
                lossv = float(m["loss"])
                emit(f"[tnet_pts] step {i + 1}/{steps_t} loss {lossv:.4f}")
        save_model(cfg.mpath_tnet_pts, model, state.params,
                   extra_meta={"task": "tnet_pts", "toy_steps": steps_t,
                               "npoints": npoints, "ctx_nm": 20_000.0})
        metrics["tnet_loss"] = lossv

    return metrics


def eval_toy_point_models(
    world: Dict, npoints: int = 2048, seed: int = 123,
) -> Dict[str, float]:
    """Held-out metrics of the persisted point models on a fresh world:
    celltype accuracy over cells, glia AUC-proxy (mean score separation),
    compartment per-point accuracy."""
    import jax.numpy as jnp

    from ..inference.points import ContextPredictor
    from ..models.io import load_model

    cfg = global_params.config
    rng = np.random.default_rng(seed)
    ct = world["celltype_gt"]
    out: Dict[str, float] = {}

    def _try_load(mpath):
        try:
            return load_model(mpath)
        except FileNotFoundError:
            return None, None

    model, params = _try_load(cfg.mpath_celltype_pts)
    if model is not None and int(getattr(model, "n_global", 0) or 0) > 0:
        # hybrid celltype needs pipeline artifacts for its whole-cell
        # scalars; a raw voxel world has none — score it end-to-end with
        # cnn/eval_quality instead
        model = params = None
    hits, tot = 0, 0
    if model is not None:
        pred = ContextPredictor(model, params, npoints=npoints)
        for cid in range(1, len(ct)):
            ctxs, _ = _cell_contexts(world, cid, npoints, 20_000.0, 8, rng)
            if ctxs is None or not len(ctxs):
                continue
            o = pred.predict(ctxs)
            guess = int(np.argmax(o["logits"].mean(axis=0)))
            hits += int(guess == int(ct[cid]))
            tot += 1
        out["celltype_acc"] = hits / max(tot, 1)

    for task, mpath in (("compartment", cfg.mpath_compartment_pts),
                        ("spiness", cfg.mpath_spiness)):
        try:
            model, params = load_model(mpath)
        except FileNotFoundError:
            continue
        pred = ContextPredictor(model, params, npoints=npoints)
        correct, n = 0, 0
        for cid in range(1, len(ct)):
            ctxs, pls = _cell_contexts(world, cid, npoints, 20_000.0, 8, rng,
                                       label_kind=task if task == "spiness"
                                       else "compart")
            if ctxs is None or not len(ctxs):
                continue
            o = pred.predict(ctxs)  # (M, npoints, C)
            lab = np.argmax(o, axis=-1)
            valid = pls >= 0
            correct += int((lab[valid] == pls[valid]).sum())
            n += int(valid.sum())
        out[f"{task}_acc"] = correct / max(n, 1)

    model, params = _try_load(cfg.mpath_glia_pts)
    if model is None:
        return out
    pred = ContextPredictor(model, params, npoints=npoints)
    glia_scores, neuron_scores = [], []
    for cid in range(1, len(ct)):
        ctxs, _ = _cell_contexts(world, cid, npoints, 15_000.0, 6, rng,
                                 surface_only=True)
        if ctxs is None or not len(ctxs):
            continue
        o = pred.predict(ctxs)
        p = np.exp(o) / np.exp(o).sum(-1, keepdims=True)
        score = float(p[..., 1].mean())
        (glia_scores if ct[cid] == 3 else neuron_scores).append(score)
    if glia_scores and neuron_scores:
        out["glia_sep"] = float(np.mean(glia_scores) - np.mean(neuron_scores))
        out["glia_acc"] = float(
            (np.asarray(glia_scores) > 0.5).mean() * 0.5
            + (np.asarray(neuron_scores) <= 0.5).mean() * 0.5
        )
    return out
