"""Neuron-morphology synthetic world: tubular cells with ground truth.

The Voronoi toy world (`utils/testdata.py`) exercises the pipeline's
plumbing but carries no morphological ground truth — its "cells" are
convex blobs, so compartment (axon/dendrite/soma), spine, myelin and
celltype predictions have nothing real to learn or be scored against.

This generator builds cells the way the reference's example cube contains
them (reference: the j0126 example data consumed by examples/start.py and
the GT conventions of syconn/handler/prediction_pts.py — axoness labels
{0: dendrite, 1: axon, 2: soma}, spiness labels {0: neck, 1: head,
2: shaft, 3: other}): an ellipsoidal soma, tapering dendrite tubes
(optionally spiny), one thin axon (optionally myelinated), organelles with
celltype-dependent densities, and synapses constructed at axon->dendrite
touch points with the synapse sign determined by the presynaptic type.

Everything is deterministic given ``seed`` and returns the same dict
schema as ``generate_toy_world`` plus ground-truth extras, so the full
pipeline runs on it unchanged while quality tests can score predictions
against construction:

    celltype_gt  (n_cells+1,) int8, -1 for background
    compart      uint8 volume {0: dendrite, 1: axon, 2: soma} (255 bg)
    spiness      uint8 volume {0: neck, 1: head, 2: shaft, 255: n/a}
    myelin       uint8 mask volume (myelin sheath around axons)
    syn_gt       list of dicts (coord_vx, pre_cell, post_cell, sign,
                 on_spine, head_vol_vx)
    cells_meta   per-cell dict: type, soma center/radius, polylines with
                 compartment labels, spines (head center, head radius)

Toy celltype classes (4 of the 8-class head):
    0 "EA"  excitatory: spiny dendrites, asym outgoing synapses, mi-rich
    1 "IN"  inhibitory: aspiny, sym outgoing synapses
    2 "MSN" spiny, vesicle-cloud rich (many vc)
    3 "GLIA" no axon, many short thin ramified processes, no synapses
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
from scipy import ndimage

__all__ = ["generate_neuron_world", "write_neuron_world", "CELLTYPE_NAMES"]

CELLTYPE_NAMES = {0: "EA", 1: "IN", 2: "MSN", 3: "GLIA"}

# compartment labels (reference axoness convention)
DENDRITE, AXON, SOMA = 0, 1, 2
# spiness labels (reference convention)
SP_NECK, SP_HEAD, SP_SHAFT, SP_OTHER = 0, 1, 2, 3


def _unit(v: np.ndarray) -> np.ndarray:
    n = float(np.linalg.norm(v))
    return v / n if n > 1e-9 else np.array([1.0, 0.0, 0.0])


class _Painter:
    """Rasterizes capsules/balls into the label volumes.

    All positions are in voxel coordinates; distances are computed in
    x-voxel units with the z axis stretched by ``aniso`` (scale[2] /
    scale[0]), so tubes stay round in physical space.
    """

    def __init__(self, shape, aniso: float):
        self.shape = tuple(int(s) for s in shape)
        self.az = float(aniso)
        self.cells = np.zeros(self.shape, np.uint64)
        self.compart = np.full(self.shape, 255, np.uint8)
        self.spiness = np.full(self.shape, 255, np.uint8)
        self.myelin = np.zeros(self.shape, bool)

    def _bbox_grid(self, lo, hi):
        lo = np.maximum(np.floor(lo).astype(np.int64), 0)
        hi = np.minimum(np.ceil(hi).astype(np.int64) + 1, self.shape)
        if np.any(hi <= lo):
            return None, None
        sl = tuple(slice(int(a), int(b)) for a, b in zip(lo, hi))
        ax = [np.arange(a, b, dtype=np.float32) for a, b in zip(lo, hi)]
        return sl, ax

    def capsule_mask(self, p0, p1, r0, r1, extra=0.0):
        """(slice, bool mask, radial distance - local radius) for a capsule."""
        p0 = np.asarray(p0, np.float64)
        p1 = np.asarray(p1, np.float64)
        r = max(r0, r1) + extra
        pad = np.array([r + 1, r + 1, r / self.az + 1])
        sl, ax = self._bbox_grid(np.minimum(p0, p1) - pad, np.maximum(p0, p1) + pad)
        if sl is None:
            return None, None, None
        zs = np.array([1.0, 1.0, self.az], np.float64)
        q0, q1 = p0 * zs, p1 * zs
        d = q1 - q0
        L2 = max(float(d @ d), 1e-9)
        # distance from every bbox voxel to the segment, vectorized
        X = ax[0][:, None, None] - q0[0]
        Y = ax[1][None, :, None] - q0[1]
        Z = ax[2][None, None, :] * self.az - q0[2]
        t = np.clip((X * d[0] + Y * d[1] + Z * d[2]) / L2, 0.0, 1.0)
        dist2 = (X - t * d[0]) ** 2 + (Y - t * d[1]) ** 2 + (Z - t * d[2]) ** 2
        rad = r0 + t * (r1 - r0) + extra
        return sl, dist2 <= rad * rad, np.sqrt(dist2) - (rad - extra)

    def paint_capsule(self, cid, p0, p1, r0, r1, comp, spin=None):
        sl, m, _ = self.capsule_mask(p0, p1, r0, r1)
        if sl is None:
            return
        own = m & ((self.cells[sl] == 0) | (self.cells[sl] == cid))
        self.cells[sl][own] = cid
        self.compart[sl][own] = comp
        if spin is not None:
            self.spiness[sl][own] = spin

    def paint_ball(self, cid, c, r, comp, spin=None):
        self.paint_capsule(cid, c, c, r, r, comp, spin)

    def paint_myelin(self, cid, p0, p1, r_axon, thickness=4.0):
        """Sheath ring: r_axon .. r_axon+thickness, only over free space
        (the sheath is kept as part of the axon's cell object).

        Thickness is in x-voxels (10 nm): compact myelin around CNS axons
        is tens of lamellae at ~15-18 nm periodicity, i.e. a 100-500 nm
        sheath — 10-50 voxels at this scale. The r4 default of 1.8 voxels
        sat at the resolution floor and made the dense myelin task
        unlearnable (held-out IoU 0.14-0.26 across retrains); 4 voxels
        (40 nm) is still conservative relative to real EM."""
        sl, m, radial = self.capsule_mask(p0, p1, r_axon + thickness,
                                          r_axon + thickness)
        if sl is None:
            return
        # radial = dist - (r_axon + thickness); the ring excludes the axon core
        ring = m & (radial > -thickness)
        free = ring & (self.cells[sl] == 0)
        self.myelin[sl] |= free
        # sheath voxels belong to the axon's cell so extraction keeps them
        self.cells[sl][free] = cid
        self.compart[sl][free] = AXON


def _polyline(rng, start, direction, n_steps, step_len, drift, shape,
              margin=3.0, waypoints=None, steer=0.55):
    """Smooth random polyline: direction performs a bounded random walk.

    ``waypoints``: optional list of points the line is steered towards in
    order (axons use other cells' somata so synapses actually form); each
    waypoint is considered reached within 1.5 step lengths.
    """
    pts = [np.asarray(start, np.float64)]
    d = _unit(np.asarray(direction, np.float64))
    lo = np.full(3, margin)
    hi = np.asarray(shape, np.float64) - margin
    wp = list(waypoints) if waypoints else []
    for _ in range(n_steps):
        d = _unit(d + drift * rng.normal(size=3) * np.array([1.0, 1.0, 0.5]))
        if wp:
            to_t = np.asarray(wp[0], np.float64) - pts[-1]
            dist = float(np.linalg.norm(to_t))
            if dist < 1.5 * step_len:
                wp.pop(0)
            else:
                d = _unit((1 - steer) * d + steer * to_t / dist)
        p = pts[-1] + d * step_len
        # reflect off the volume boundary
        for k in range(3):
            if p[k] < lo[k] or p[k] > hi[k]:
                d[k] = -d[k]
                p[k] = np.clip(p[k], lo[k], hi[k])
        pts.append(p)
    return np.asarray(pts)


def generate_neuron_world(
    shape: Sequence[int] = (192, 192, 96),
    n_cells: int = 6,
    svs_per_cell: int = 3,
    seed: int = 0,
    scale: Sequence[int] = (10, 10, 20),
    celltypes: Optional[Sequence[int]] = None,
    spine_rate: float = 0.10,
    myelin_rate: float = 0.5,
) -> Dict[str, np.ndarray]:
    """Build the neuron world. See module docstring for the schema."""
    rng = np.random.default_rng(seed)
    shape = tuple(int(s) for s in shape)
    scale = np.asarray(scale, np.float64)
    az = float(scale[2] / scale[0])
    P = _Painter(shape, az)
    diag = float(np.linalg.norm(shape))

    if celltypes is None:
        # at least one of each of the first min(4, n) types, rest random
        celltypes = [i % 4 for i in range(n_cells)]
        rng.shuffle(celltypes)
    celltypes = list(celltypes)[:n_cells]
    ct_arr = np.full(n_cells + 1, -1, np.int8)
    ct_arr[1:] = celltypes

    # soma centers: rejection-sample with a minimum pairwise distance
    centers = []
    min_d = 0.35 * min(shape[0], shape[1])
    for _ in range(n_cells * 200):
        if len(centers) == n_cells:
            break
        p = np.array([rng.uniform(0.18 * s, 0.82 * s) for s in shape])
        if all(np.linalg.norm((p - c) * [1, 1, az]) >= min_d for c in centers):
            centers.append(p)
    while len(centers) < n_cells:  # crowded volume: relax
        centers.append(np.array([rng.uniform(0.2 * s, 0.8 * s) for s in shape]))

    cells_meta: Dict[int, dict] = {}
    spine_sites: List[dict] = []  # for synapse targeting
    for idx in range(n_cells):
        cid = idx + 1
        ct = celltypes[idx]
        soma_c = centers[idx]
        # per-type soma scale is one of the celltype cues (EA large, MSN
        # medium, IN small, glia smallest)
        soma_scale = {0: 1.18, 1: 0.88, 2: 1.0, 3: 0.72}[ct]
        soma_r = rng.uniform(0.045, 0.060) * diag * soma_scale
        meta = {"type": ct, "soma_center": soma_c, "soma_radius": soma_r,
                "polylines": [], "spines": []}

        # --- processes
        if ct == 3:  # glia: many short thin processes, no axon
            n_proc = int(rng.integers(4, 7))
            proc_specs = [("dendrite", DENDRITE)] * n_proc
        else:
            n_dend = int(rng.integers(2, 4))
            proc_specs = [("dendrite", DENDRITE)] * n_dend + [("axon", AXON)]
        dirs = []
        for kind, comp in proc_specs:
            # spread initial directions
            for _ in range(8):
                d0 = _unit(rng.normal(size=3) * [1, 1, 0.5])
                if all(float(d0 @ e) < 0.75 for e in dirs):
                    break
            dirs.append(d0)
            if kind == "axon":
                n_steps = int(rng.integers(22, 32))
                step = 0.06 * diag / 2
                r0, r1 = 2.4, 2.0
                drift = 0.35
            elif ct == 3:
                n_steps = int(rng.integers(6, 10))
                step = 0.035 * diag / 2
                r0, r1 = 2.6, 1.5
                drift = 0.8
            else:
                n_steps = int(rng.integers(9, 14))
                step = 0.05 * diag / 2
                r0, r1 = 5.5, 2.2
                drift = 0.45
            start = soma_c + d0 * soma_r * 0.8
            waypoints = None
            if kind == "axon" and n_cells > 1:
                # steer past 1-2 other somata (offset sideways so the axon
                # passes through their dendritic field, not the soma core)
                others = [j for j in range(n_cells) if j != idx]
                rng.shuffle(others)
                waypoints = []
                for j in others[: int(rng.integers(2, 4))]:
                    off = rng.normal(size=3) * [1, 1, 0.5]
                    off = _unit(off) * 0.10 * diag
                    waypoints.append(centers[j] + off)
            line = _polyline(rng, start, d0, n_steps, step, drift, shape,
                             waypoints=waypoints)
            radii = np.linspace(r0, r1, len(line))
            meta["polylines"].append({"pts": line, "radii": radii, "comp": comp,
                                      "kind": kind})
            spin = SP_SHAFT if (comp == DENDRITE and ct != 3) else None
            for a in range(len(line) - 1):
                P.paint_capsule(cid, line[a], line[a + 1], radii[a], radii[a + 1],
                                comp, spin)
            # myelination probability is type-dependent (EA heavily
            # myelinated, IN mostly unmyelinated) — another celltype cue
            my_rate = myelin_rate * {0: 1.8, 1: 0.3, 2: 1.0, 3: 0.0}[ct]
            if kind == "axon" and rng.random() < min(my_rate, 1.0):
                # myelinate a contiguous middle stretch
                a0 = int(len(line) * 0.25)
                a1 = int(len(line) * 0.75)
                for a in range(a0, a1):
                    P.paint_myelin(cid, line[a], line[a + 1], radii[a])
                meta["myelinated"] = (a0, a1)

            # --- spines on spiny dendrites (EA, MSN)
            if comp == DENDRITE and ct in (0, 2):
                seg_lens = np.linalg.norm(
                    np.diff(line, axis=0) * [1, 1, az], axis=1)
                # MSN dendrites are far spinier than EA's — a celltype cue
                sp_rate = spine_rate * (2.2 if ct == 2 else 1.0)
                n_spines = rng.poisson(sp_rate * float(seg_lens.sum()))
                for _ in range(int(n_spines)):
                    a = int(rng.integers(0, len(line) - 1))
                    t = rng.random()
                    base = line[a] + t * (line[a + 1] - line[a])
                    r_here = radii[a] + t * (radii[a + 1] - radii[a])
                    seg_d = _unit((line[a + 1] - line[a]) * [1, 1, az])
                    # perpendicular offshoot
                    perp = _unit(np.cross(seg_d, rng.normal(size=3)))
                    neck_len = rng.uniform(2.5, 4.5)
                    head_r = rng.uniform(2.0, 3.0)
                    neck_end = base + perp * (r_here + neck_len) / np.array([1, 1, az])
                    head_c = base + perp * (r_here + neck_len + head_r * 0.7) / np.array([1, 1, az])
                    P.paint_capsule(cid, base, neck_end, 1.3, 1.3, DENDRITE, SP_NECK)
                    P.paint_ball(cid, head_c, head_r, DENDRITE, SP_HEAD)
                    sp = {"cell": cid, "head_center": head_c, "head_radius": head_r,
                          "base": base}
                    meta["spines"].append(sp)
                    spine_sites.append(sp)

        cells_meta[cid] = meta

    # somata painted last so they win over process roots
    for cid, meta in cells_meta.items():
        P.paint_ball(cid, meta["soma_center"], meta["soma_radius"], SOMA)

    cells, compart, spiness, myelin = P.cells, P.compart, P.spiness, P.myelin

    # ------------------------------------------------------------- synapses
    # boutons along each axon -> nearest other-cell dendrite/spine site
    from scipy import spatial

    target_pts, target_cell, target_spine = [], [], []
    for cid, meta in cells_meta.items():
        if meta["type"] == 3:
            continue
        for pl in meta["polylines"]:
            if pl["comp"] != DENDRITE:
                continue
            # dense samples along the dendrite
            line = pl["pts"]
            for a in range(len(line) - 1):
                for t in np.linspace(0, 1, 4, endpoint=False):
                    target_pts.append(line[a] + t * (line[a + 1] - line[a]))
                    target_cell.append(cid)
                    target_spine.append(None)
        for sp in meta["spines"]:
            target_pts.append(sp["head_center"])
            target_cell.append(cid)
            target_spine.append(sp)
    syn_specs: List[dict] = []
    pair_counts: Dict[tuple, int] = {}
    if target_pts:
        t_xyz = np.asarray(target_pts) * [1, 1, az]
        tree = spatial.cKDTree(t_xyz)
        for cid, meta in cells_meta.items():
            if meta["type"] == 3:
                continue
            sign = "asym" if meta["type"] in (0, 2) else "sym"
            for pl in meta["polylines"]:
                if pl["kind"] != "axon":
                    continue
                line, radii = pl["pts"], pl["radii"]
                my0, my1 = meta.get("myelinated", (len(line) + 1, -1))
                cooldown = 0  # node gap between boutons on this axon
                for a in range(1, len(line) - 1):
                    if cooldown > 0:
                        cooldown -= 1
                        continue
                    if my0 <= a < my1:  # no boutons under myelin
                        continue
                    if rng.random() > 0.85:
                        continue
                    p = line[a]
                    dists, ii = tree.query(p * [1, 1, az], k=6,
                                           distance_upper_bound=0.12 * diag)
                    # prefer under-used partner pairs for synapse diversity
                    cands = [(d, i) for d, i in
                             zip(np.atleast_1d(dists), np.atleast_1d(ii))
                             if np.isfinite(d) and target_cell[i] != cid]
                    cands.sort(key=lambda di: (
                        pair_counts.get((cid, target_cell[di[1]]), 0), di[0]))
                    for dist, i in cands[:1]:
                        if pair_counts.get((cid, target_cell[i]), 0) >= 3:
                            continue
                        q = np.asarray(target_pts[i], np.float64)
                        post = target_cell[i]
                        sp = target_spine[i]
                        m = (p + q) / 2.0
                        # bridge: bouton bulge + target bulge meet at m.
                        # The tips must stay fat: the membrane stripping
                        # removes every voxel adjacent to the partner, so a
                        # thin (r<2) tip would be erased entirely and no
                        # contact would survive.
                        P.paint_capsule(cid, p, m, 2.6, 3.2, AXON)
                        P.paint_capsule(post, q, m, 2.6, 3.2, DENDRITE,
                                        SP_HEAD if sp is not None else
                                        (SP_SHAFT if cells_meta[post]["type"] in (0, 2) else None))
                        syn_specs.append({
                            "coord_vx": m, "pre_cell": cid, "post_cell": post,
                            "sign": sign, "on_spine": sp is not None,
                            "head_vol_vx": (4.0 / 3.0 * np.pi * sp["head_radius"] ** 3 / az)
                            if sp is not None else 0.0,
                        })
                        pair_counts[(cid, post)] = pair_counts.get((cid, post), 0) + 1
                        cooldown = 1
        cells, compart, spiness, myelin = P.cells, P.compart, P.spiness, P.myelin

    # membranes: boundary voxels (6-adj) between different nonzero cells and
    # towards background become extracellular gap
    from ..ops.contacts import detect_seg_boundaries

    interface = detect_seg_boundaries(cells.astype(np.uint32))
    membrane = interface & (cells > 0)
    cells_gapped = cells.copy()
    cells_gapped[membrane] = 0

    # synaptic junctions: painted ON the realized pre/post contact
    # interface (where both partners are within 2 voxels of a gap voxel),
    # so the contact-site stencil and the sj foreground agree — a GT
    # synapse entry is only recorded when its junction materialized
    sj_mask = np.zeros(shape, bool)
    sym_mask = np.zeros(shape, bool)
    asym_mask = np.zeros(shape, bool)
    syn_gt = []
    shp = np.asarray(shape)
    for spec in syn_specs:
        m = spec["coord_vx"]
        r = 6
        lo = np.maximum(np.round(m).astype(int) - [r, r, r // 2], 0)
        hi = np.minimum(np.round(m).astype(int) + [r + 1, r + 1, r // 2 + 1], shp)
        sl = tuple(slice(int(a), int(b)) for a, b in zip(lo, hi))
        box = cells_gapped[sl]
        pre1 = ndimage.binary_dilation(box == spec["pre_cell"], iterations=1)
        pre2 = ndimage.binary_dilation(pre1, iterations=1)
        post1 = ndimage.binary_dilation(box == spec["post_cell"], iterations=1)
        post2 = ndimage.binary_dilation(post1, iterations=1)
        # tight junction: gap voxels with the partners at most 3 voxels
        # apart (the membrane strip is 1-2 wide; the contact-site stencil
        # reaches across it) — the validity test for a GT entry
        tight = ((pre1 & post2) | (pre2 & post1)) & (box == 0)
        import os as _os
        if _os.environ.get("SYCONN_TPU_NEURO_DEBUG"):
            print("spec", spec["pre_cell"], "->", spec["post_cell"],
                  "tight", int(tight.sum()),
                  "pre-in-box", int((box == spec["pre_cell"]).sum()),
                  "post-in-box", int((box == spec["post_cell"]).sum()))
        if int(tight.sum()) < 6:
            continue  # bridge did not realize a usable contact
        junction = pre2 & post2 & (box == 0)
        # the synaptic density spans the cleft AND both partners' membrane
        # voxels (the contact-site kernel labels foreground voxels, so the
        # sj foreground must reach onto them for the syn overlap); the
        # cleft gap is included so each junction yields a solid ~200-voxel
        # training footprint instead of a sliver
        density = ndimage.binary_dilation(junction, iterations=3) & (
            (box == spec["pre_cell"]) | (box == spec["post_cell"])
            | (box == 0)
        )
        sj_mask[sl] |= density
        (asym_mask if spec["sign"] == "asym" else sym_mask)[sl] |= density
        # re-center the GT coordinate on the realized tight junction
        jc = np.argwhere(tight).mean(axis=0) + lo
        spec = dict(spec, coord_vx=jc)
        syn_gt.append(spec)
    sym_mask &= ~asym_mask  # overlapping junctions of opposite sign: asym wins

    # ------------------------------------------------------- supervoxels
    seg = np.zeros(shape, np.uint64)
    sv2cell: Dict[int, int] = {}
    next_sv = 1
    flat = cells_gapped.ravel()
    order = np.argsort(flat, kind="stable")
    counts = np.bincount(flat.astype(np.int64), minlength=n_cells + 1)
    starts = np.cumsum(np.concatenate([[0], counts[:-1]]))
    strides = np.array([shape[1] * shape[2], shape[2], 1], np.int64)
    for cid in range(1, n_cells + 1):
        if counts[cid] == 0:
            continue
        lin = order[starts[cid]: starts[cid] + counts[cid]]
        coords = np.stack([lin // strides[0], (lin // strides[1]) % shape[1],
                           lin % shape[2]], axis=1)
        k = min(svs_per_cell, max(1, len(coords) // 2500))
        # centers along the cell's own skeleton nodes (spread over processes)
        nodes = np.concatenate([pl["pts"] for pl in cells_meta[cid]["polylines"]]) \
            if cells_meta[cid]["polylines"] else coords[:1].astype(np.float64)
        sel = np.linspace(0, len(nodes) - 1, k).astype(np.int64)
        ctrs = nodes[sel] * [1, 1, az]
        cf = coords.astype(np.float64) * [1, 1, az]
        dd = ((cf[:, None, :] - ctrs[None]) ** 2).sum(-1) if k > 1 else None
        assign = np.argmin(dd, axis=1) if k > 1 else np.zeros(len(coords), np.int64)
        for j in range(k):
            selc = coords[assign == j]
            if not len(selc):
                continue
            seg[selc[:, 0], selc[:, 1], selc[:, 2]] = next_sv
            sv2cell[next_sv] = cid
            next_sv += 1

    # rag: same-cell adjacency of supervoxels
    pair_sets = []
    for a_sl, b_sl in (
        ((slice(None, -1),), (slice(1, None),)),
        ((slice(None), slice(None, -1)), (slice(None), slice(1, None))),
        ((slice(None), slice(None), slice(None, -1)),
         (slice(None), slice(None), slice(1, None))),
    ):
        a = seg[a_sl].reshape(-1)
        b = seg[b_sl].reshape(-1)
        selp = (a != 0) & (b != 0) & (a != b)
        lo = np.minimum(a[selp], b[selp])
        hi = np.maximum(a[selp], b[selp])
        pair_sets.append(np.unique((lo << np.uint64(32)) | hi))
    packed = np.unique(np.concatenate(pair_sets)) if pair_sets else np.zeros(0, np.uint64)
    lo = (packed >> np.uint64(32)).astype(np.uint64)
    hi = (packed & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    same_cell = np.array([sv2cell[int(x)] == sv2cell[int(y)]
                          for x, y in zip(lo, hi)], bool) if len(packed) else np.zeros(0, bool)
    rag = np.stack([lo[same_cell], hi[same_cell]], axis=1).reshape(-1, 2)
    # isolated svs (single-sv cells) still need to appear downstream; the
    # ssd builder unions rag nodes with the sv id set, so this is fine.

    # ------------------------------------------------------- organelles
    in_cell = cells_gapped > 0
    # per-type organelle multipliers (mi, vc): strongly contrasted — the
    # first draft's mild ratios drowned in per-cell Poisson noise and the
    # celltype classifier could not separate types (held-out acc ~0.5)
    dens = {
        0: (3.0, 0.4), 1: (1.0, 1.0), 2: (0.5, 3.5), 3: (0.25, 0.2),
    }
    mi_mask = np.zeros(shape, bool)
    vc_mask = np.zeros(shape, bool)
    cell_coords = {}  # cached per-cell voxel coords for placement
    for cid in range(1, n_cells + 1):
        lin = order[starts[cid]: starts[cid] + counts[cid]]
        if not len(lin):
            continue
        coords = np.stack([lin // strides[0], (lin // strides[1]) % shape[1],
                           lin % shape[2]], axis=1)
        cell_coords[cid] = coords
        mi_mult, vc_mult = dens[celltypes[cid - 1]]
        n_mi = max(1, int(rng.poisson(mi_mult * len(coords) / 2500.0)))
        n_vc = max(1, int(rng.poisson(vc_mult * len(coords) / 1800.0)))
        for n, r, mask in ((n_mi, 3.2, mi_mask), (n_vc, 2.5, vc_mask)):
            if not len(coords):
                continue
            picks = coords[rng.integers(0, len(coords), n)]
            for p in picks:
                slb, mb, _ = P.capsule_mask(p.astype(np.float64),
                                            p.astype(np.float64), r, r)
                if slb is not None:
                    mask[slb] |= mb & (cells_gapped[slb] == cid)

    # presynaptic vesicle clouds at every realized synapse: SyConn's 'vc'
    # class IS the synaptic vesicle cloud, and the vesicle bouton next to a
    # dark junction is how EM (and the models) recognize a synapse
    for spec in syn_gt:
        c = np.round(spec["coord_vx"]).astype(int)
        r = 6
        lo = np.maximum(c - [r, r, r // 2], 0)
        hi = np.minimum(c + [r + 1, r + 1, r // 2 + 1], np.asarray(shape))
        sl = tuple(slice(int(a), int(b)) for a, b in zip(lo, hi))
        box = cells_gapped[sl]
        near_j = ndimage.binary_dilation(sj_mask[sl], iterations=3)
        pre_region = (box == spec["pre_cell"]) & near_j
        pv = np.argwhere(pre_region)
        if len(pv):
            seeds_v = np.zeros(box.shape, bool)
            picks = pv[rng.integers(0, len(pv), min(6, len(pv)))]
            seeds_v[picks[:, 0], picks[:, 1], picks[:, 2]] = True
            vc_mask[sl] |= ndimage.binary_dilation(seeds_v, iterations=1) & (
                box == spec["pre_cell"])

    # er/golgi: thin walks / disc stacks in somata (kept from the toy world)
    er_mask = np.zeros(shape, bool)
    golgi_mask = np.zeros(shape, bool)
    for cid, meta in cells_meta.items():
        c = meta["soma_center"].astype(np.int64)
        p = np.clip(c, 1, np.asarray(shape) - 2)
        px, py, pz = (int(v) for v in p)
        steps = rng.integers(-1, 2, (100, 3))
        for dx, dy, dz in steps.tolist():
            qx = int(np.clip(px + dx, 1, shape[0] - 2))
            qy = int(np.clip(py + dy, 1, shape[1] - 2))
            qz = int(np.clip(pz + dz, 1, shape[2] - 2))
            if cells_gapped[qx, qy, qz] == cid:
                px, py, pz = qx, qy, qz
            er_mask[px, py, pz] = True
        if meta["type"] != 3 and rng.random() < 0.8:
            xx, yy = np.meshgrid(np.arange(-5, 6), np.arange(-5, 6), indexing="ij")
            disc = (xx / 5.0) ** 2 + (yy / 5.0) ** 2 <= 1.0
            for dz in range(-2, 3, 2):
                z = int(np.clip(c[2] + dz, 0, shape[2] - 1))
                sl0 = slice(max(c[0] - 5, 0), c[0] + 6)
                sl1 = slice(max(c[1] - 5, 0), c[1] + 6)
                region = golgi_mask[sl0, sl1, z]
                d = disc[: region.shape[0], : region.shape[1]]
                region |= d & (cells_gapped[sl0, sl1, z][: d.shape[0], : d.shape[1]] == cid)
    er_mask = ndimage.binary_dilation(er_mask, iterations=1) & in_cell

    # ------------------------------------------------------------ raw image
    # EM-like intensity model: electron-lucent extracellular resin (LIGHT),
    # dark stained membranes at every cell surface, cytoplasm in between,
    # organelles with distinctive signatures (mitochondria carry a cristae
    # stripe texture; myelin is the darkest, lamellar; vesicle clouds are
    # bright). The first neuron-world draft made 98% of the volume dark
    # featureless background whose intensity overlapped mi/myelin — models
    # over-fired on it (train-world mi precision 0.015).
    raw = rng.normal(128, 12, shape)
    bg = cells_gapped == 0
    raw[bg] = rng.normal(172, 9, int(bg.sum()))
    # membrane stain: the stripped interface voxels + every cell surface
    in_cells = cells_gapped > 0
    surface = in_cells & ~ndimage.binary_erosion(in_cells)
    mem_band = membrane | surface
    raw[mem_band] = rng.normal(45, 9, int(mem_band.sum()))
    # organelles
    raw[er_mask] -= 25
    raw[golgi_mask] -= 40
    raw[mi_mask] = rng.normal(96, 7, int(mi_mask.sum()))
    # cristae: stripes every 2 voxels along x inside mitochondria
    stripe = ((np.arange(shape[0]) // 2) % 2 == 0)[:, None, None]
    mi_stripe = mi_mask & np.broadcast_to(stripe, shape)
    raw[mi_stripe] -= 40
    raw[vc_mask] = rng.normal(202, 8, int(vc_mask.sum()))
    raw[myelin] = rng.normal(18, 6, int(myelin.sum()))
    # junction densities: each sign gets its own intensity niche BETWEEN
    # membrane (45) and mitochondria (96). An earlier draft put asym sj at
    # 21 - indistinguishable from myelin (18), which the organelle task
    # labels background, so 87% of sj voxels were predicted as bg
    raw[sym_mask] = rng.normal(76, 5, int(sym_mask.sum()))
    raw[asym_mask] = rng.normal(62, 5, int(asym_mask.sum()))
    raw = np.clip(raw, 0, 255).astype(np.uint8)

    to_prob = lambda m: (m.astype(np.uint8) * 255)
    return {
        "raw": raw,
        "seg": seg,
        "cells": cells_gapped,
        "mi": to_prob(mi_mask),
        "vc": to_prob(vc_mask),
        "sj": to_prob(sj_mask),
        "sym": to_prob(sym_mask),
        "asym": to_prob(asym_mask),
        "er": to_prob(er_mask),
        "golgi": to_prob(golgi_mask),
        "rag": rag,
        "sv2cell": sv2cell,
        # ---- ground truth extras
        "celltype_gt": ct_arr,
        "compart": np.where(cells_gapped > 0, compart, 255).astype(np.uint8),
        "spiness": np.where(cells_gapped > 0, spiness, 255).astype(np.uint8),
        "myelin": to_prob(myelin),
        "syn_gt": syn_gt,
        "cells_meta": cells_meta,
    }


def write_neuron_world(h5_dir: str, world: Optional[dict] = None, **kw) -> dict:
    """Write to the h5 + rag layout examples/start.py expects, plus the
    ground-truth extras as ``neuron_gt.npz`` next to them."""
    import os

    from ..handler.compression import save_to_h5py
    from ..io.graph import save_svgraph

    os.makedirs(h5_dir, exist_ok=True)
    if world is None:
        world = generate_neuron_world(**kw)
    for name in ["raw", "seg", "mi", "vc", "sj", "sym", "asym", "er", "golgi"]:
        save_to_h5py({name: world[name]}, os.path.join(h5_dir, f"{name}.h5"))
    save_svgraph(world["rag"], os.path.join(h5_dir, "neuron_rag.bz2"))
    np.savez_compressed(
        os.path.join(h5_dir, "neuron_gt.npz"),
        celltype_gt=world["celltype_gt"],
        compart=world["compart"],
        spiness=world["spiness"],
        myelin=world["myelin"],
        syn_coords=np.asarray([s["coord_vx"] for s in world["syn_gt"]],
                              np.float64).reshape(-1, 3),
        syn_pre=np.asarray([s["pre_cell"] for s in world["syn_gt"]], np.int64),
        syn_post=np.asarray([s["post_cell"] for s in world["syn_gt"]], np.int64),
        syn_sign=np.asarray([1 if s["sign"] == "asym" else -1
                             for s in world["syn_gt"]], np.int8),
    )
    return world
