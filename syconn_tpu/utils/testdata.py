"""Synthetic EM world generator for tests, examples and benchmarks.

Replaces the reference's downloadable example cubes (examples/start.py
expects raw/seg/mi/vc/sj/sym/asym h5 files + a neuron_rag.bz2): generates a
toy tissue volume with cells (Voronoi regions split into supervoxels),
tubular/blob organelles inside cells, synapse junctions at cell-cell
interfaces with sym/asym type maps, a noisy raw-EM-like image, and the
supervoxel adjacency graph.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage

__all__ = ["generate_toy_world", "write_toy_world"]


def generate_toy_world(
    shape: Sequence[int] = (192, 192, 96),
    n_cells: int = 5,
    svs_per_cell: int = 3,
    seed: int = 0,
    scale: Sequence[int] = (10, 10, 20),
) -> Dict[str, np.ndarray]:
    """Build the synthetic volume set.

    Returns dict with: raw (uint8), seg (uint64 supervoxels), mi/vc/sj
    (uint8 probability maps), sym/asym (uint8 maps), rag ((N, 2) uint64
    edges), cells (uint64 cell labels), sv2cell (dict).
    """
    rng = np.random.default_rng(seed)
    shape = tuple(int(s) for s in shape)
    scale = np.asarray(scale, np.float64)

    # ------------------------------------------------ cells: Voronoi regions
    n_seeds = n_cells
    seeds = np.stack(
        [rng.uniform(0.15 * s, 0.85 * s, n_seeds) for s in shape], axis=1
    )
    grid = np.stack(
        np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), axis=-1
    ).astype(np.float64)
    # anisotropy-aware distances
    d = np.zeros((n_seeds,) + shape, np.float64)
    for i in range(n_seeds):
        diff = (grid - seeds[i][None, None, None]) * scale[None, None, None] / scale[0]
        d[i] = np.linalg.norm(diff, axis=-1)
    cells = (np.argmin(d, axis=0) + 1).astype(np.uint64)
    # carve extracellular gaps between cells (1-voxel boundaries -> 0)
    from ..ops.contacts import detect_seg_boundaries

    bdry = detect_seg_boundaries(cells.astype(np.uint32))
    cells[bdry] = 0

    # --------------------------------------- supervoxels: split each cell
    seg = np.zeros(shape, np.uint64)
    sv2cell = {}
    next_sv = 1
    for c in range(1, n_seeds + 1):
        mask = cells == c
        if not mask.any():
            continue
        coords = np.argwhere(mask)
        k = min(svs_per_cell, max(1, len(coords) // 5000))
        centers = coords[rng.choice(len(coords), size=k, replace=False)]
        dd = np.linalg.norm(
            coords[:, None, :].astype(np.float64) - centers[None].astype(np.float64), axis=-1
        )
        assign = np.argmin(dd, axis=1)
        for j in range(k):
            sel = coords[assign == j]
            seg[sel[:, 0], sel[:, 1], sel[:, 2]] = next_sv
            sv2cell[next_sv] = c
            next_sv += 1

    # ------------------------------------------------------ rag (adjacency)
    edges = set()
    for a_sl, b_sl, ax in (
        ((slice(None, -1), slice(None), slice(None)), (slice(1, None), slice(None), slice(None)), 0),
        ((slice(None), slice(None, -1), slice(None)), (slice(None), slice(1, None), slice(None)), 1),
        ((slice(None), slice(None), slice(None, -1)), (slice(None), slice(None), slice(1, None)), 2),
    ):
        a = seg[a_sl].reshape(-1)
        b = seg[b_sl].reshape(-1)
        sel = (a != 0) & (b != 0) & (a != b)
        for x, y in zip(a[sel], b[sel]):
            if sv2cell[int(x)] == sv2cell[int(y)]:  # RAG within cells only
                edges.add((min(int(x), int(y)), max(int(x), int(y))))
    # also bridge disconnected SVs of each cell (Voronoi split guarantees contact)
    rag = np.array(sorted(edges), np.uint64).reshape(-1, 2)

    # -------------------------------------------------------- organelles
    def blobs_inside(n, r_vox, only_cells=None):
        out = np.zeros(shape, bool)
        placed = 0
        attempts = 0
        while placed < n and attempts < n * 20:
            attempts += 1
            p = np.array([rng.integers(r_vox, s - r_vox) for s in shape])
            cid = cells[p[0], p[1], p[2]]
            if cid == 0 or (only_cells is not None and cid not in only_cells):
                continue
            zz = max(1, r_vox // 2)
            sl = (
                slice(p[0] - r_vox, p[0] + r_vox + 1),
                slice(p[1] - r_vox, p[1] + r_vox + 1),
                slice(p[2] - zz, p[2] + zz + 1),
            )
            xx, yy, z2 = np.meshgrid(
                np.arange(-r_vox, r_vox + 1),
                np.arange(-r_vox, r_vox + 1),
                np.arange(-zz, zz + 1),
                indexing="ij",
            )
            ball = (xx / r_vox) ** 2 + (yy / r_vox) ** 2 + (z2 / max(zz, 1)) ** 2 <= 1.0
            region = out[sl]
            if region.shape != ball.shape:
                continue
            out[sl] |= ball & (cells[sl] == cid)
            placed += 1
        return out

    mi_mask = blobs_inside(max(6, n_cells * 3), 7)
    vc_mask = blobs_inside(max(8, n_cells * 4), 5)

    # sj: at cell-cell interfaces — dilate boundary, keep between two cells
    interface = ndimage.binary_dilation(cells == 0, iterations=2)
    # pick contact patches: random subset of interface blobs
    sj_seed = rng.random(shape) < 0.004
    sj_mask = ndimage.binary_dilation(sj_seed & interface, iterations=3) & interface

    # sym/asym: split sj regions arbitrarily by x-parity of blob index
    sj_lab, n_sj = ndimage.label(sj_mask)
    sym_mask = np.zeros(shape, bool)
    asym_mask = np.zeros(shape, bool)
    for i in range(1, n_sj + 1):
        m = sj_lab == i
        if i % 2 == 0:
            sym_mask |= m
        else:
            asym_mask |= m

    # ------------------------------------------------------------- raw image
    raw = rng.normal(128, 15, shape)
    raw[cells == 0] -= 70  # dark membranes
    raw[mi_mask] -= 50
    raw[vc_mask] += 50
    raw[sj_mask] -= 35  # synaptic densities are dark in EM
    raw = np.clip(raw, 0, 255).astype(np.uint8)

    to_prob = lambda m: (m.astype(np.uint8) * 255)
    return {
        "raw": raw,
        "seg": seg,
        "cells": cells,
        "mi": to_prob(mi_mask),
        "vc": to_prob(vc_mask),
        "sj": to_prob(sj_mask),
        "sym": to_prob(sym_mask),
        "asym": to_prob(asym_mask),
        "rag": rag,
        "sv2cell": sv2cell,
    }


def write_toy_world(h5_dir: str, world: Optional[dict] = None, **kw) -> dict:
    """Write the toy world to the h5 + rag layout examples/start.py expects."""
    from ..handler.compression import save_to_h5py
    from ..io.graph import save_svgraph

    os.makedirs(h5_dir, exist_ok=True)
    if world is None:
        world = generate_toy_world(**kw)
    for name in ["raw", "seg", "mi", "vc", "sj", "sym", "asym"]:
        save_to_h5py({name: world[name]}, os.path.join(h5_dir, f"{name}.h5"))
    save_svgraph(world["rag"], os.path.join(h5_dir, "neuron_rag.bz2"))
    return world
