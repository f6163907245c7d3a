"""SegmentationDataset generation: fused property + mapping + mesh scan.

Rebuild of the reference's hottest dense path (reference:
syconn/proc/sd_proc.py:273 ``map_subcell_extract_props`` with the Cython
scan find_object_properties_C.pyx:112, reduce steps
``_write_props_to_sc_thread`` :788 / ``_write_props_to_sv_thread`` :984,
and ``dataset_analysis`` :40).

One pass over the volume per chunk yields, for the cell supervoxels and
every organelle type simultaneously: per-ID size / bounding box /
representative coordinate, organelle->cell overlap counts, and per-chunk
surface-net mesh fragments. Chunk results merge via sorted segmented
reductions (ops/props.py) and a single write phase populates the
per-shard stores + dataset-level numpy caches.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import global_params
from ..backend import AttributeDict, MeshStorage, VoxelStorageDyn
from ..handler.basics import kd_factory
from ..ops.props import merge_prop_arrays, object_properties_arrays, pair_counts
from ..parallel.executor import map_parallel
from ..reps.rep_helper import subfold_from_ix
from ..reps.segmentation import SegmentationDataset
from .meshes import find_meshes, merge_meshes

log = logging.getLogger("syconn_tpu.sd_proc")

__all__ = ["map_subcell_extract_props", "dataset_analysis", "sd_init"]


def _cdiv(a, b):
    return -(-a // b)


def map_subcell_extract_props(
    kd_seg_path: str,
    kd_organelle_paths: Dict[str, str],
    n_folders_fs: int = 100,
    n_folders_fs_sc: int = 100,
    chunk_shape: Optional[Sequence[int]] = None,
    n_workers: Optional[int] = None,
    generate_sv_meshes: bool = True,
    mag: int = 1,
    mesh_downsampling: Optional[Dict[str, Sequence[int]]] = None,
    device_mesh=None,
    overwrite: bool = True,
) -> Dict:
    """Extract all SegmentationDatasets (sv + organelles) in one volume scan.

    When ``device_mesh`` (1D ``jax.sharding.Mesh`` over ``sp``) is given —
    or the config enables ``tpu.shard_pipeline`` — each chunk's property
    scan and organelle-overlap counting run x-sharded over the mesh
    (parallel/sharded.object_properties_sharded / pair_counts_sharded),
    the TPU equivalent of the reference's per-chunk SLURM fan-out of the
    Cython scan (syconn/proc/sd_proc.py:273). Falls back to the host scan
    per chunk when shapes/ID ranges don't fit.

    Returns per-type object counts.
    """
    cfg = global_params.config
    kd = kd_factory(kd_seg_path)
    sh = kd.mag_shape(mag)
    if chunk_shape is None:
        chunk_shape = cfg["tpu"]["chunk_shape"]
    cs = np.minimum(np.asarray(chunk_shape, np.int64), sh)
    grid = _cdiv(sh, cs)
    organelles = list(kd_organelle_paths.keys())
    kd_orgs = {co: kd_factory(p) for co, p in kd_organelle_paths.items()}
    scale = kd.scale * mag
    if mesh_downsampling is None:
        mesh_downsampling = cfg["meshes"]["downsampling"]
    min_obj_vx = cfg["cell_objects"]["min_obj_vx"]

    chunk_ixs = [
        (cx, cy, cz) for cx in range(grid[0]) for cy in range(grid[1]) for cz in range(grid[2])
    ]

    if device_mesh is None:
        from ..parallel.sharded import mesh_from_config

        device_mesh = mesh_from_config()
    n_sp = 0 if device_mesh is None else int(device_mesh.shape.get("sp", 1))

    def _props(vol):
        if n_sp > 1 and vol.shape[0] % n_sp == 0 and vol.max(initial=0) < 2**31:
            from ..parallel.sharded import object_properties_sharded

            try:
                return object_properties_sharded(vol, device_mesh)
            except ValueError:  # per-shard table overflow -> host scan
                pass
        return object_properties_arrays(vol)

    def _pairs(sc, cell):
        if (
            n_sp > 1
            and sc.shape[0] % n_sp == 0
            and max(sc.max(initial=0), cell.max(initial=0)) < 2**31
        ):
            from ..parallel.sharded import pair_counts_sharded

            try:
                return pair_counts_sharded(sc, cell, device_mesh)
            except ValueError:
                pass
        return pair_counts(sc, cell)

    # HBM-resident cell segmentation: the per-chunk property scan (host
    # argsort of a dense 16M-voxel chunk — the SD-generation hot spot on a
    # single host core) runs on device from in-HBM windows
    res_scanner = None
    if mag == 1:
        from ..io import resident as _resident

        res_cell = _resident.get(kd_seg_path, "seg", mag)
        if res_cell is not None:
            from ..ops.props_jax import ResidentPropsScanner

            res_scanner = ResidentPropsScanner(
                res_cell, chunk=tuple(int(c) for c in cs)
            )

    def work_chunk(cix):
        off = np.array(cix) * cs
        size = np.minimum(cs, sh - off)
        cell = kd.load_seg(offset=off, size=size, mag=mag)
        res = {"off": off}
        res["sv"] = res_scanner.props(cix) if res_scanner is not None else _props(cell)
        res["pairs"] = {}
        res["sc"] = {}
        meshes = {}
        if generate_sv_meshes:
            meshes["sv"] = find_meshes(
                cell, off, scale, downsampling=mesh_downsampling.get("sv", (1, 1, 1))
            )
        for co in organelles:
            sc = kd_orgs[co].load_seg(offset=off, size=size, mag=mag)
            res["sc"][co] = _props(sc)
            res["pairs"][co] = _pairs(sc, cell)
            meshes[co] = find_meshes(
                sc, off, scale, downsampling=mesh_downsampling.get(co, (1, 1, 1))
            )
        res["meshes"] = meshes
        return res

    # worker-level resume: per-chunk scan results persist in the step cache
    # (reference idempotency: syconn/proc/sd_proc.py:689-726); a rerun with
    # overwrite=False skips completed chunks
    from ..utils.stepcache import StepCache, cached_map

    cache = StepCache("sd_props", overwrite=overwrite)
    chunk_results = cached_map(
        work_chunk, chunk_ixs, cache,
        key_fn=lambda c: f"{c[0]}_{c[1]}_{c[2]}",
        n_workers=n_workers, desc="map_subcell_extract_props",
    )

    # ------------------------------------------------------------ merge phase
    counts = {}
    all_types = ["sv"] + organelles
    merged: Dict[str, Tuple] = {}
    mesh_frags: Dict[str, Dict[int, List]] = {t: defaultdict(list) for t in all_types}
    for t in all_types:
        parts = [r["sv"] if t == "sv" else r["sc"][t] for r in chunk_results]
        # object_properties_arrays returns chunk-local coords; shift into the
        # global frame before the segmented merge
        merged[t] = _merge_with_offsets(parts, [r["off"] for r in chunk_results])
        for r in chunk_results:
            for oid, m in r["meshes"].get(t, {}).items():
                mesh_frags[t][oid].append(m)

    # organelle -> cell mapping counts, merged over chunks
    mapping: Dict[str, Dict[int, Dict[int, int]]] = {co: defaultdict(dict) for co in organelles}
    for r in chunk_results:
        for co in organelles:
            a_ids, c_ids, cnts = r["pairs"][co]
            mp = mapping[co]
            for sc_id, c_id, cnt in zip(a_ids, c_ids, cnts):
                d = mp[int(sc_id)]
                d[int(c_id)] = d.get(int(c_id), 0) + int(cnt)
    del chunk_results

    # ---------------------------------------------------------- write phase
    # organelle sizes, needed for overlap ratios on both sides
    sc_sizes = {
        co: dict(zip((int(i) for i in merged[co][0]), (int(s) for s in merged[co][3])))
        for co in organelles
    }
    for t in all_types:
        ids, rep, bb, sz = merged[t]
        thresh = int(min_obj_vx.get(t, 1))
        keep = sz >= thresh
        ids, rep, bb, sz = ids[keep], rep[keep], bb[keep], sz[keep]
        nf = n_folders_fs if t == "sv" else n_folders_fs_sc
        sd = SegmentationDataset(
            t, working_dir=cfg.working_dir, n_folders_fs=nf, create=True
        )
        seg_path = kd_seg_path if t == "sv" else kd_organelle_paths[t]
        _write_type(
            sd, ids, rep, bb, sz, mesh_frags[t],
            mapping.get(t), mapping if t == "sv" else None, organelles,
            seg_path, n_workers, sc_sizes,
        )
        counts[t] = len(ids)
    cache.mark_complete()
    log.info("SD generation done: %s", counts)
    return counts


def _merge_with_offsets(parts, offsets):
    shifted = []
    for (ids, rep, bb, sz), off in zip(parts, offsets):
        off = np.asarray(off, np.int64)
        shifted.append((ids, rep + off[None], bb + off[None, None], sz))
    return merge_prop_arrays(shifted)


def _write_type(
    sd: SegmentationDataset,
    ids, rep, bb, sz,
    mesh_frags: Dict[int, List],
    sc_mapping: Optional[Dict[int, Dict[int, int]]],
    sv_mappings: Optional[Dict[str, Dict[int, Dict[int, int]]]],
    organelles: List[str],
    voxeldata_path: str,
    n_workers,
    sc_sizes: Optional[Dict[str, Dict[int, int]]] = None,
):
    """Write per-shard stores + numpy caches for one object type."""
    id_set = set(int(i) for i in ids)
    size_of = dict(zip((int(i) for i in ids), (int(s) for s in sz)))
    # reverse aggregation for cell SVs: organelle objects mapped per SV
    sv_agg = None
    if sv_mappings is not None:
        sv_agg = {co: defaultdict(list) for co in organelles}
        for co in organelles:
            for sc_id, cell_counts in sv_mappings[co].items():
                for c_id, cnt in cell_counts.items():
                    if c_id in id_set:
                        sv_agg[co][c_id].append((sc_id, cnt))

    by_shard = defaultdict(list)
    for k, oid in enumerate(ids):
        by_shard[subfold_from_ix(int(oid), sd.n_folders_fs)].append(k)

    def write_shard(item):
        shard, ixs = item
        import os

        shard_dir = os.path.join(sd.so_storage_path, shard.strip("/"))
        os.makedirs(shard_dir, exist_ok=True)
        ad = AttributeDict(os.path.join(shard_dir, "attr_dict.pkl"), read_only=False, disable_locking=True)
        ms = MeshStorage(os.path.join(shard_dir, "mesh.pkl"), read_only=False, disable_locking=True)
        vd = VoxelStorageDyn(
            os.path.join(shard_dir, "voxel_dyn.pkl"),
            read_only=False,
            disable_locking=True,
            voxeldata_path=voxeldata_path,
        )
        for k in ixs:
            oid = int(ids[k])
            attrs = {
                "id": oid,
                "size": int(sz[k]),
                "rep_coord": rep[k].astype(np.int64),
                "bounding_box": bb[k].astype(np.int64),
            }
            if sc_mapping is not None:
                cc = sc_mapping.get(oid, {})
                m_ids = np.array(sorted(cc.keys()), np.uint64)
                m_ratios = np.array([cc[int(i)] for i in m_ids], np.float64) / max(int(sz[k]), 1)
                attrs["mapping_ids"] = m_ids
                attrs["mapping_ratios"] = m_ratios
            if sv_agg is not None:
                # per-SV reverse mapping; ratio = overlap / ORGANELLE size so
                # summing over a cell's SVs yields the fraction of the
                # organelle inside the cell (mapping-decision semantics)
                for co in organelles:
                    entries = sv_agg[co].get(oid, [])
                    entries.sort()
                    attrs[f"mapping_{co}_ids"] = np.array([e[0] for e in entries], np.uint64)
                    attrs[f"mapping_{co}_ratios"] = np.array(
                        [
                            cnt / max(sc_sizes[co].get(int(sc_id), 1), 1)
                            for sc_id, cnt in entries
                        ],
                        np.float64,
                    )
            ad[oid] = attrs
            frags = mesh_frags.get(oid, [])
            if frags:
                ms[oid] = merge_meshes(frags)
            vd.append_bounding_box(oid, bb[k])
            vd.increase_object_size(oid, int(sz[k]))
        ad.push()
        ms.push()
        vd.push()

    map_parallel(write_shard, list(by_shard.items()), n_workers=n_workers, desc=f"write_{sd.type}")

    sd.save_numpy_data("id", ids.astype(np.uint64))
    sd.save_numpy_data("size", sz.astype(np.int64))
    sd.save_numpy_data("rep_coord", rep.astype(np.int64))
    sd.save_numpy_data("bounding_box", bb.astype(np.int64))


def dataset_analysis(
    sd: SegmentationDataset,
    recompute: bool = False,
    compute_meshprops: bool = False,
    n_workers: Optional[int] = None,
):
    """Collect per-object attributes into ``{attr}s.npy`` dataset caches
    (reference: sd_proc.py:40)."""
    import os

    def collect(shard_dir):
        p = os.path.join(shard_dir, "attr_dict.pkl")
        if not os.path.isfile(p):
            return {}
        ad = AttributeDict(p, read_only=True, disable_locking=True)
        return {int(k): dict(v) for k, v in ad.items()}

    all_attrs: Dict[int, dict] = {}
    for d in map_parallel(collect, sd.so_dir_paths, n_workers=n_workers, desc="dataset_analysis"):
        all_attrs.update(d)
    if not all_attrs:
        sd.save_numpy_data("id", np.zeros(0, np.uint64))
        sd.save_numpy_data("size", np.zeros(0, np.int64))
        sd.save_numpy_data("rep_coord", np.zeros((0, 3), np.int64))
        sd.save_numpy_data("bounding_box", np.zeros((0, 2, 3), np.int64))
        return
    ids = np.array(sorted(all_attrs.keys()), np.uint64)
    # union of keys; missing values become None (object arrays)
    keys = set()
    for a in all_attrs.values():
        keys.update(a.keys())
    keys.discard("id")
    sd.save_numpy_data("id", ids)
    for key in keys:
        vals = [all_attrs[int(i)].get(key) for i in ids]
        try:
            arr = np.array(vals)
            if arr.dtype == object:
                raise ValueError
        except Exception:
            arr = np.empty(len(vals), dtype=object)
            arr[:] = vals
        sd.save_numpy_data(key, arr)
    if compute_meshprops:
        areas = []
        for i in ids:
            so = sd.get_segmentation_object(int(i))
            areas.append(so.mesh_area)
        sd.save_numpy_data("mesh_area", np.array(areas, np.float64))


def sd_init(co: str, max_n_jobs: Optional[int] = None, log=None):
    """Mesh-cache initialization hook (reference: exec_init.py:140). Meshes
    are generated during the fused scan here, so this only validates."""
    sd = SegmentationDataset(co, working_dir=global_params.config.working_dir)
    return sd.exists()
