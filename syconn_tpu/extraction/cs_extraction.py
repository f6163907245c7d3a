"""Contact-site and synapse-fragment extraction — pipeline step 6a.

Reference parity: syconn/extraction/cs_extraction_steps.py —
``extract_contact_sites`` :44 with chunk worker
``_contact_site_extraction_thread`` :317 and reduce step
``_write_props_to_syn_thread`` :498.

Per chunk (+stencil halo): boundary detection + window-majority partner vote
(ops/contacts, native/XLA kernels) yields the contact-site segmentation
(labels = packed sorted SV-ID pairs). Each CS is closed/dilated
(background-only), intersected with the synapse-junction foreground to get
'syn' fragments, and symmetric/asymmetric type counts are accumulated. The
reduce phase writes 'cs' and 'syn' SegmentationDatasets (attributes include
``sym_prop``/``asym_prop`` and voxel coordinate lists for the later
agglomeration) plus cs/syn label volumes.
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import global_params
from ..backend import AttributeDict, VoxelStorageLazyLoading
from ..handler.basics import kd_factory
from ..io.chunked import ChunkedVolume
from ..ops.contacts import cs_pair_unpack, detect_cs, extract_cs_syntype
from ..ops.morphology import get_aniso_struct, multi_mop_backgroundonly
from ..parallel.executor import map_parallel
from ..reps.rep_helper import subfold_from_ix
from ..reps.segmentation import SegmentationDataset

log = logging.getLogger("syconn_tpu.cs_extraction")

__all__ = ["extract_contact_sites"]


def _cdiv(a, b):
    return -(-a // b)


def extract_contact_sites(
    chunk_shape: Optional[Sequence[int]] = None,
    n_workers: Optional[int] = None,
    mag: int = 1,
    n_folders_fs: int = 100,
    mesh=None,
    overwrite: bool = True,
) -> Dict:
    """Extract 'cs' and 'syn' SegmentationDatasets + label volumes.

    When ``mesh`` (1D ``jax.sharding.Mesh`` over ``sp``) is given — or the
    config enables ``tpu.shard_pipeline`` with >1 device attached — the
    stencil detection of ``sp`` consecutive x-chunks runs as ONE sharded
    device program with the stencil halo exchanged over the interconnect
    (parallel/sharded.detect_cs_slab_sharded; reference fan-out:
    syconn/extraction/cs_extraction_steps.py:44). Outputs are identical to
    the serial path.

    With ``overwrite=False`` a crashed run resumes per chunk: each chunk's
    extracted properties persist in the step cache after its label chunks
    are durably written (reference worker idempotency:
    syconn/extraction/cs_processing_steps.py:455).
    """
    from ..utils.stepcache import StepCache, cached_map

    cache = StepCache("cs_extract", overwrite=overwrite)
    cfg = global_params.config
    kd = kd_factory(cfg.kd_seg_path)
    sh = kd.mag_shape(mag)
    if chunk_shape is None:
        chunk_shape = cfg["tpu"]["chunk_shape"]
    cs = np.minimum(np.asarray(chunk_shape, np.int64), sh)
    grid = _cdiv(sh, cs)
    stencil = np.asarray(cfg["cell_objects"]["cs_filtersize"], np.int32)
    halo = stencil // 2
    scale = kd.scale * mag
    struct = get_aniso_struct(scale)
    n_dil = int(cfg["cell_objects"]["cs_dilation"])
    sj_thresh = float(cfg["cell_objects"]["probathresholds"]["sj"]) * 255.0
    syntype_avail = bool(cfg["syntype_avail"])

    kd_sj = kd_factory(cfg.kd_sj_path) if os.path.isdir(cfg.kd_sj_path) else None
    kd_sym = kd_factory(cfg.kd_sym_path) if syntype_avail and os.path.isdir(cfg.kd_sym_path) else None
    kd_asym = kd_factory(cfg.kd_asym_path) if syntype_avail and os.path.isdir(cfg.kd_asym_path) else None

    cs_kd = ChunkedVolume.create(
        os.path.join(str(cfg.working_dir), "knossosdatasets", "cs_seg"),
        scale=scale, boundary=sh, chunk_shape=tuple(int(c) for c in cs),
    )
    syn_kd = ChunkedVolume.create(
        os.path.join(str(cfg.working_dir), "knossosdatasets", "syn_seg"),
        scale=scale, boundary=sh, chunk_shape=tuple(int(c) for c in cs),
    )

    chunk_ixs = [
        (cx, cy, cz) for cx in range(grid[0]) for cy in range(grid[1]) for cz in range(grid[2])
    ]

    # dispatch: device kernel when an accelerator is attached (the device
    # executes chunks serially; a lock keeps host threads from queue-piling)
    import threading

    from ..utils.jaxcfg import use_device_kernels

    # contact detection moves 4 B/voxel up + 8 B/voxel down; on transfer-
    # bound attachments the OpenMP host kernel wins, so the device path is
    # explicit opt-in (config tpu.use_device_kernels: true) rather than auto
    explicit = cfg["tpu"].get("use_device_kernels", "auto")
    device_path = use_device_kernels() and explicit is True
    dev_lock = threading.Lock()

    def _detect_host(seg):
        if seg.max() < 2**32:
            return detect_cs(seg.astype(np.uint32), stencil=stencil)
        # Contact-site IDs are packed partner pairs (lo << 32 | hi) — the
        # same inherent 32-bit-per-partner limit as the reference's codec
        # (syconn/extraction/cs_extraction_steps.py). Packing larger IDs
        # would silently corrupt every downstream cs_pair_unpack, so fail
        # loudly instead.
        raise ValueError(
            f"supervoxel IDs up to {int(seg.max())} exceed the 32-bit "
            "packed contact-site codec (lo << 32 | hi); relabel the "
            "segmentation to IDs < 2**32 before contact extraction"
        )

    def _post(cix, cs_seg):
        """Host post-processing after contact detection (threads)."""
        off = np.array(cix) * cs
        size = np.minimum(cs, sh - off)
        if not cs_seg.any():
            # no contact sites in this chunk: skip sj/sym/asym loads and
            # the morphology entirely; write the (trivial) label chunks
            empty = ({}, {}, {})
            cs_kd.save_seg(cs_seg, offset=off, mags=(mag,), data_mag=mag)
            syn_kd.save_seg(cs_seg, offset=off, mags=(mag,), data_mag=mag)
            return off, empty, ({}, {}, {}), {}, {}, {}
        # close + dilate each contact site into background only
        n_close = int(np.max(stencil // 2))
        if n_close > 0:
            cs_seg = multi_mop_backgroundonly("binary_closing", cs_seg, iterations=n_close, struct=struct)
        if n_dil > 0:
            cs_seg = multi_mop_backgroundonly("binary_dilation", cs_seg, iterations=n_dil, struct=struct)
        # synapse-junction foreground + type maps
        if kd_sj is not None:
            sj_fg = (kd_sj.load_raw(offset=off, size=size, mag=mag) >= sj_thresh).astype(np.uint8)
        else:
            sj_fg = np.zeros(tuple(size), np.uint8)
        if kd_sym is not None and kd_asym is not None:
            sym = (kd_sym.load_raw(offset=off, size=size, mag=mag) >= 128).astype(np.uint8)
            asym = (kd_asym.load_raw(offset=off, size=size, mag=mag) >= 128).astype(np.uint8)
        else:
            sym = np.zeros(tuple(size), np.uint8)
            asym = np.zeros(tuple(size), np.uint8)
        cs_props, syn_props, cs_asym, cs_sym, voxels_syn = extract_cs_syntype(
            cs_seg, sj_fg, asym, sym, offset=off
        )
        cs_kd.save_seg(cs_seg, offset=off, mags=(mag,), data_mag=mag)
        syn_kd.save_seg(cs_seg * (sj_fg > 0), offset=off, mags=(mag,), data_mag=mag)
        return off, cs_props, syn_props, cs_asym, cs_sym, voxels_syn

    def _load(cix):
        off = np.array(cix) * cs
        size = np.minimum(cs, sh - off)
        return kd.load_seg(offset=off - halo, size=size + 2 * halo, mag=mag)

    def _ckey(cix):
        return f"{cix[0]}_{cix[1]}_{cix[2]}"

    def _post_cached(cix, cs_seg):
        r = _post(cix, cs_seg)
        cache.store(_ckey(cix), r)
        return r

    # ------------------------------------------------- sharded slab path
    if mesh is None:
        from ..parallel.sharded import mesh_from_config

        mesh = mesh_from_config()
    slab_post_results = []
    n_sp = 0 if mesh is None else int(mesh.shape.get("sp", 1))
    if n_sp > 1:
        from concurrent.futures import ThreadPoolExecutor

        from ..parallel.sharded import detect_cs_slab_sharded, slab_runs

        # padded slabs cover EVERY chunk (incl. the x remainder — the last
        # slab zero-pads past the boundary and out-of-range outputs are
        # dropped), so nothing falls back to the serial path
        slabs, _ = slab_runs((int(grid[0]), int(grid[1]), int(grid[2])), n_sp, pad=True)
        chunk_ixs = []
        poster = ThreadPoolExecutor(max_workers=n_workers or 8)
        post_futs = []
        n_resumed = 0
        for cx0, cy, cz in slabs:
            in_range = [
                (cx0 + s, cy, cz) for s in range(n_sp) if cx0 + s < grid[0]
            ]
            if all(cache.done(_ckey(c)) for c in in_range):
                slab_post_results.extend(cache.load(_ckey(c)) for c in in_range)
                n_resumed += len(in_range)
                continue
            off = np.array([cx0 * cs[0], cy * cs[1], cz * cs[2]], np.int64)
            size = np.array(
                [n_sp * cs[0], min(cs[1], sh[1] - off[1]), min(cs[2], sh[2] - off[2])],
                np.int64,
            )
            seg = kd.load_seg(offset=off - halo, size=size + 2 * halo, mag=mag)
            if seg.max(initial=0) >= 2**31:
                # >31-bit SV IDs: route this slab through the serial path
                chunk_ixs.extend(in_range)
                continue
            packed = detect_cs_slab_sharded(
                seg, mesh, stencil=tuple(int(s) for s in stencil)
            )
            for s, cix in enumerate(in_range):
                sx = min(int(cs[0]), int(sh[0] - cix[0] * cs[0]))
                cs_seg = packed[s * cs[0] : s * cs[0] + sx]
                post_futs.append(poster.submit(_post_cached, cix, cs_seg))
        slab_post_results.extend(f.result() for f in post_futs)
        poster.shutdown()
        if n_resumed:
            log.info(
                "resume: %d completed chunks loaded from the step cache",
                n_resumed,
            )

    cached_results = [
        cache.load(_ckey(c)) for c in chunk_ixs if cache.done(_ckey(c))
    ]
    chunk_ixs = [c for c in chunk_ixs if not cache.done(_ckey(c))]
    if cached_results:
        log.info(
            "resume: %d completed chunks loaded from the step cache",
            len(cached_results),
        )

    # ------------------------------------------- HBM-resident device path
    # the segmentation already lives in device memory: windows are sliced
    # in HBM (zero upload) and contact voxels come back sparse — takes
    # precedence over both the upload-dispatcher and the host kernel
    res_seg = None
    if chunk_ixs and mag == 1:
        from ..io import resident as _resident

        res_seg = _resident.get(cfg.kd_seg_path, "seg", mag)
    if res_seg is not None and chunk_ixs:
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        from ..ops.contacts_jax import ResidentCsDetector

        det = ResidentCsDetector(
            res_seg, chunk=tuple(int(c) for c in cs),
            stencil=tuple(int(s) for s in stencil),
        )
        poster = ThreadPoolExecutor(max_workers=n_workers or 8)
        post_futs = []
        inflight: "deque" = deque()

        def _finish(handle):
            cix = handle[0]
            packed, ovf = det.fetch(handle)
            if ovf:
                packed = _detect_host(_load(cix))
            post_futs.append(poster.submit(_post_cached, cix, packed))

        for cix in chunk_ixs:
            inflight.append(det.dispatch(cix))
            while len(inflight) > 2:
                _finish(inflight.popleft())
        while inflight:
            _finish(inflight.popleft())
        results = [f.result() for f in post_futs]
        poster.shutdown()
    elif device_path:
        # pipelined: loader threads prefetch; the device detects (async,
        # depth 2); host threads do closing/typing/writes concurrently —
        # replaces lock-serialized per-thread device calls
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        from ..ops.contacts_jax import CsDispatcher

        dispatcher = CsDispatcher(stencil=tuple(int(s) for s in stencil))
        loader = ThreadPoolExecutor(max_workers=min(8, max(1, len(chunk_ixs))))
        poster = ThreadPoolExecutor(max_workers=n_workers or 8)
        prefetch = 4
        load_futs = {
            i: loader.submit(_load, chunk_ixs[i])
            for i in range(min(prefetch, len(chunk_ixs)))
        }
        inflight: deque = deque()
        post_futs = []
        for i in range(len(chunk_ixs)):
            seg = load_futs.pop(i).result()
            nxt = i + prefetch
            if nxt < len(chunk_ixs):
                load_futs[nxt] = loader.submit(_load, chunk_ixs[nxt])
            if seg.max() < 2**31:
                inflight.append((i, dispatcher.dispatch(seg)))
            else:
                post_futs.append(poster.submit(_post_cached, chunk_ixs[i], _detect_host(seg)))
            while len(inflight) > 2:
                j, handle = inflight.popleft()
                post_futs.append(poster.submit(_post_cached, chunk_ixs[j], dispatcher.fetch(handle)))
        while inflight:
            j, handle = inflight.popleft()
            post_futs.append(poster.submit(_post_cached, chunk_ixs[j], dispatcher.fetch(handle)))
        results = [f.result() for f in post_futs]
        loader.shutdown()
        poster.shutdown()
    else:

        def work(cix):
            return _post_cached(cix, _detect_host(_load(cix)))

        results = map_parallel(work, chunk_ixs, n_workers=n_workers, desc="extract_contact_sites")
    results = cached_results + results

    results = slab_post_results + results

    # --------------------------------------------------------------- reduce
    def merge_props(prop_key):
        rep: Dict[int, np.ndarray] = {}
        bb: Dict[int, np.ndarray] = {}
        sz: Dict[int, int] = defaultdict(int)
        for off, cs_p, syn_p, *_ in results:
            rd, bd, sd_ = (cs_p if prop_key == "cs" else syn_p)
            for k in sd_:
                gbb = bd[k] + off[None]
                if k in bb:
                    bb[k] = np.array(
                        [np.minimum(bb[k][0], gbb[0]), np.maximum(bb[k][1], gbb[1])]
                    )
                else:
                    bb[k] = gbb
                    rep[k] = rd[k] + off
                sz[k] += sd_[k]
        return rep, bb, sz

    cs_rep, cs_bb, cs_sz = merge_props("cs")
    syn_rep, syn_bb, syn_sz = merge_props("syn")
    asym_tot: Dict[int, int] = defaultdict(int)
    sym_tot: Dict[int, int] = defaultdict(int)
    vox_tot: Dict[int, List[np.ndarray]] = defaultdict(list)
    for off, _, _, cs_a, cs_s, vx in results:
        for k, v in cs_a.items():
            asym_tot[k] += v
        for k, v in cs_s.items():
            sym_tot[k] += v
        for k, coords in vx.items():
            vox_tot[k].append(coords)

    min_cs = int(cfg["cell_objects"]["min_obj_vx"].get("cs", 1))
    min_syn = int(cfg["cell_objects"]["min_obj_vx"].get("syn", 1))

    # ------------------------------------------------------- write datasets
    cs_path = os.path.join(str(cfg.working_dir), "knossosdatasets", "cs_seg")
    _write_partner_sd(
        "cs", cs_rep, cs_bb, cs_sz, None, None, None, min_cs, n_folders_fs, cs_path, n_workers
    )
    _write_partner_sd(
        "syn", syn_rep, syn_bb, syn_sz, asym_tot, sym_tot, vox_tot, min_syn, n_folders_fs,
        os.path.join(str(cfg.working_dir), "knossosdatasets", "syn_seg"), n_workers,
    )
    n_cs = sum(1 for k, v in cs_sz.items() if v >= min_cs)
    n_syn = sum(1 for k, v in syn_sz.items() if v >= min_syn)
    cache.mark_complete()
    log.info("extract_contact_sites: %d cs, %d syn fragments", n_cs, n_syn)
    return {"n_cs": n_cs, "n_syn": n_syn}


def _write_partner_sd(
    obj_type: str,
    rep, bb, sz,
    asym_tot, sym_tot, vox_tot,
    min_vx: int,
    n_folders_fs: int,
    voxeldata_path: str,
    n_workers,
):
    cfg = global_params.config
    sd = SegmentationDataset(
        obj_type, working_dir=cfg.working_dir, n_folders_fs=n_folders_fs, create=True
    )
    ids = np.array(sorted(k for k, v in sz.items() if v >= min_vx), np.uint64)
    by_shard = defaultdict(list)
    for oid in ids:
        by_shard[subfold_from_ix(int(oid), n_folders_fs)].append(int(oid))

    def write_shard(item):
        shard, oids = item
        shard_dir = os.path.join(sd.so_storage_path, shard.strip("/"))
        os.makedirs(shard_dir, exist_ok=True)
        ad = AttributeDict(os.path.join(shard_dir, "attr_dict.pkl"), read_only=False, disable_locking=True)
        vl = (
            VoxelStorageLazyLoading(os.path.join(shard_dir, "voxel_lazy.npz"))
            if vox_tot is not None
            else None
        )
        for oid in oids:
            lo, hi = cs_pair_unpack(np.array([oid], np.uint64))
            attrs = {
                "id": oid,
                "size": int(sz[oid]),
                "rep_coord": np.asarray(rep[oid], np.int64),
                "bounding_box": np.asarray(bb[oid], np.int64),
                "partner_ids": np.array([int(lo[0]), int(hi[0])], np.uint64),
            }
            if obj_type == "syn":
                n_a = int(asym_tot.get(oid, 0))
                n_s = int(sym_tot.get(oid, 0))
                total = max(int(sz[oid]), 1)
                attrs["asym_prop"] = n_a / total
                attrs["sym_prop"] = n_s / total
                attrs["cs_id"] = oid
            ad[oid] = attrs
            if vl is not None:
                coords = np.concatenate(vox_tot[oid]) if vox_tot[oid] else np.zeros((0, 3), np.int64)
                vl[oid] = coords
        ad.push()
        if vl is not None:
            vl.push()

    map_parallel(write_shard, list(by_shard.items()), n_workers=n_workers, desc=f"write_{obj_type}")
    sd.save_numpy_data("id", ids)
    sd.save_numpy_data("size", np.array([sz[int(i)] for i in ids], np.int64))
    sd.save_numpy_data("rep_coord", np.array([rep[int(i)] for i in ids], np.int64).reshape(-1, 3))
    sd.save_numpy_data(
        "bounding_box", np.array([bb[int(i)] for i in ids], np.int64).reshape(-1, 2, 3)
    )
    if obj_type == "syn":
        total = np.array([max(sz[int(i)], 1) for i in ids], np.float64)
        sd.save_numpy_data(
            "asym_prop", np.array([asym_tot.get(int(i), 0) for i in ids]) / total
        )
        sd.save_numpy_data(
            "sym_prop", np.array([sym_tot.get(int(i), 0) for i in ids]) / total
        )
