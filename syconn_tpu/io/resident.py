"""HBM-resident volume store — the device-resident pipeline backbone.

Round-2 measurement (BENCH_r02): the dense path moved 9x more bytes over
the host<->device link than it computed, because every pipeline step
re-streamed the volume (disk -> host -> device -> host) even though the
whole working set fits in one chip's HBM several times over. This module
keeps full volumes *in device memory across steps*: the synthetic world /
ingested data registers its arrays once, dense prediction slices tiles
from HBM instead of uploading them, contact detection and the property
scans read the segmentation in place, and only compact results (packed
masks, sparse contact voxels, per-object tables) cross the link.

Design notes (TPU-first):

* keys are ``(volume_path, channel, mag)`` — the same coordinates the
  chunked disk store uses, so any consumer holding a ``ChunkedVolume``
  path can probe for a resident copy and fall back to disk transparently;
* ``seg`` channels are held as int32 (the device kernels' label space;
  callers must relabel >2^31 ids first — same limit as the packed
  contact codec), ``raw`` as uint8;
* mag pyramid levels are derived *on device* (mean-pool for raw, stride
  for seg) and cached, so a mag-4 consumer never touches the host;
* a byte budget (config ``tpu.resident_hbm_gb``) guards HBM: a put that
  would exceed it is refused (the caller keeps its disk path) — no silent
  eviction mid-pipeline;
* puts are asynchronous (``jax.device_put`` returns immediately); the
  first consumer of the array blocks on the transfer, which typically
  overlaps preceding host work.

The disk store remains the durability layer — every resident volume is
also written to its chunked store; this cache only removes re-streaming.
"""

from __future__ import annotations

import logging
import os
import threading
from typing import Dict, Optional, Tuple

import numpy as np

from ..utils.jaxcfg import setup_jax

setup_jax()

log = logging.getLogger("syconn_tpu.resident")

__all__ = [
    "put", "get", "drop", "clear", "enabled", "total_bytes", "stats",
    "trip", "tripped", "timed_fetch",
]

_REG: Dict[Tuple[str, str, int], "object"] = {}
_LOCK = threading.Lock()
_TRIPPED = False

_DTYPES = {"raw": np.uint8, "seg": np.int32}


def trip(reason: str = "") -> None:
    """Disable the resident store for the rest of the process — called when
    a consumer observes the device link collapsing mid-run (the relay
    degrades by orders of magnitude between sessions; a wedged readback
    must not hold every subsequent step hostage). In-flight steps finish on
    their current path; later steps fall back to disk/host."""
    global _TRIPPED
    if not _TRIPPED:
        _TRIPPED = True
        n = drop(None)
        log.warning(
            "resident store tripped (%s) — dropped %d volumes; subsequent "
            "steps use the disk/host paths", reason, n,
        )


def tripped() -> bool:
    return _TRIPPED


def _key(path: str, channel: str, mag: int) -> Tuple[str, str, int]:
    return (os.path.normpath(os.path.abspath(str(path))), channel, int(mag))


def _budget_bytes() -> int:
    try:
        from .. import global_params

        gb = float(global_params.config["tpu"].get("resident_hbm_gb", 10.0))
    except Exception:
        gb = 10.0
    return int(gb * (1 << 30))


def enabled() -> bool:
    """Resident volumes are on whenever an accelerator is attached, unless
    the config opts out (``tpu.resident_volumes: false``) or the store was
    tripped by a collapsed link."""
    if _TRIPPED:
        return False
    if os.environ.get("SYCONN_TPU_RESIDENT") is not None:
        return os.environ["SYCONN_TPU_RESIDENT"] == "1"
    try:
        from .. import global_params

        v = global_params.config["tpu"].get("resident_volumes", "auto")
    except Exception:
        v = "auto"
    if isinstance(v, bool):
        return v
    from ..utils.jaxcfg import device_is_accelerator

    return device_is_accelerator()


def total_bytes() -> int:
    with _LOCK:
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in _REG.values())


def stats() -> Dict[str, float]:
    with _LOCK:
        return {
            "n_volumes": len(_REG),
            "gb": sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in _REG.values())
            / (1 << 30),
        }


def put(path: str, channel: str, arr, mag: int = 1) -> bool:
    """Register a full volume for ``(path, channel, mag)``.

    ``arr`` may be a numpy array (uploaded asynchronously) or an already
    device-resident jax array (zero-copy). Returns False (and leaves the
    caller on its disk path) when resident mode is off, the dtype can't be
    represented, or the byte budget would be exceeded.
    """
    if not enabled():
        return False
    import jax
    import jax.numpy as jnp

    want = _DTYPES[channel]
    if channel == "seg":
        mx = int(np.asarray(arr).max()) if isinstance(arr, np.ndarray) else None
        if mx is not None and mx >= 2**31:
            log.warning("resident put refused: seg ids exceed int32 (%d)", mx)
            return False
    nbytes = int(np.prod(np.asarray(arr).shape)) * np.dtype(want).itemsize
    if total_bytes() + nbytes > _budget_bytes():
        log.warning(
            "resident put refused: %s would exceed the %.1f GB HBM budget "
            "(%.2f GB resident)",
            _key(path, channel, mag), _budget_bytes() / (1 << 30),
            total_bytes() / (1 << 30),
        )
        return False
    if isinstance(arr, np.ndarray):
        # uploading a host array only pays if the uplink can carry it; on
        # a degraded relay (measured 0.07-430 MB/s between sessions) the
        # caller keeps its disk path instead
        from ..utils import linkcfg

        if nbytes > linkcfg.get("resident_upload_probe_mb") * (1 << 20):
            from ..utils.linkprobe import link_throughput_mbps

            up, _ = link_throughput_mbps()
            if up < linkcfg.get("resident_min_uplink_mbps"):
                log.warning(
                    "resident put refused: uplink %.1f MB/s too slow for a "
                    "%.0f MB upload", up, nbytes / (1 << 20),
                )
                return False
        dev = jax.device_put(jnp.asarray(arr.astype(want, copy=False)))
    else:
        dev = arr.astype(want) if arr.dtype != want else arr
    with _LOCK:
        _REG[_key(path, channel, mag)] = dev
    log.info(
        "resident: registered %s %s mag%d (%.2f GB total)",
        os.path.basename(os.path.normpath(str(path))), channel, mag,
        (total_bytes()) / (1 << 30),
    )
    return True


def get(path: str, channel: str, mag: int = 1, derive: bool = True):
    """Return the resident jax array for ``(path, channel, mag)`` or None.

    With ``derive=True`` a missing mag level is computed on device from
    mag 1 (raw: 2x mean-pool per octave; seg: stride sampling — matching
    the chunked store's pyramid semantics) and cached.
    """
    k = _key(path, channel, mag)
    with _LOCK:
        if k in _REG:
            return _REG[k]
    if not derive or mag == 1:
        return None
    base = get(path, channel, 1, derive=False)
    if base is None or (mag & (mag - 1)) != 0:
        return None
    import jax.numpy as jnp

    dev = base
    m = 1
    while m < mag:
        sh = dev.shape
        if any(s < 2 for s in sh):
            return None
        ev = tuple((s // 2) * 2 for s in sh)
        dev = dev[: ev[0], : ev[1], : ev[2]]
        if channel == "raw":
            # reshape-free 2x mean-pool: the (n,2,m,2,k,2) reshape gets its
            # trailing size-2 dims padded to the TPU tile — a 64x HBM
            # blowup (46 GB for the 1100x1100x600 reference volume, OOM).
            # Eight stride-2 slices keep every temporary at 1/8 the base;
            # integer sums of 8 u8 values are exact in f32, so the result
            # is bit-identical to the reshape/mean formulation.
            acc = None
            for di in range(2):
                for dj in range(2):
                    for dk in range(2):
                        s = dev[di::2, dj::2, dk::2].astype(jnp.float32)
                        acc = s if acc is None else acc + s
            dev = (acc * 0.125).astype(jnp.uint8)
        else:
            dev = dev[::2, ::2, ::2]
        m *= 2
    with _LOCK:
        _REG[_key(path, channel, mag)] = dev
    return dev


def drop(path: Optional[str] = None, channel: Optional[str] = None) -> int:
    """Forget resident volumes (all of a path, a (path, channel), or
    everything with ``path=None``). Returns the number dropped."""
    with _LOCK:
        if path is None:
            n = len(_REG)
            _REG.clear()
            return n
        norm = os.path.normpath(os.path.abspath(str(path)))
        keys = [
            k for k in _REG
            if k[0] == norm and (channel is None or k[1] == channel)
        ]
        for k in keys:
            del _REG[k]
        return len(keys)


def clear() -> None:
    drop(None)


_fetch_count = 0


def timed_fetch(dev) -> np.ndarray:
    """Device->host fetch that trips the store when a small transfer takes
    absurdly long (collapsed relay). The first fetches are exempt — they
    may include queued compile/execution time.

    A fetch that HANGS (wedged relay stream, observed mid-run) is abandoned
    after a hard deadline: the store trips and ``TimeoutError`` propagates —
    under the retrying executor the step reruns on the disk/host path
    instead of holding the whole pipeline hostage."""
    global _fetch_count
    import time

    from ..utils import linkcfg
    from ..utils.linkprobe import run_with_deadline

    nbytes = getattr(dev, "nbytes", 0) or (64 << 20)
    # generous floor: worst measured healthy-ish downlink (configurable)
    deadline = (linkcfg.get("fetch_deadline_base_s")
                + nbytes / (linkcfg.get("fetch_deadline_floor_mbps") * 1e6))
    t0 = time.perf_counter()
    ok, out = run_with_deadline(lambda: np.asarray(dev), deadline)
    dt = time.perf_counter() - t0
    if not ok:
        trip(f"fetch of {nbytes >> 10} KB hung >{deadline:.0f}s")
        raise TimeoutError(
            f"device fetch of {nbytes >> 10} KB exceeded {deadline:.0f}s")
    _fetch_count += 1
    if (_fetch_count > 2
            and out.nbytes < linkcfg.get("fetch_trip_max_mb") * (1 << 20)
            and dt > linkcfg.get("fetch_trip_seconds")):
        trip(f"fetch of {out.nbytes >> 10} KB took {dt:.0f}s")
    return out
