"""Host<->device link throughput probe.

The benchmark TPU is attached through a tunneled relay whose throughput
fluctuates by an order of magnitude between runs (measured 2.6-430 MB/s on
the same session). Device offload of volume work only pays when the
*downlink* can carry the results, so auto-dispatch decisions
(utils/jaxcfg.use_device_kernels, testdata's device world generator) gate
on a measured rate instead of assuming a healthy link.
"""

from __future__ import annotations

import logging
import time
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger("syconn_tpu.linkprobe")

__all__ = ["link_throughput_mbps", "downlink_mbps"]

_cache: Optional[Tuple[float, float]] = None


def link_throughput_mbps(size_mb: int = 8, refresh: bool = False) -> Tuple[float, float]:
    """(upload, download) MB/s to the default device, measured once per
    process (cached). Returns (inf, inf) on CPU backends (no transfer)."""
    global _cache
    if _cache is not None and not refresh:
        return _cache
    import jax

    if jax.default_backend() == "cpu":
        _cache = (float("inf"), float("inf"))
        return _cache
    x = np.zeros(size_mb * 1024 * 1024, np.uint8)
    t0 = time.perf_counter()
    xd = jax.device_put(x)
    xd.block_until_ready()
    t1 = time.perf_counter()
    np.asarray(xd)
    t2 = time.perf_counter()
    up = size_mb / max(t1 - t0, 1e-9)
    down = size_mb / max(t2 - t1, 1e-9)
    log.info("device link probe: up %.1f MB/s, down %.1f MB/s", up, down)
    _cache = (up, down)
    return _cache


def downlink_mbps(**kw) -> float:
    return link_throughput_mbps(**kw)[1]
