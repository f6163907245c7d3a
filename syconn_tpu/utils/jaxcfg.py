"""Process-wide JAX configuration for the framework.

Enables the persistent compilation cache (compiles of the tiled inference
and training programs cost minutes via remote-compile TPU attachments; the
cache amortizes them across processes and pipeline steps). Called lazily by
the modules that touch JAX; opt out with SYCONN_TPU_NO_JAX_CACHE=1.
"""

from __future__ import annotations

import os

_configured = False


def setup_jax():
    global _configured
    if _configured:
        return
    _configured = True
    import jax

    # Platform override: the ambient sitecustomize on TPU attachments pins
    # JAX_PLATFORMS=axon at interpreter start, so a plain env var cannot
    # force CPU for subprocesses (tests, local tooling). This package-level
    # escape hatch is applied before the backend initializes.
    platform = os.environ.get("SYCONN_TPU_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass
    if os.environ.get("SYCONN_TPU_NO_JAX_CACHE") == "1":
        return
    _enable_cache()


def _enable_cache():
    import jax

    cache_dir = os.environ.get(
        "SYCONN_TPU_JAX_CACHE", os.path.expanduser("~/.cache/syconn_tpu/jax")
    )
    # partition by platform: CPU executables AOT-compiled elsewhere (e.g. by
    # a remote-compile TPU terminal) can carry mismatched machine features
    platform = (
        os.environ.get("SYCONN_TPU_PLATFORM")
        or os.environ.get("JAX_PLATFORMS", "default")
    ).replace(",", "_")
    # ... and by host-CPU fingerprint: CPU AOT entries written by a machine
    # with different ISA features (sessions migrate across hosts) load with
    # "machine feature not supported" warnings and risk SIGILL
    try:
        import hashlib

        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    host = hashlib.sha1(line.encode()).hexdigest()[:8]
                    break
            else:
                host = "nohost"
    except OSError:
        host = "nohost"
    cache_dir = os.path.join(cache_dir, f"{platform}-{host}")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def gate_platform_on_link(min_downlink_mbps: float | None = None,
                          return_pinned: bool = False):
    """Pin the process to the CPU backend when the ambient accelerator's
    DOWNLINK cannot carry results (tunneled relay attachments have been
    observed to wedge mid-transfer at <0.2 MB/s with a live control plane —
    any step that reads predictions back would block forever).

    Call BEFORE the first jax use of the process (pipeline launchers do).
    Probes in a subprocess with hard deadlines; respects an explicit
    SYCONN_TPU_PLATFORM. Returns the platform the process will use, or
    ``(platform, pinned)`` with ``return_pinned=True`` — ``pinned`` is True
    only when THIS call newly forced CPU (so launchers can warn accurately).

    An UNSET JAX_PLATFORMS does NOT mean CPU: a directly-attached
    accelerator (the normal libtpu case) leaves it unset, and skipping the
    probe there would forfeit exactly the init-hang protection this gate
    exists for (ADVICE r3). Only an explicit cpu ambient skips the probe.
    """
    import logging
    import sys

    from . import linkcfg

    if min_downlink_mbps is None:
        min_downlink_mbps = linkcfg.get("min_downlink_mbps")

    def _ret(platform, pinned):
        return (platform, pinned) if return_pinned else platform

    log = logging.getLogger("syconn_tpu.jaxcfg")
    forced = os.environ.get("SYCONN_TPU_PLATFORM")
    if forced:
        return _ret(forced, False)
    ambient = os.environ.get("JAX_PLATFORMS", "")
    if ambient.strip().lower() == "cpu":
        return _ret(ambient, False)
    jax_mod = sys.modules.get("jax")
    if jax_mod is not None:
        try:
            if jax_mod._src.xla_bridge._backends:
                # backend already live in-process: too late to repin, and a
                # child probe would contend for the exclusive device
                return _ret(ambient or "default", False)
        except Exception:
            pass
    from .linkprobe import probe_link_subprocess

    up, down = probe_link_subprocess()
    if down <= 0.0 and up > 0.0:
        # uploads land but the first probe saw no downlink: the relay's
        # throughput is non-stationary (observed healthy<->collapsed swings
        # within one minute) — retry once before pinning an entire pipeline
        # run to the CPU backend (bench.py retries the same way)
        import time as _time

        _time.sleep(5.0)
        up, down = probe_link_subprocess()
    if not ambient and up == float("inf"):
        # unset ambient resolved to a CPU backend in the probe child: a
        # plain CPU host, nothing to gate
        return _ret("default", False)
    if down < min_downlink_mbps:
        log.warning(
            "accelerator downlink %.2f MB/s (< %.1f) — pinning this process "
            "to the CPU backend so no step can wedge on device readback",
            down, min_downlink_mbps)
        os.environ["SYCONN_TPU_PLATFORM"] = "cpu"
        return _ret("cpu", True)
    log.info("accelerator link ok: up %.1f MB/s, down %.1f MB/s", up, down)
    return _ret(ambient or "default", False)


def device_is_accelerator() -> bool:
    """True when the default JAX backend is a real accelerator (the voxel
    kernels then dispatch to their device implementations)."""
    setup_jax()
    import jax

    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def use_device_kernels() -> bool:
    """Config/env-driven dispatch switch for the device voxel kernels.

    Priority: env SYCONN_TPU_DEVICE_KERNELS (0/1) > config
    ``tpu.use_device_kernels`` (true/false/'auto') > auto (accelerator
    attached AND the measured device downlink can carry the chunk results
    — relay attachments fluctuate 2-400 MB/s, see utils/linkprobe)."""
    env = os.environ.get("SYCONN_TPU_DEVICE_KERNELS")
    if env is not None:
        return env == "1"
    try:
        from .. import global_params

        v = global_params.config["tpu"].get("use_device_kernels", "auto")
    except Exception:
        v = "auto"
    if isinstance(v, bool):
        return v
    if not device_is_accelerator():
        return False
    from . import linkcfg
    from .linkprobe import downlink_mbps

    return downlink_mbps() >= linkcfg.get("kernel_min_downlink_mbps")
