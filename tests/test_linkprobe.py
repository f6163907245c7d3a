"""Link-probe + platform-gate behavior (utils/linkprobe, utils/jaxcfg).

The production failure mode these guard: a tunneled relay whose downlink
wedges mid-transfer (observed 0.1 MB/s with a live control plane) would
block the first pipeline step that reads predictions back. The launcher
probes both legs in a subprocess and pins the run to the CPU backend.
"""

import os
import sys

from syconn_tpu.utils import jaxcfg, linkprobe


def test_probe_subprocess_reports_inf_on_cpu(monkeypatch):
    # the ambient sitecustomize re-pins JAX_PLATFORMS at interpreter start,
    # so the child must be redirected via the in-process probe hook
    monkeypatch.setenv("SYCONN_TPU_PROBE_PLATFORM", "cpu")
    up, down = linkprobe.probe_link_subprocess(timeout_s=120.0)
    assert up == float("inf") and down == float("inf")


def test_gate_respects_forced_platform(monkeypatch):
    monkeypatch.setenv("SYCONN_TPU_PLATFORM", "cpu")
    assert jaxcfg.gate_platform_on_link() == "cpu"


def test_gate_noop_on_cpu_ambient(monkeypatch):
    monkeypatch.delenv("SYCONN_TPU_PLATFORM", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert jaxcfg.gate_platform_on_link() == "cpu"
    assert "SYCONN_TPU_PLATFORM" not in os.environ


def test_gate_pins_cpu_on_dead_downlink(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv("SYCONN_TPU_PLATFORM", raising=False)
    # pretend jax is not yet imported so the gate reaches the probe
    monkeypatch.setitem(sys.modules, "jax", None)
    monkeypatch.setattr(linkprobe, "probe_link_subprocess",
                        lambda: (80.0, 0.0))
    assert jaxcfg.gate_platform_on_link() == "cpu"
    assert os.environ["SYCONN_TPU_PLATFORM"] == "cpu"


def test_gate_keeps_accelerator_on_healthy_link(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv("SYCONN_TPU_PLATFORM", raising=False)
    monkeypatch.setitem(sys.modules, "jax", None)
    monkeypatch.setattr(linkprobe, "probe_link_subprocess",
                        lambda: (80.0, 50.0))
    assert jaxcfg.gate_platform_on_link() == "axon"
    assert "SYCONN_TPU_PLATFORM" not in os.environ
