"""Probe-device placement helpers (utils/devices.py): the builder's
validation probes must run on a CPU backend when one is available —
round-4 measurement: probe compiles through the TPU tunnel were 360 s of
the 387 s driver-bench wall-clock."""

import jax
import jax.numpy as jnp

from mcp_tpu.utils.devices import (
    cpu_probe_device,
    enable_host_probe_backend,
    probes_on_cpu,
)


class TestProbeDevice:
    def test_cpu_device_available_under_cpu_config(self):
        # conftest pins the test process to cpu; the probe device is cpu.
        dev = cpu_probe_device()
        assert dev is not None and dev.platform == "cpu"

    def test_enable_is_idempotent(self):
        assert enable_host_probe_backend()
        assert enable_host_probe_backend()

    def test_probes_on_cpu_context_runs(self):
        with probes_on_cpu():
            out = jnp.sum(jnp.arange(4.0))
        assert float(out) == 6.0
        # Results are usable outside the context (constants are
        # device-neutral at trace time).
        assert float(jax.jit(lambda a: a + out)(1.0)) == 7.0
