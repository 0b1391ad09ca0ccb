"""Test configuration.

This environment force-registers the TPU ("axon") platform ahead of
CPU regardless of JAX_PLATFORMS, so tests pin the *default device* to
the CPU backend instead: fast compiles, and XLA_FLAGS gives us a
virtual 8-device CPU mesh to exercise the multi-chip sharding paths
without TPU hardware. Real-TPU coverage lives in bench.py and
tests/test_tpu_smoke.py (skipped when no TPU is attached).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_devices():
    return jax.devices("cpu")
