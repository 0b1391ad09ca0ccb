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

# Tests run with the persistent compilation cache DISABLED: the main
# .jax_cache is shared with live-TPU processes (concurrent writers),
# and long multi-shape test runs have segfaulted inside XLA executable
# (de)serialization in the cache read/write path (jax 0.9.0). CPU
# compiles here are cheap; correctness runs stay hermetic.
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", None)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """The full suite compiles hundreds of shape variants; jax 0.9.0's
    CPU backend has aborted mid-compile (and segfaulted in the
    compilation-cache path) once enough live executables accumulate in
    one process. Dropping the jit caches between modules keeps the
    executable count bounded."""
    yield
    jax.clear_caches()


def cpu_devices():
    return jax.devices("cpu")
