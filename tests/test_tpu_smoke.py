"""Real-TPU smoke coverage (skipped when no accelerator is attached).

The rest of the suite pins the CPU backend for fast compiles; this file
runs a small bit-exactness check on the accelerator itself.
"""

import pytest

import jax


def _accel():
    return [d for d in jax.devices() if d.platform != "cpu"]


pytestmark = pytest.mark.skipif(not _accel(), reason="no accelerator")


@pytest.mark.parametrize("codec", ["chameleon", "cheetah", "lion"])
def test_tpu_bit_exact(codec):
    import importlib
    from density_tpu import native
    mod = importlib.import_module(f"density_tpu.codecs.{codec}")
    data = (b"tpu smoke: the five boxing wizards jump quickly. " * 200)[:8000]
    with jax.default_device(_accel()[0]):
        enc = mod.encode(data)
        assert enc == native.encode(codec, data)
        assert mod.decode(enc, decoded_size_hint=len(data)) == data
