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


@pytest.mark.slow
def test_masked_assemble_batch9_regression():
    """XLA:TPU miscompile regression (r4): the vmapped masked assembly
    returned ALL-ZERO outputs for lion at stream batches 9..12 on v5e
    (exact on CPU and at S<=8/16, identical jitted code). The engine
    now chunks the copy-path assembly to <=8 streams on TPU
    (layout._assemble_masked); this pins the end-to-end result: a
    9-stream lion container whose FSM arms copy blocks must be
    byte-exact vs the native oracle."""
    import numpy as np
    from density_tpu import container, native
    rng = np.random.default_rng(4)
    vocab = rng.integers(1, 1 << 32, 100,
                         dtype=np.uint64).astype(np.uint32)
    ss = 1 << 20
    n = 9 * ss
    data = vocab[rng.integers(0, 100, n // 4)].astype("<u4").tobytes()
    blob = container.compress(data, "lion", stream_size=ss)
    _, _, _, lengths, off = container.parse_header(blob)
    assert int(lengths[0]) > 0
    assert blob[off:off + int(lengths[0])] == native.encode(
        "lion", data[:ss])
    assert container.decompress(blob) == data


@pytest.mark.slow
@pytest.mark.parametrize("codec", ["chameleon", "cheetah"])
@pytest.mark.parametrize("s", [9, 12])
def test_masked_assemble_suspect_batches(codec, s):
    """Blast-radius pin for the r4 XLA:TPU miscompile: the workaround
    (layout._assemble_masked chunking to <=8) applies to ALL codecs at
    every TPU batch S>8, but the bug was only ever OBSERVED for lion at
    S in 9..12 -- these cases pin the other two codecs at the suspect
    batch sizes on real hardware. Incompressible random streams force
    the FSM onto the copy path (the miscompiled program). A standalone
    repro lives in docs/xla_tpu_miscompile_repro.py so the chunking can
    be deleted once the stack fixes it."""
    import numpy as np
    from density_tpu import container, native
    rng = np.random.default_rng(100 + s)
    ss = 1 << 16
    data = rng.integers(0, 256, s * ss, dtype=np.uint8).tobytes()
    blob = container.compress(data, codec, stream_size=ss)
    _, _, _, lengths, off = container.parse_header(blob)
    assert blob[off:off + int(lengths[0])] == native.encode(
        codec, data[:ss])
    assert container.decompress(blob) == data
