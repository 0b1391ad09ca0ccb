"""Container + sharded compression tests on the virtual 8-device CPU
mesh (multi-chip sharding equivalence: same bytes regardless of device
count)."""

import random

import pytest

import jax

from density_tpu import container
from density_tpu.parallel.mesh import default_mesh


def _data():
    rng = random.Random(99)
    text = (b"a framed multi-stream container for tpu sharding. " * 2000)
    return text + rng.randbytes(20000) + text[:12345]


CODECS = ["chameleon", "cheetah", "lion"]


@pytest.mark.parametrize("codec", CODECS)
def test_roundtrip_sharded(codec):
    data = _data()
    mesh = default_mesh(jax.devices("cpu"))
    blob = container.compress(data, codec, stream_size=16384, mesh=mesh)
    out = container.decompress(blob, mesh=mesh)
    assert out == data


@pytest.mark.parametrize("codec", CODECS)
def test_device_count_invariance(codec):
    """Same container bytes on 1 device and on 8 devices."""
    data = _data()[:60000]
    mesh1 = default_mesh(jax.devices("cpu")[:1])
    mesh8 = default_mesh(jax.devices("cpu"))
    assert mesh8.devices.size == 8
    blob1 = container.compress(data, codec, stream_size=8192, mesh=mesh1)
    blob8 = container.compress(data, codec, stream_size=8192, mesh=mesh8)
    assert blob1 == blob8
    assert container.decompress(blob8, mesh=mesh1) == data


def test_stream_tier1_compat():
    """Each contained stream is a bit-exact bare density stream."""
    from density_tpu import native
    data = _data()[:40000]
    ss = 16384
    blob = container.compress(data, "chameleon", stream_size=ss)
    codec, orig, ssz, lengths, off = container.parse_header(blob)
    assert codec == "chameleon" and orig == len(data) and ssz == ss
    pos = off
    for s, ln in enumerate(lengths):
        chunk = data[s * ss:(s + 1) * ss]
        assert blob[pos:pos + ln] == native.encode("chameleon", chunk)
        pos += ln


def test_empty_and_tiny():
    mesh = default_mesh(jax.devices("cpu"))
    for codec in CODECS:
        assert container.decompress(
            container.compress(b"", codec, mesh=mesh), mesh=mesh) == b""
        assert container.decompress(
            container.compress(b"x", codec, stream_size=4096, mesh=mesh),
            mesh=mesh) == b"x"
        d = b"abc" * 7
        assert container.decompress(
            container.compress(d, codec, stream_size=4096, mesh=mesh),
            mesh=mesh) == d


def test_bad_container():
    import pytest as _pt
    from density_tpu.errors import DecodeError
    with _pt.raises(DecodeError):
        container.decompress(b"NOPE" + b"\x00" * 40)
    with _pt.raises(DecodeError):
        container.decompress(b"\x00" * 3)
