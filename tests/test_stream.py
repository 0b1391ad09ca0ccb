"""Streaming / stateful session tests (reference capability:
codec instance reuse + clear_state, src/codec/codec.rs:16).

The acceptance property (VERDICT round-1 item 9): encoding a file in N
arbitrary chunks with carried state produces EXACTLY the bytes of a
one-shot encode of the whole file; same for decode.
"""

import random

import pytest

from density_tpu import native
from density_tpu.stream import StreamEncoder, StreamDecoder

CODECS = ["chameleon", "cheetah", "lion"]

# Streaming sessions hold dictionary state inside the native runtime;
# without a C++ toolchain the capability is unavailable (one-shot
# encode/decode still work via the pure-Python fallback).
pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native toolchain unavailable")


def _chunks(data, sizes):
    out, p = [], 0
    it = iter(sizes)
    while p < len(data):
        n = next(it)
        out.append(data[p:p + n])
        p += n
    return out


@pytest.mark.parametrize("codec", CODECS)
def test_stream_encode_matches_oneshot(codec):
    rng = random.Random(4)
    text = (b"streaming state carried across chunk boundaries! " * 300)
    data = text + rng.randbytes(2000) + text[:777]
    whole = native.encode(codec, data)

    def sizes():
        while True:
            yield rng.choice([1, 3, 17, 100, 256, 1000, 4096])

    with StreamEncoder(codec) as enc:
        got = b"".join(enc.update(c) for c in _chunks(data, sizes()))
        got += enc.finish()
    assert got == whole


@pytest.mark.parametrize("codec", CODECS)
def test_stream_decode_matches_oneshot(codec):
    rng = random.Random(9)
    text = (b"chunked decoding with carried dictionaries. " * 400)
    data = text + rng.randbytes(1500) + text[:333]
    enc = native.encode(codec, data)

    def sizes():
        while True:
            yield rng.choice([1, 7, 64, 300, 2048])

    with StreamDecoder(codec) as dec:
        got = b"".join(dec.update(c) for c in _chunks(enc, sizes()))
        got += dec.finish()
    assert got == data


@pytest.mark.parametrize("codec", CODECS)
def test_stream_reset_is_clear_state(codec):
    """reset() == the reference's clear_state(): after reset, the
    session encodes exactly like a fresh one."""
    data = b"state to be cleared between runs " * 100
    with StreamEncoder(codec) as enc:
        first = enc.update(data) + enc.finish()
        enc.reset()
        second = enc.update(data) + enc.finish()
    assert first == second == native.encode(codec, data)


@pytest.mark.parametrize("codec", CODECS)
def test_stream_decode_poisoned_until_reset(codec):
    """A decode failure that may have advanced dictionary state poisons
    the session: EVERY later decode call must fail until reset() --
    a silent retry would resolve map tokens against doubly-applied
    state and return corrupt bytes (ADVICE r3, libdensity.cpp
    dtpu_stream_decode)."""
    import ctypes
    data = b"poison contract regression " * 200
    enc = native.encode(codec, data)
    with StreamDecoder(codec) as dec:
        lib = dec._lib
        tiny = ctypes.create_string_buffer(1)
        # undersized output with final=1: decode_p overflows -> -1
        w = lib.dtpu_stream_decode(dec._st, enc, len(enc), tiny, 1, 1)
        assert w == ctypes.c_size_t(-1).value
        # the retry would "succeed" without the poison check; it must
        # keep failing even with a generous buffer
        big = ctypes.create_string_buffer(len(data) + 64)
        w2 = lib.dtpu_stream_decode(dec._st, enc, len(enc), big,
                                    len(data) + 64, 1)
        assert w2 == ctypes.c_size_t(-1).value
        # reset() lifts the poison and a fresh full decode is exact
        dec.reset()
        out = dec.finish(enc)
        assert out == data


@pytest.mark.parametrize("codec", CODECS)
def test_stream_roundtrip_incompressible(codec):
    """Copy-mode blocks (blowup FSM) must stream through unchanged."""
    rng = random.Random(77)
    data = rng.randbytes(5000) + b"compressible tail " * 50
    whole = native.encode(codec, data)
    with StreamEncoder(codec) as enc:
        got = enc.update(data[:1234]) + enc.update(data[1234:]) \
            + enc.finish()
    assert got == whole
    with StreamDecoder(codec) as dec:
        out = dec.update(got[:999]) + dec.finish(got[999:])
    assert out == data
