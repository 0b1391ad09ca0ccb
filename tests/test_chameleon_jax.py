"""Chameleon JAX path vs the scalar/native oracle."""

import random

import pytest

from density_tpu import native
from density_tpu.codecs import chameleon


def _cases():
    rng = random.Random(42)
    text = (b"it was the best of times, it was the worst of times, " * 400)
    out = {
        "text": text,                          # compressible
        "text_ragged1": text[:10001],
        "text_ragged2": text[:10002],
        "text_ragged3": text[:10003],
        "random": rng.randbytes(8192),         # incompressible -> copy mode
        "random_big": rng.randbytes(100_000),
        "mixed": (text[:5000] + rng.randbytes(5000) + text[:5000]
                  + rng.randbytes(777)),
        "zeros": b"\x00" * 4096,               # map-everything path
        "tiny": b"ab",
        "one_block": bytes(range(256)),
        "block_plus_one": bytes(range(256)) + b"x",
        "repeat4": b"abcd" * 2000,
    }
    return out


@pytest.mark.parametrize("case", list(_cases()))
def test_encode_matches_native(case):
    data = _cases()[case]
    expected = native.encode("chameleon", data)
    got = chameleon.encode(data)
    if got != expected:
        diff = next((i for i, (a, b) in enumerate(zip(got, expected))
                     if a != b), None)
        raise AssertionError(
            f"{case}: len {len(got)} vs {len(expected)}, first diff {diff}: "
            f"got[{diff}:{diff+8 if diff else 8}]="
            f"{list(got[diff or 0:(diff or 0)+8])} "
            f"exp={list(expected[diff or 0:(diff or 0)+8])}")


@pytest.mark.parametrize("case", list(_cases()))
def test_decode_roundtrip(case):
    data = _cases()[case]
    enc = native.encode("chameleon", data)
    got = chameleon.decode(enc, decoded_size_hint=len(data))
    assert got == data, f"{case}: len {len(got)} vs {len(data)}"


def test_empty():
    assert chameleon.encode(b"") == b""
    assert chameleon.decode(b"") == b""
