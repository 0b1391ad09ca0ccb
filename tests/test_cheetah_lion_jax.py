"""Cheetah and Lion JAX paths vs the native oracle."""

import random

import pytest

from density_tpu import native


def _cases():
    rng = random.Random(1234)
    text = (b"she sells sea shells by the sea shore; " * 400)
    return {
        "text": text,
        "text_ragged": text[:7001],
        "repeat4": b"abcd" * 3000,         # prediction-heavy
        "cycle8": b"abcdwxyz" * 1500,      # alternating predictions
        "cycle12": b"abcdwxyzmnop" * 1000, # deeper prediction queue (lion)
        "random": rng.randbytes(6000),     # copy mode
        "mixed": (text[:3000] + rng.randbytes(3000) + text[:2000]
                  + rng.randbytes(555)),
        "zeros": b"\x00" * 3000,
        "tiny": b"abcdefg",
        "one_block_cheetah": bytes(range(128)),
        "one_block_lion": bytes(range(64)),
        "block_pm1": bytes(range(130)),
    }


@pytest.mark.parametrize("codec", ["cheetah", "lion"])
@pytest.mark.parametrize("case", list(_cases()))
def test_encode_matches_native(codec, case):
    import importlib
    mod = importlib.import_module(f"density_tpu.codecs.{codec}")
    data = _cases()[case]
    expected = native.encode(codec, data)
    got = mod.encode(data)
    if got != expected:
        diff = next((i for i, (a, b) in enumerate(zip(got, expected))
                     if a != b), None)
        raise AssertionError(
            f"{codec}/{case}: len {len(got)} vs {len(expected)}, "
            f"first diff {diff}: "
            f"got={list(got[diff or 0:(diff or 0)+8])} "
            f"exp={list(expected[diff or 0:(diff or 0)+8])}")


@pytest.mark.parametrize("codec", ["cheetah", "lion"])
@pytest.mark.parametrize("case", list(_cases()))
def test_decode_roundtrip(codec, case):
    import importlib
    mod = importlib.import_module(f"density_tpu.codecs.{codec}")
    data = _cases()[case]
    enc = native.encode(codec, data)
    got = mod.decode(enc, decoded_size_hint=len(data))
    assert got == data, f"{codec}/{case}: len {len(got)} vs {len(data)}"
