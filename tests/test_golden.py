"""Golden-vector conformance tests.

These three vectors pin the bit-exact wire format (flag semantics, bit
order, signature width, tail behavior) -- they are the reference's own
unit tests (reference: src/lib.rs:13-86) and double as the format spec.
Every encoder implementation in this repo must reproduce them exactly.
"""

import pytest

TEST_DATA = b"test" * 31 + b"t"  # 125 bytes (reference: lib.rs:19)

GOLDEN_CHAMELEON = bytes([
    0xfe, 0xff, 0xff, 0x7f, 0, 0, 0, 0,
    116, 101, 115, 116,
] + [112, 251] * 30 + [116])

GOLDEN_CHEETAH = bytes([
    244, 255, 255, 255, 255, 255, 255, 63,
    116, 101, 115, 116, 112, 251, 116,
])

GOLDEN_LION = bytes([
    112, 146, 36, 73, 146, 36,
    116, 101, 115, 116, 112, 251,
    73, 146, 36, 73, 146, 4,
    116,
])

GOLDEN = {
    "chameleon": GOLDEN_CHAMELEON,
    "cheetah": GOLDEN_CHEETAH,
    "lion": GOLDEN_LION,
}


@pytest.mark.parametrize("name", ["chameleon", "cheetah", "lion"])
def test_scalar_golden(name):
    from density_tpu.codecs.scalar import SCALAR_CODECS
    codec = SCALAR_CODECS[name]()
    encoded = codec.encode(TEST_DATA)
    assert encoded == GOLDEN[name], (
        f"{name}: {list(encoded)} != {list(GOLDEN[name])}")
    codec2 = SCALAR_CODECS[name]()
    assert codec2.decode(encoded) == TEST_DATA


@pytest.mark.parametrize("name", ["chameleon", "cheetah", "lion"])
def test_jax_golden(name):
    from density_tpu import api
    encoded = api.encode_raw(TEST_DATA, codec=name)
    assert encoded == GOLDEN[name], (
        f"{name}: {list(encoded)} != {list(GOLDEN[name])}")
    assert api.decode_raw(encoded, codec=name,
                          decoded_size_hint=len(TEST_DATA)) == TEST_DATA
