"""Native (C++) runtime tests: golden vectors, oracle cross-validation,
scanner consistency."""

import os
import random

import pytest

from tests.test_golden import TEST_DATA, GOLDEN

from density_tpu import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native toolchain unavailable")

CODECS = ["chameleon", "cheetah", "lion"]


@pytest.mark.parametrize("name", CODECS)
def test_native_golden(name):
    enc = native.encode(name, TEST_DATA)
    assert enc == GOLDEN[name]
    assert native.decode(name, enc, decoded_size_hint=len(TEST_DATA)) == TEST_DATA


def _corpora():
    rng = random.Random(7)
    text = (b"the quick brown fox jumps over the lazy dog. " * 500)
    rnd = bytes(rng.randbytes(9973))
    mixed = text[:4096] + rnd[:4096] + text[:1024] + rnd[:333]
    zeros = b"\x00" * 5000
    return {
        "text": text,
        "random": rnd,
        "mixed": mixed,
        "zeros": zeros,
        "tiny": b"abc",
        "empty": b"",
        "one_quad": b"abcd",
    }


@pytest.mark.parametrize("name", CODECS)
@pytest.mark.parametrize("corpus", list(_corpora()))
def test_native_vs_scalar(name, corpus):
    """Native and python-scalar oracle must produce identical bytes."""
    from density_tpu.codecs.scalar import SCALAR_CODECS
    data = _corpora()[corpus]
    enc_native = native.encode(name, data)
    enc_scalar = SCALAR_CODECS[name]().encode(data)
    assert enc_native == enc_scalar, (
        f"{name}/{corpus}: first diff at "
        f"{next((i for i, (a, b) in enumerate(zip(enc_native, enc_scalar)) if a != b), 'len')}"
        f" lens {len(enc_native)} vs {len(enc_scalar)}")
    dec = native.decode(name, enc_native, decoded_size_hint=len(data))
    assert dec == data
    dec_scalar = SCALAR_CODECS[name]().decode(enc_native)
    assert dec_scalar == data


@pytest.mark.parametrize("name", CODECS)
def test_native_ragged_tails(name):
    """len % 4 in {0,1,2,3}, len near block boundaries."""
    from density_tpu.codecs.scalar import SCALAR_CODECS
    block = {"chameleon": 256, "cheetah": 128, "lion": 64}[name]
    rng = random.Random(3)
    base = (b"abcdabcdxyzw" * 200)
    for ln in [0, 1, 2, 3, 4, 5, block - 1, block, block + 1,
               2 * block - 1, 2 * block, 2 * block + 3]:
        data = base[:ln]
        enc = native.encode(name, data)
        assert enc == SCALAR_CODECS[name]().encode(data), f"len={ln}"
        assert native.decode(name, enc, decoded_size_hint=ln) == data, f"len={ln}"
        # incompressible variant
        data = bytes(rng.randbytes(ln))
        enc = native.encode(name, data)
        assert enc == SCALAR_CODECS[name]().encode(data), f"rnd len={ln}"
        assert native.decode(name, enc, decoded_size_hint=ln) == data


@pytest.mark.parametrize("name", CODECS)
def test_scanner(name):
    """Scanner offsets must be consistent with an actual decode."""
    rng = random.Random(11)
    text = b"hello world, this is a test of the scanner. " * 300
    data = text + bytes(rng.randbytes(4000)) + text[:1000]
    enc = native.encode(name, data)
    in_off, out_off, is_copy = native.scan(name, enc)
    block = {"chameleon": 256, "cheetah": 128, "lion": 64}[name]
    assert in_off[0] == 0 and out_off[0] == 0
    assert (in_off[1:] > in_off[:-1]).all()
    # every non-final block decodes to exactly block_size bytes
    assert (out_off[1:] - out_off[:-1] == block).all()
    n_blocks = -(-len(data) // block)
    assert len(in_off) == n_blocks
    # copy blocks appear for the random section and consume block bytes
    copy_idx = is_copy.nonzero()[0]
    for b in copy_idx:
        if b + 1 < len(in_off):
            assert in_off[b + 1] - in_off[b] == block


def test_lz4_block_roundtrip():
    """Vendored LZ4-block pareto codec (reference: benches/lz4.rs)."""
    import random
    rng = random.Random(5)
    cases = [b"", b"a", b"ab" * 30000, rng.randbytes(10000),
             bytes(rng.randbytes(7)) * 9000,
             (b"abcd" * 5000) + rng.randbytes(300) + (b"xyz" * 2000)]
    for i in range(20):
        cases.append(rng.randbytes(rng.randrange(1, 50))
                     * rng.randrange(1, 400)
                     + rng.randbytes(rng.randrange(0, 200)))
    for data in cases:
        c = native.lz4_compress(data)
        assert native.lz4_decompress(c, len(data)) == data
