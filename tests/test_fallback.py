"""No-toolchain fallback (VERDICT r3 item 9).

The reference's decode needs nothing beyond the library itself
(src/codec/codec.rs:82 is dependency-free Rust); density_tpu matches
that posture with a pure-Python twin of the native runtime
(native/fallback.py).  These tests pin the twin to the C++ runtime:
scanner outputs (offsets, copy flags, predicted/total token counts)
must be identical, and the whole decode path must work with the
native library disabled.
"""

import os
import random
import subprocess
import sys

import numpy as np
import pytest

from density_tpu import native
from density_tpu.native import fallback

CODECS = ["chameleon", "cheetah", "lion"]

needs_native = pytest.mark.skipif(
    not native.is_available(), reason="native toolchain unavailable")


def _cases():
    rng = random.Random(11)
    text = b"scanner parity across copy blocks and ragged tails " * 40
    return [
        b"t",
        b"test" * 31 + b"t",                      # the golden input
        text,
        rng.randbytes(4096),                       # copy blocks + FSM
        rng.randbytes(997) + b"abcd" * 600 + rng.randbytes(1001),
        text[:257], text[:256], text[:255],        # block boundaries
        b"x" * 63 + b"yz",                         # sub-block + ragged
    ]


@needs_native
@pytest.mark.parametrize("codec", CODECS)
def test_fallback_scan_parity(codec):
    for data in _cases():
        enc = native.encode(codec, data)
        got = fallback.scan(codec, enc)
        want = native.scan(codec, enc)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@needs_native
@pytest.mark.parametrize("codec", CODECS)
def test_fallback_scan_many_counts_parity(codec):
    streams = [native.encode(codec, d) for d in _cases()]
    nb_cap = max(len(s) for s in streams) // 4 + 4
    want = native.scan_many(codec, streams, nb_cap)
    got = fallback.scan_many(codec, streams, nb_cap)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("codec", CODECS)
def test_fallback_oracle_roundtrip(codec):
    data = b"fallback oracle bytes " * 60 + b"xy"
    enc = fallback.encode(codec, data)
    assert fallback.decode(codec, enc) == data
    if native.is_available():
        assert enc == native.encode(codec, data)


@pytest.mark.slow
def test_decode_path_without_native():
    """The full jax decode path (which needs the block scanner) works
    with the native runtime force-disabled -- the parity bar for the
    reference's zero-dependency decode."""
    code = (
        "from density_tpu import native, api, container\n"
        "assert not native.is_available()\n"
        "data = b'no-toolchain decode ' * 120 + b'tl'\n"
        "enc = api.encode_raw(data, 'chameleon')\n"
        "assert api.decode_raw(enc, 'chameleon') == data\n"
        "blob = container.compress(data, 'cheetah', stream_size=1024)\n"
        "assert container.decompress(blob) == data\n"
        "print('no-native ok')\n"
    )
    env = dict(os.environ, DENSITY_TPU_NO_NATIVE="1",
               JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "no-native ok" in out.stdout
