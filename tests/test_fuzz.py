"""Property/fuzz tests (SURVEY.md §4: what the reference lacks).

Three suites:
  * FSM wire-format agreement: the protection FSM replay
    (engine/protection.py) must reproduce the native scanner's actual
    per-block copy decisions on adversarial compressible/incompressible
    interleavings crossing the every-16-block halving boundary
    (reference: protection_state.rs:19-47, codec.rs:35-37,68,89-98).
  * Random length x content sweeps cross-validating the JAX array
    program against the native oracle byte-for-byte, all codecs.
  * Truncated / corrupted stream handling raising DecodeError.
"""

import random

import numpy as np
import pytest

from density_tpu import container, native
from density_tpu.constants import SPECS
from density_tpu.engine.protection import replay_fsm_np
from density_tpu.errors import DecodeError

CODECS = ["chameleon", "cheetah", "lion"]


def _adversarial_inputs():
    """Compressible/incompressible interleavings with section lengths
    chosen to cross FSM boundaries: arming (2 consecutive
    incompressible), decay to zero (start+1 growth), and the every-16th
    revert_to_copy halving."""
    rng = random.Random(1234)
    cases = {}
    for trial in range(6):
        parts = []
        # section lengths in blocks of the largest block size (256B)
        for k in range(rng.randint(6, 18)):
            n_blocks = rng.choice([1, 2, 3, 5, 15, 16, 17, 33])
            if k % 2 == trial % 2:
                parts.append(rng.randbytes(256 * n_blocks))  # incompressible
            else:
                parts.append(b"abcd" * (64 * n_blocks))      # compressible
        cases[f"interleave{trial}"] = b"".join(parts)
    # long incompressible run: penalty grows, halving kicks in
    cases["long_random"] = random.Random(7).randbytes(256 * 80)
    return cases


@pytest.mark.parametrize("codec", CODECS)
@pytest.mark.parametrize("case", list(_adversarial_inputs()))
def test_fsm_replay_matches_wire(codec, case):
    """replay_fsm fed the decode-side per-block consumed sizes must
    reproduce exactly the copy decisions embedded in the stream."""
    data = _adversarial_inputs()[case]
    block = SPECS[codec].block_size
    enc = native.encode(codec, data)
    in_off, out_off, is_copy = native.scan(codec, enc)
    consumed = np.diff(np.append(in_off, len(enc)))
    bits = consumed >= block  # codec.rs:98 decode-side measurement
    replay = replay_fsm_np(bits)
    assert (replay == is_copy.astype(bool)).all(), (
        f"first diff at block "
        f"{int(np.argmax(replay != is_copy.astype(bool)))}")
    # and the decisions must actually include copies for these inputs
    if case.startswith("interleave") or case == "long_random":
        assert is_copy.any()


@pytest.mark.parametrize("codec", CODECS)
def test_fsm_single_incompressible_never_arms(codec):
    """One incompressible block sandwiched in compressible data must
    NOT arm copy mode (two consecutive are required,
    protection_state.rs:37-47)."""
    block = SPECS[codec].block_size
    data = (b"abcd" * (2 * block // 4)
            + random.Random(8).randbytes(block)
            + b"abcd" * (2 * block // 4))
    enc = native.encode(codec, data)
    _, _, is_copy = native.scan(codec, enc)
    assert not is_copy.any()


@pytest.mark.slow
@pytest.mark.parametrize("codec", CODECS)
def test_fuzz_jax_matches_native(codec):
    """Random (length, content) sweeps: JAX bytes == native bytes and
    JAX decode round-trips. Covers all mod-4 residues and block-size
    +/-1 boundaries."""
    import importlib
    mod = importlib.import_module(f"density_tpu.codecs.{codec}")
    rng = random.Random(99)
    block = SPECS[codec].block_size
    lengths = ([block - 1, block, block + 1, 2 * block + 3]
               + [rng.randint(1, 6000) for _ in range(3)])
    contents = ["random", "text", "zeros", "repeat"]
    text = b"the quick brown fox jumps over the lazy dog. " * 200
    for n in lengths:
        for kind in contents:
            if kind == "random":
                data = rng.randbytes(n)
            elif kind == "text":
                data = (text * (n // len(text) + 1))[:n]
            elif kind == "zeros":
                data = b"\x00" * n
            else:
                data = (b"wxyz" * (n // 4 + 1))[:n]
            expected = native.encode(codec, data)
            got = mod.encode(data)
            assert got == expected, (codec, n, kind, len(got),
                                     len(expected))
            dec = mod.decode(expected, decoded_size_hint=n)
            assert dec == data, (codec, n, kind)


@pytest.mark.parametrize("codec", CODECS)
@pytest.mark.slow
def test_masked_assemble_suspect_batches_cpu(codec):
    """CPU exactness of the masked (copy-path) assembly at the stream
    batches where XLA:TPU miscompiled it for lion in r4 (S in 9..12;
    see layout._assemble_masked and docs/xla_tpu_miscompile_repro.py).
    On CPU the unchunked program is exact at every S -- this pins the
    semantics the TPU chunking workaround must reproduce, for all
    three codecs across the suspect range."""
    import importlib
    mod = importlib.import_module(f"density_tpu.codecs.{codec}")
    rng = np.random.default_rng(7)
    block = SPECS[codec].block_size
    ss = 8 * block
    for s in (9, 12, 15):
        # incompressible random streams force copy blocks everywhere
        data = rng.integers(0, 256, s * ss, dtype=np.uint8).tobytes()
        blob = container.compress(data, codec, stream_size=ss)
        _, _, _, lengths, off = container.parse_header(blob)
        assert blob[off:off + int(lengths[0])] == native.encode(
            codec, data[:ss]), (codec, s)
        assert container.decompress(blob) == data, (codec, s)


@pytest.mark.parametrize("codec", CODECS)
def test_truncated_stream_raises(codec):
    data = b"a compressible message, " * 600
    blob = container.compress(data, codec, stream_size=1 << 14)
    # truncating the payload must raise DecodeError, not return garbage
    for cut in [len(blob) - 1, len(blob) // 2, 20]:
        with pytest.raises(DecodeError):
            container.decompress(blob[:cut])


@pytest.mark.parametrize("codec", CODECS)
def test_corrupt_header_raises(codec):
    data = b"another compressible message! " * 400
    blob = container.compress(data, codec, stream_size=1 << 14)
    bad = bytearray(blob)
    bad[0] ^= 0xFF  # magic
    with pytest.raises(DecodeError):
        container.decompress(bytes(bad))
    bad = bytearray(blob)
    bad[4] = 0xEE  # codec id
    with pytest.raises(DecodeError):
        container.decompress(bytes(bad))


def test_truncated_raw_stream_raises():
    """Truncated tier-1 stream: the native scanner must reject it
    rather than walk past the end."""
    enc = native.encode("chameleon", b"abcd" * 600)
    with pytest.raises(DecodeError):
        native.scan("chameleon", enc[: len(enc) // 2])
