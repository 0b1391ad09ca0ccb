"""Tests for the TPU fast decode path: kernels/unpack.py (interpret
mode) + engine/unlayout.py bigsort map resolution.

Validated against the native oracle byte-for-byte, including copy
blocks (blowup protection, reference protection_state.rs) and ragged
tails (reference codec.rs:58-62)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from density_tpu import native  # noqa: E402
from density_tpu.engine import unlayout  # noqa: E402
from density_tpu.kernels import unpack  # noqa: E402

Q = 64
GQ = 16384


def _stage(enc):
    in_off, out_off, is_copy = native.scan("chameleon", enc)
    nb = len(in_off)
    nb_pad = -(-nb * Q // GQ) * GQ // Q
    woff = np.zeros((1, nb_pad), np.int32)
    woff[0, :nb] = in_off // 2
    copyf = np.zeros((1, nb_pad), bool)
    copyf[0, :nb] = is_copy.astype(bool)
    capw = max((len(enc) + 255) // 256 * 256, 256)
    wb = np.frombuffer(enc.ljust(capw, b"\0"), dtype="<u2")
    return (jnp.asarray(wb[None, :].astype(np.uint32)),
            jnp.asarray(woff), jnp.asarray(copyf), nb, is_copy)


def _decode_via_fast_path(data):
    enc = native.encode("chameleon", data)
    words, woff, copyf, nb, is_copy = _stage(enc)
    out_words = unlayout.decode_chameleon_batch(
        words, woff, copyf,
        jnp.asarray(np.array([nb], np.int32)),
        jnp.asarray(np.array([len(data)], np.int32)),
        use_kernel=True, with_copy=bool(is_copy.any()), interpret=True)
    ol = len(data)
    out = bytearray(
        np.asarray(out_words[0, :(ol + 1) // 2]).astype("<u2")
        .tobytes()[:ol])
    ragged = ol % 4
    if ragged and not is_copy[-1]:
        out[-ragged:] = enc[-ragged:]
    return bytes(out)


def _corpus(rng, n, mode):
    if mode == "text":
        parts = [b"the quick brown fox ", b"jumps over ", b"lazy dog ",
                 rng.integers(0, 256, 64, dtype=np.uint8).tobytes()]
        return b"".join(parts[rng.integers(0, 4)]
                        for _ in range(n // 12))[:n]
    if mode == "random":
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    mix = bytearray()
    while len(mix) < n:
        mix += (b"abcd" * 700)[:2800]
        mix += rng.integers(0, 256, 2800, dtype=np.uint8).tobytes()
    return bytes(mix)[:n]


@pytest.mark.parametrize("mode,n", [
    ("text", 98304),
    pytest.param("random", 70000, marks=pytest.mark.slow),
    pytest.param("mixed", 98307, marks=pytest.mark.slow)])
def test_fast_decode_roundtrip(mode, n):
    rng = np.random.default_rng(hash((mode, n)) % (2**32))
    data = _corpus(rng, n, mode)
    assert _decode_via_fast_path(data) == data


def test_unpack_matches_xla_extraction():
    rng = np.random.default_rng(7)
    data = _corpus(rng, 90000, "text")
    enc = native.encode("chameleon", data)
    words, woff, copyf, nb, _ = _stage(enc)
    f1, w01, w11 = unlayout.extract_tokens_xla(words, woff, Q, 4, 1)
    f2, w02, w12 = unpack.unpack(words, woff, q=Q, sig_words=4,
                                 flag_bits=1, interpret=True)
    fq = (len(data) // 256) * 64  # full blocks only
    np.testing.assert_array_equal(np.asarray(f1)[0, :fq],
                                  np.asarray(f2)[0, :fq])
    np.testing.assert_array_equal(np.asarray(w01)[0, :fq],
                                  np.asarray(w02)[0, :fq])
    plains = np.asarray(f1)[0, :fq] == 0
    np.testing.assert_array_equal(np.asarray(w11)[0, :fq][plains],
                                  np.asarray(w12)[0, :fq][plains])


@pytest.mark.slow
def test_resolution_matches_oracle_on_two_streams():
    """Batched (S=2) fast path, differing copy layouts per stream."""
    rng = np.random.default_rng(11)
    d1 = _corpus(rng, 98304, "text")
    d2 = _corpus(rng, 98304, "mixed")
    e1, e2 = native.encode("chameleon", d1), native.encode("chameleon", d2)
    s1 = _stage(e1)
    s2 = _stage(e2)
    nbp = max(s1[1].shape[1], s2[1].shape[1])
    capw = max(s1[0].shape[1], s2[0].shape[1])

    def pad(st):
        w, wo, cf, nb, ic = st
        w = jnp.pad(w, ((0, 0), (0, capw - w.shape[1])))
        wo = jnp.pad(wo, ((0, 0), (0, nbp - wo.shape[1])))
        cf = jnp.pad(cf, ((0, 0), (0, nbp - cf.shape[1])))
        return w, wo, cf, nb, ic

    w1, wo1, cf1, nb1, ic1 = pad(s1)
    w2, wo2, cf2, nb2, ic2 = pad(s2)
    out = unlayout.decode_chameleon_batch(
        jnp.concatenate([w1, w2]), jnp.concatenate([wo1, wo2]),
        jnp.concatenate([cf1, cf2]),
        jnp.asarray(np.array([nb1, nb2], np.int32)),
        jnp.asarray(np.array([len(d1), len(d2)], np.int32)),
        use_kernel=True, with_copy=True, interpret=True)
    for s, (d, e, ic) in enumerate([(d1, e1, ic1), (d2, e2, ic2)]):
        ol = len(d)
        got = bytearray(np.asarray(out[s, :(ol + 1) // 2])
                        .astype("<u2").tobytes()[:ol])
        ragged = ol % 4
        if ragged and not ic[-1]:
            got[-ragged:] = e[-ragged:]
        assert bytes(got) == d, f"stream {s}"


def test_seg_fill_last_nonzero_brute_force():
    """The resolve's fill (latest plain fingerprint per hash group,
    inclusive, zero-reset at segment starts) against a scalar walk."""
    from density_tpu.engine.unlayout import _seg_fill_last_nonzero
    rng = np.random.default_rng(0)
    for trial in range(10):
        S, N = 2, 2048
        grp = np.sort(rng.integers(0, 30, (S, N)), axis=1)
        isp = rng.random((S, N)) < rng.uniform(0.005, 0.9)
        c16 = rng.integers(0, 65536, (S, N))
        x = np.where(isp, (1 << 16) | c16, 0).astype(np.uint32)
        first = np.zeros((S, N), bool)
        first[:, 0] = True
        first[:, 1:] |= grp[:, 1:] != grp[:, :-1]
        got = np.asarray(_seg_fill_last_nonzero(jnp.asarray(x),
                                                jnp.asarray(first)))
        refv = np.zeros((S, N), np.uint32)
        refh = np.zeros((S, N), bool)
        for s in range(S):
            lastv, has = 0, False
            for i in range(N):
                if first[s, i]:
                    lastv, has = 0, False
                if isp[s, i]:
                    lastv, has = c16[s, i], True
                refv[s, i] = lastv
                refh[s, i] = has
        assert ((got != 0) == refh).all()
        assert ((got & 0xFFFF)[refh] == refv[refh]).all()
