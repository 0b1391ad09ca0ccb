"""Pallas pack kernel vs XLA assembly equivalence (interpret mode).

The pack kernel (density_tpu/kernels/pack.py) replaces the scatter
assembly of layout.assemble_fast on TPU. Here it runs in interpret
mode on CPU and must produce byte-identical streams to the XLA
fused path for every codec, including ragged tails (reference tail
semantics: src/codec/codec.rs:58-62).
"""

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _stage(rng, S, n_q, nb, compressible):
    if compressible:
        base = rng.integers(0, 8, size=(S, n_q), dtype=np.uint32)
        quads = base * 0x01010101  # few distinct quads -> dense map hits
    else:
        quads = rng.integers(0, 2**32, size=(S, n_q), dtype=np.uint32)
    data = np.zeros((S, n_q * 4), np.uint8)
    data[:, 0::4] = quads & 0xFF
    data[:, 1::4] = (quads >> 8) & 0xFF
    data[:, 2::4] = (quads >> 16) & 0xFF
    data[:, 3::4] = (quads >> 24) & 0xFF
    data[:, nb:] = 0  # zero-pad past the logical end (staging contract)
    quads = data.view("<u4")  # (S, n_q) little-endian u32 quads
    return jnp.asarray(quads), jnp.full((S,), nb, jnp.int32)


@pytest.mark.parametrize("codec", ["chameleon", "cheetah", "lion"])
@pytest.mark.parametrize("tail", [0, 1, 3, 150])
def test_pack_matches_xla(codec, tail):
    mod = importlib.import_module(f"density_tpu.codecs.{codec}")
    P = mod.PIPELINE
    assert P.encode_fused_pallas is not None
    n_q = 4096 * 2  # two grid groups
    nb = n_q * 4 - tail
    rng = np.random.default_rng(hash((codec, tail)) & 0xFFFF)
    words, nbytes = _stage(rng, 2, n_q, nb, compressible=True)

    o1, t1, ok1 = P.encode_fused_xla(words, nbytes)
    import os
    os.environ["DENSITY_TPU_PALLAS"] = "interpret"
    try:
        o2, t2, ok2 = P.encode_fused(words, nbytes)
    finally:
        del os.environ["DENSITY_TPU_PALLAS"]

    t1, t2 = np.asarray(t1), np.asarray(t2)
    np.testing.assert_array_equal(t1, t2)
    assert np.asarray(ok1).all(), "compressible input must take fast path"
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
    o1, o2 = np.asarray(o1), np.asarray(o2)
    for s in range(o1.shape[0]):
        w = (t1[s] + 1) // 2
        np.testing.assert_array_equal(o1[s, :w], o2[s, :w],
                                      err_msg=f"{codec} tail={tail} s={s}")


@pytest.mark.parametrize("codec", ["chameleon", "cheetah", "lion"])
@pytest.mark.parametrize("tail", [0, 1, 3, 555])
def test_packroute_matches_assemble(codec, tail):
    """The routing-network pack (kernels/packroute.py) must reproduce
    the XLA assembly byte-for-byte, including ragged tails and the
    multi-group word-base carry."""
    import jax
    from density_tpu.kernels import packroute
    from density_tpu.engine.grouping import hash_quads
    mod = importlib.import_module(f"density_tpu.codecs.{codec}")
    spec_kw = dict(q=mod.Q, sig_words=mod.SIG_WORDS, block=mod.BLOCK,
                   flag_bits={"chameleon": 1, "cheetah": 2,
                              "lion": 3}[codec])
    rng = np.random.default_rng(hash((codec, tail)) & 0xFFFF)
    S, N = 2, 16384
    vocab = rng.integers(1, 1 << 32, 61,
                         dtype=np.uint64).astype(np.uint32)
    quads = jnp.asarray(vocab[rng.integers(0, 61, (S, N))])
    nbytes = jnp.asarray(np.array([N * 4, N * 4 - tail], np.int32))

    def one(w, n):
        h = hash_quads(w.astype(jnp.uint32))
        real = jnp.arange(N, dtype=jnp.int32) < n // 4
        p = mod.classify_fast(w.astype(jnp.uint32), h, real)
        return p.flags, p.payload_words, p.w0, p.w1, p.valid

    flags, pw, w0, w1, valid = jax.vmap(one)(quads, nbytes)
    fq = jnp.minimum(nbytes // 4, N - 1)
    rows = jnp.arange(S)
    rq = quads[rows, fq].astype(jnp.uint32)
    rg = nbytes % 4 > 0
    w0 = w0.at[rows, fq].set(jnp.where(rg, rq & 0xFFFF, w0[rows, fq]))
    w1 = w1.at[rows, fq].set(jnp.where(rg, rq >> 16, w1[rows, fq]))
    got = packroute.pack(flags, pw, w0, w1, nbytes, interpret=True,
                         **spec_kw)
    want, totals = mod.PIPELINE.assemble_fast(quads, nbytes, flags, pw,
                                              w0, w1, valid)
    for s in range(S):
        t = (int(np.asarray(totals)[s]) + 1) // 2
        np.testing.assert_array_equal(
            np.asarray(got[s, :t]), np.asarray(want[s, :t]),
            err_msg=f"{codec} tail={tail} s={s}")
