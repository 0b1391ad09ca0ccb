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
