"""Parallel cheetah/lion decode + segmented sort kernel tests.

Covers the round-2 machinery:
  * bigsort: segmented bitonic (multi-segment logic exercised with a
    shrunken SEG so interpret mode stays fast);
  * flag-driven selection monoids (seg_sel2_before / seg_selq_before)
    against brute-force replays of the reference dictionary/queue
    semantics (cheetah.rs:68-103, lion.rs:50-57,126-186);
  * parallel resolvers end-to-end: decode(native.encode(x)) == x on
    inputs with copy blocks, ragged tails, and deep prediction chains,
    and the context fixpoint converges (ok=True).
"""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from density_tpu import native
from density_tpu.engine.grouping import (
    seg_sel2_before, seg_selq_before, OP_ID, OP_SWAP, OP_INS)


def test_bigsort_multiseg():
    from density_tpu.kernels import bigsort
    old = bigsort.SEG
    bigsort.SEG = 512
    try:
        rng = np.random.default_rng(0)
        for S, N, nk in [(2, 256, 1), (3, 4096, 1), (2, 2048, 2)]:
            k1 = rng.integers(0, 50, (S, N)).astype(np.int32)
            k2 = rng.integers(0, 2 ** 20, (S, N)).astype(np.int32)
            v = rng.integers(0, 2 ** 31, (S, N)).astype(np.int32)
            if nk == 1:
                ks, vs = bigsort.sort(jnp.asarray(k1), jnp.asarray(v),
                                      n_keys=1, interpret=True)
                ks, vs = np.asarray(ks), np.asarray(vs)
                for s in range(S):
                    order = np.lexsort((v[s], k1[s]))
                    assert (ks[s] == k1[s][order]).all()
                    for kk in np.unique(k1[s]):
                        assert (sorted(vs[s][ks[s] == kk])
                                == sorted(v[s][k1[s] == kk]))
            else:
                a, b, _ = bigsort.sort(jnp.asarray(k1), jnp.asarray(k2),
                                       jnp.asarray(v), n_keys=2,
                                       interpret=True)
                for s in range(S):
                    order = np.lexsort((k2[s], k1[s]))
                    assert (np.asarray(a)[s] == k1[s][order]).all()
                    assert (np.asarray(b)[s] == k2[s][order]).all()
    finally:
        bigsort.SEG = old


def test_seg_sel2_before_bruteforce():
    rng = random.Random(3)
    n = 400
    seg_id = np.sort(np.array([rng.randrange(12) for _ in range(n)]))
    ops = np.array([rng.choice([OP_ID, OP_SWAP, OP_INS])
                    for _ in range(n)], np.int32)
    cval = np.array([rng.randrange(1, 2 ** 32) for _ in range(n)],
                    np.uint32)
    first = np.concatenate([[True], seg_id[1:] != seg_id[:-1]])
    a_b, b_b = seg_sel2_before(jnp.asarray(first), jnp.asarray(ops),
                               jnp.asarray(cval))
    a_b, b_b = np.asarray(a_b), np.asarray(b_b)
    # brute force replay
    a = b = 0
    for i in range(n):
        if first[i]:
            a = b = 0
        assert (a_b[i], b_b[i]) == (a, b), i
        if ops[i] == OP_INS:
            a, b = int(cval[i]), a
        elif ops[i] == OP_SWAP:
            a, b = b, a


@pytest.mark.parametrize("K", [2, 5])
def test_seg_selq_before_bruteforce(K):
    rng = random.Random(7)
    n = 300
    seg_id = np.sort(np.array([rng.randrange(8) for _ in range(n)]))
    kind = np.array([rng.choice([OP_ID, OP_SWAP, OP_INS])
                     for _ in range(n)], np.int32)
    depth = np.array([rng.randrange(K) for _ in range(n)], np.int32)
    cval = np.array([rng.randrange(1, 2 ** 32) for _ in range(n)],
                    np.uint32)
    first = np.concatenate([[True], seg_id[1:] != seg_id[:-1]])
    before = np.asarray(seg_selq_before(
        jnp.asarray(first), jnp.asarray(kind), jnp.asarray(depth),
        jnp.asarray(cval), K))
    q = [0] * K
    for i in range(n):
        if first[i]:
            q = [0] * K
        assert list(before[i]) == q, i
        if kind[i] == OP_INS:
            q = [int(cval[i])] + q[:-1]
        elif kind[i] == OP_SWAP:
            d = int(depth[i])
            q = [q[d]] + q[:d] + q[d + 1:]


@pytest.mark.slow
@pytest.mark.parametrize("codec", ["cheetah", "lion"])
def test_parallel_resolve_roundtrip(codec):
    """decode() (parallel resolver) round-trips native streams covering
    copy blocks, prediction chains, and ragged tails."""
    import importlib
    mod = importlib.import_module(f"density_tpu.codecs.{codec}")
    rng = random.Random(11)
    text = b"it was the best of times, it was the worst of times. " * 200
    cases = [
        text[:8000],
        b"abcd" * 3000,                      # deep prediction chains
        rng.randbytes(4000),                  # copy blocks
        text[:2048] + rng.randbytes(1024) + text[:2048],  # mixed
        text[:4097], text[:4098], text[:4099],  # ragged tails
        b"\x00" * 5000,                        # zero-hash pile-up
    ]
    for data in cases:
        enc = native.encode(codec, data)
        assert mod.decode(enc) == data


@pytest.mark.slow
@pytest.mark.parametrize("codec", ["cheetah", "lion"])
def test_decode_batch_parallel_ok(codec):
    """Container decode is exact whether or not the context fixpoint
    converges (deep prediction chains fall back per stream), and the
    ok flags are reported per stream."""
    from density_tpu import container
    from density_tpu.parallel import sharding
    # repetitive text: long prediction runs -> fixpoint exceeds the
    # round cap -> per-stream native fallback must kick in
    text = (b"a rather compressible message that repeats. " * 800)
    blob = container.compress(text, codec, stream_size=1 << 14)
    _, device_args, _, _ = sharding.decode_prep(blob)
    out, ok = sharding._decode_batch(*device_args, codec)
    assert np.asarray(ok).shape[0] == device_args[0].shape[0]
    assert container.decompress(blob) == text
    # high-entropy data: predictions are rare, the fixpoint converges
    rng = random.Random(21)
    rnd = rng.randbytes(40000)
    blob2 = container.compress(rnd, codec, stream_size=1 << 14)
    _, device_args2, _, _ = sharding.decode_prep(blob2)
    _, ok2 = sharding._decode_batch(*device_args2, codec)
    assert np.asarray(ok2).all()
    assert container.decompress(blob2) == rnd


@pytest.mark.slow
@pytest.mark.parametrize("codec", ["cheetah", "lion"])
def test_resolve_parallel_batched_parity(codec):
    """The bigsort-based batched fixpoint resolve must match the
    vmapped lax.sort resolve exactly (values and per-stream
    convergence) on real encoded streams."""
    import importlib
    import jax
    from density_tpu import container
    from density_tpu.parallel import sharding
    rng = np.random.default_rng(12)
    vocab = rng.integers(1, 1 << 32, 97, dtype=np.uint64).astype(np.uint32)
    ss = 4096
    data = vocab[rng.integers(0, 97, (3 * ss) // 4)].astype(
        "<u4").tobytes()[:3 * ss - 77]
    blob = container.compress(data, codec, stream_size=ss)
    _, device_args, _, _ = sharding.decode_prep(blob)
    words, woff, copyf, nb_real, out_lens = device_args
    mod = importlib.import_module(f"density_tpu.codecs.{codec}")
    w = sharding._widen(words)
    flags, w0, w1, valid = jax.vmap(mod._extract_tokens.__wrapped__)(
        w, woff, copyf, nb_real, out_lens)
    q_ref, ok_ref = jax.vmap(mod._resolve_parallel.__wrapped__)(
        flags, w0, w1, valid)
    q_new, ok_new = mod._resolve_parallel_batched(flags, w0, w1, valid,
                                                  interpret=True)
    mask = np.asarray(valid)
    assert (np.asarray(ok_new) == np.asarray(ok_ref)).all()
    assert (((np.asarray(q_new) == np.asarray(q_ref)) | ~mask)).all()
