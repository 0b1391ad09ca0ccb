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


@pytest.mark.parametrize("mod_name", ["cheetah", "lion"])
def test_plan_fast_pallas_parity(mod_name):
    """The bigsort-based batched planner must match classify_fast
    exactly on every valid position (flags, payload sizes, payload
    words), including ragged tails and padding streams."""
    import importlib
    import jax
    import jax.numpy as jnp
    import numpy as np
    from density_tpu.engine.grouping import hash_quads
    mod = importlib.import_module(f"density_tpu.codecs.{mod_name}")
    rng = np.random.default_rng(9)
    S, n_q = 3, 512
    vocab = rng.integers(1, 1 << 32, 61, dtype=np.uint64).astype(np.uint32)
    q_np = np.where(rng.random((S, n_q)) < 0.8,
                    vocab[rng.integers(0, 61, (S, n_q))],
                    rng.integers(0, 1 << 32, (S, n_q),
                                 dtype=np.uint64).astype(np.uint32))
    q_np[0, 100:400] = np.tile(vocab[:10], 30)  # long predicted runs
    nbytes = np.array([n_q * 4, n_q * 4 - 1234, 800], np.int32)
    quads = jnp.asarray(q_np)
    jn = jnp.asarray(nbytes)
    got = mod.plan_fast_pallas(quads, jn, interpret=True)

    def one(w, n):
        h = hash_quads(w.astype(jnp.uint32))
        real = jnp.arange(n_q, dtype=jnp.int32) < n // 4
        p = mod.classify_fast(w.astype(jnp.uint32), h, real)
        return p.flags, p.payload_words, p.w0, p.w1, p.valid

    want = jax.vmap(one)(quads, jn)
    mask = np.asarray(want[4])
    for g, w, lab in zip(got, want,
                         ["flags", "pw", "w0", "w1", "valid"]):
        g, w = np.asarray(g), np.asarray(w)
        eq = ((g == w) | ~mask) if lab != "valid" else (g == w)
        assert eq.all(), f"{mod_name} {lab}: {np.argwhere(~eq)[:4]}"
