"""Microbench: bisect the chameleon planner's dense (non-sort) stages
on the attached TPU at bench geometry. Finds where the non-sort ~17 ms
goes (HBM traffic says it should be <1 ms)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benches.micro_encode import timeit


def main():
    import bench as benchmod
    from benches.corpus import corpus_bytes
    from density_tpu.engine.grouping import hash_quads
    from density_tpu.kernels import bigsort
    from density_tpu.codecs import chameleon as cham

    data = corpus_bytes()
    words, nbytes = benchmod._stage_words("chameleon", data, 1 << 20)
    S, n_q = words.shape

    def pre(quads):
        quads = quads.astype(jnp.uint32)
        h = hash_quads(quads).astype(jnp.int32)
        lidx = jnp.arange(n_q, dtype=jnp.int32)[None, :]
        seg_bits = (n_q - 1).bit_length() - 16
        p = (h << seg_bits) | (lidx >> 16)
        s = jnp.broadcast_to(lidx & 0xFFFF, p.shape)
        return p, s, quads

    t, c = timeit(pre, words)
    print(f"pre (quads+hash+key): {t*1e3:.2f} ms (compile {c:.1f}s)",
          flush=True)

    p, s, q = (jnp.asarray(np.asarray(x)) for x in pre(words))

    def post(p_s, s_s, q_s):
        seg_bits = (n_q - 1).bit_length() - 16
        prev_p = jnp.pad(p_s[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
        prev_q = jnp.pad(q_s[:, :-1], ((0, 0), (1, 0)))
        same = (prev_p >> seg_bits) == (p_s >> seg_bits)
        lidx_s = ((p_s & ((1 << seg_bits) - 1)) << 16) | s_s
        is_map_s = jnp.where(same, q_s == prev_q, q_s == 0)
        return (lidx_s << 1) | is_map_s.astype(jnp.int32)

    t, c = timeit(post, p, s, q.astype(jnp.int32))
    print(f"post (compare+pack): {t*1e3:.2f} ms (compile {c:.1f}s)",
          flush=True)

    up = jnp.asarray(np.random.default_rng(0).integers(
        0, 2**19, (S, n_q), dtype=np.int32))

    def tail(up, quads):
        quads = quads.astype(jnp.uint32)
        h = hash_quads(quads)
        lidx = jnp.arange(n_q, dtype=jnp.int32)[None, :]
        real = lidx < (nbytes[:, None] // 4)
        is_map = ((up & 1) == 1) & real
        flags = is_map.astype(jnp.int32)
        pw = jnp.where(real, jnp.where(is_map, 1, 2), 0)
        w0 = jnp.where(is_map, h.astype(jnp.uint32),
                       quads & 0xFFFF).astype(jnp.uint32)
        w1 = (quads >> 16).astype(jnp.uint32)
        nb = n_q // cham.Q
        pbw = pw.reshape(S, nb, cham.Q).sum(axis=2)
        return flags, pw, w0, w1, pbw

    t, c = timeit(tail, up, words)
    print(f"tail (flags/pw/w0w1/pbw): {t*1e3:.2f} ms (compile {c:.1f}s)",
          flush=True)


if __name__ == "__main__":
    main()
