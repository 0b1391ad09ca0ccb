"""Microbench: chameleon device-decode stages at the bench geometry.

Prints the cost table that drives decode optimization (r5 example:
this is how the fill's chunked associative_scan was caught at 9.4 ms
of a 25.8 ms decode -- docs/PLAN.md).

    python benches/micro_decode.py [stream_size_bytes]

Timing method: K async dispatches of a jitted stage + one element
read-back. Do NOT use a barrier-chained fori wrapper here -- it
agreed with this method at (10, 2^18) but reported 6-8x inflated
times at (38, 65536) on the tunneled v5e (docs/PLAN.md, r5 timing
discipline).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, k=8, repeats=3):
    """K async dispatches + one sync; returns (best_seconds, compile)."""
    jfn = jax.jit(fn)

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        np.asarray(leaf[(0,) * leaf.ndim])

    t0 = time.perf_counter()
    sync(jfn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = jfn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / k)
    return best, compile_s


def main():
    ss = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 18)
    from benches.corpus import corpus_bytes
    from density_tpu import container
    from density_tpu.parallel import sharding
    from density_tpu.engine import unlayout
    from density_tpu.kernels import unpack
    from density_tpu.constants import CHAMELEON as SPEC
    from density_tpu.engine.grouping import hash_quads

    data = corpus_bytes()
    nd = len(data) // ss * ss
    data = data[:nd]
    n = len(data)
    blob = container.compress(data, "chameleon", ss)
    codec, device_args, _, host_meta = sharding.decode_prep(blob)
    wbytes, woff, is_copy, nb_real, out_len = device_args
    Q, SIGW = SPEC.quads_per_block, SPEC.sig_words

    fn = sharding.pick_decode_fn(codec, device_args,
                                 bool(host_meta[2].any()))
    t, c = timeit(lambda *a: fn(*a)[0], *device_args)
    print(f"full device decode: {t*1e3:6.2f} ms ({n/t/1e9:.3f} GB/s, "
          f"compile {c:.1f}s)", flush=True)

    # stage inputs (materialized so each stage times in isolation)
    w32 = jnp.asarray(np.asarray(wbytes).view("<u2").astype(np.uint32))
    NB = woff.shape[1]
    N = NB * Q
    woff_k = jnp.asarray(np.where(
        np.arange(NB)[None, :] < np.asarray(nb_real)[:, None],
        np.asarray(woff), -1))
    ic = jnp.asarray(np.asarray(is_copy))

    t, c = timeit(lambda w, wo, cc: unpack.unpack(
        w, wo, cc, q=Q, sig_words=SIGW, flag_bits=1), w32, woff_k, ic)
    print(f"unpack kernel:      {t*1e3:6.2f} ms (compile {c:.1f}s)",
          flush=True)

    flags, w0, w1 = unpack.unpack(w32, woff_k, ic, q=Q, sig_words=SIGW,
                                  flag_bits=1)
    kidx = jnp.arange(N, dtype=jnp.int32)[None, :]
    real = kidx < (jnp.asarray(np.asarray(out_len))[:, None] // 4)
    is_map = (flags == 1) & real
    is_plain = real & ~is_map
    pq = (w0.astype(jnp.uint32) | (w1.astype(jnp.uint32) << 16))
    h = jnp.where(is_map, w0.astype(jnp.uint32), hash_quads(pq))
    stage = [jnp.asarray(np.asarray(x)) for x in (is_map, is_plain, h, pq)]

    t, c = timeit(unlayout.resolve_chameleon, *stage)
    print(f"resolve (2 sorts+fill): {t*1e3:6.2f} ms (compile {c:.1f}s)",
          flush=True)


if __name__ == "__main__":
    main()
