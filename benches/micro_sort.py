"""Microbench: bitonic sort variants on the attached TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(fn, *args, chain=8, repeats=3):
    @jax.jit
    def chained(*a):
        def step(_, carry):
            a, acc = jax.lax.optimization_barrier(carry)
            outs = fn(*a)
            leaf = jax.tree_util.tree_leaves(outs)[0]
            return (a, acc ^ jnp.sum(leaf[..., :8]).astype(jnp.int32))
        return jax.lax.fori_loop(0, chain, step, (args, jnp.int32(0)))[1]

    t0 = time.perf_counter()
    np.asarray(chained(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / chain, compile_s


def main():
    S, N = 10, 1 << 18
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**31, (S, N), dtype=np.int32))
    val = jnp.asarray(rng.integers(0, 2**31, (S, N), dtype=np.int32))

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "old"):
        from density_tpu.kernels import bitonic
        t, c = timeit(lambda k, v: bitonic.sort(k, v, n_keys=1), key, val)
        print(f"old bitonic 2-op: {t*1e3:.2f} ms (compile {c:.1f}s)")
        t, c = timeit(lambda k: bitonic.sort(k, n_keys=1), key)
        print(f"old bitonic 1-op: {t*1e3:.2f} ms (compile {c:.1f}s)")

    if which in ("all", "xla"):
        t, c = timeit(lambda k, v: jax.lax.sort((k, v), dimension=1,
                                                num_keys=1), key, val)
        print(f"xla sort 2-op: {t*1e3:.2f} ms (compile {c:.1f}s)")

    if which in ("all", "new"):
        from density_tpu.kernels import bigsort
        t, c = timeit(lambda k, v: bigsort.sort(k, v, n_keys=1), key, val)
        print(f"bigsort 2-op: {t*1e3:.2f} ms (compile {c:.1f}s)")
        t, c = timeit(lambda k: bigsort.sort(k, n_keys=1), key)
        print(f"bigsort 1-op: {t*1e3:.2f} ms (compile {c:.1f}s)")


if __name__ == "__main__":
    main()
