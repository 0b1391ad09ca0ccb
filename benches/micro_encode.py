"""Microbench: device encode/decode stages on the attached TPU at the
bench geometry (10 MiB corpus, 1 MiB streams). Phases selectable:

    python benches/micro_encode.py [plan|encode|decode|all] [codec]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, chain=8, repeats=3):
    @jax.jit
    def chained(*a):
        def step(_, carry):
            a, acc = jax.lax.optimization_barrier(carry)
            outs = fn(*a)
            leaf = jax.tree_util.tree_leaves(outs)[0]
            return (a, acc ^ jnp.sum(leaf[..., :8].astype(jnp.int32)))
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
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "stages":
        return stages()
    codec = sys.argv[2] if len(sys.argv) > 2 else "chameleon"
    import importlib
    from benches.corpus import corpus_bytes
    from density_tpu.parallel import sharding
    from density_tpu import container

    data = corpus_bytes()
    n = len(data)
    mod = importlib.import_module(f"density_tpu.codecs.{codec}")

    if which in ("plan", "encode", "all"):
        import bench as benchmod
        words, nbytes = benchmod._stage_words(codec, data, 1 << 20)
        print(f"staged {words.shape}", flush=True)
        if which in ("plan", "all") and hasattr(mod, "plan_fast_pallas"):
            t, c = timeit(mod.plan_fast_pallas, words, nbytes)
            print(f"{codec} plan_fast_pallas: {t*1e3:.2f} ms "
                  f"({n/t/1e9:.3f} GB/s, compile {c:.1f}s)", flush=True)
        if which in ("encode", "all"):
            fused = benchmod._pick_encode_fn(codec, words)
            t, c = timeit(fused, words, nbytes)
            print(f"{codec} fused encode: {t*1e3:.2f} ms "
                  f"({n/t/1e9:.3f} GB/s, compile {c:.1f}s)", flush=True)
            t, c = timeit(mod.PIPELINE.encode_fused_xla, words, nbytes)
            print(f"{codec} fused encode XLA: {t*1e3:.2f} ms "
                  f"({n/t/1e9:.3f} GB/s, compile {c:.1f}s)", flush=True)

    if which in ("decode", "all"):
        blob = container.compress(data, codec, 1 << 20)
        print(f"blob ratio {n/len(blob):.3f}", flush=True)
        dcodec, device_args, _, _ = sharding.decode_prep(blob)
        t, c = timeit(
            lambda *a: sharding._decode_batch.__wrapped__(*a, dcodec),
            *device_args)
        print(f"{codec} device decode: {t*1e3:.2f} ms "
              f"({n/t/1e9:.3f} GB/s, compile {c:.1f}s)", flush=True)


def stages():
    """Granular stage timings at the bench geometry."""
    import bench as benchmod
    from benches.corpus import corpus_bytes
    from density_tpu.kernels import bigsort, pack as packmod
    from density_tpu.codecs import chameleon as cham
    import jax.numpy as jnp

    data = corpus_bytes()
    words, nbytes = benchmod._stage_words("chameleon", data, 1 << 20)
    S, n_q = words.shape
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.integers(0, 2**18, (S, n_q), dtype=np.int32))
    s = jnp.asarray(rng.integers(0, 2**16, (S, n_q), dtype=np.int32))
    q = jnp.asarray(rng.integers(0, 2**31, (S, n_q), dtype=np.int32))
    t, c = timeit(lambda a, b, d: bigsort.sort(a, b, d, n_keys=2), p, s, q)
    print(f"sort3 (2-key): {t*1e3:.2f} ms (compile {c:.1f}s)", flush=True)
    t, c = timeit(lambda a: bigsort.sort(a, n_keys=1), p)
    print(f"sort1: {t*1e3:.2f} ms (compile {c:.1f}s)", flush=True)

    flags, pw, w0, w1, real, bits = cham.plan_fast_pallas(words, nbytes)
    args = [jnp.asarray(np.asarray(x)) for x in (flags, pw, w0, w1)]
    t, c = timeit(lambda f, pwx, a, b: packmod.pack(
        f, pwx, a, b, nbytes, q=cham.Q, sig_words=cham.SIG_WORDS,
        block=cham.BLOCK, flag_bits=1), *args)
    print(f"pack: {t*1e3:.2f} ms (compile {c:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
