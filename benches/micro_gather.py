"""Microbench: XLA gather variants on v5e -- is a monotone (sorted)
gather faster than a random one? Decode's token extraction is a
monotone gather of ~2.6M u16 words; if indices_are_sorted unlocks a
vector path, the planned Pallas unpack kernel is unnecessary."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benches.micro_encode import timeit


def main():
    rng = np.random.default_rng(0)
    S, W, N = 10, 540672, 262144
    words = jnp.asarray(rng.integers(0, 65536, (S, W), dtype=np.int32))
    sortedpos = np.sort(rng.integers(0, W, (S, N)), axis=1).astype(np.int32)
    randpos = rng.integers(0, W, (S, N)).astype(np.int32)
    sp = jnp.asarray(sortedpos)
    rp = jnp.asarray(randpos)

    def g_plain(w, p):
        return jax.vmap(lambda ww, pp: ww[pp])(w, p)

    def g_sorted(w, p):
        return jax.vmap(lambda ww, pp: jnp.take(
            ww, pp, indices_are_sorted=True))(w, p)

    def g_u8(w, p):
        # 32->8 bit values: does element width matter?
        wb = (w & 0xFF).astype(jnp.uint8)
        return jax.vmap(lambda ww, pp: ww[pp])(wb, p)

    t, c = timeit(g_plain, words, rp)
    print(f"random gather i32 : {t*1e3:.2f} ms (compile {c:.1f}s)",
          flush=True)
    t, c = timeit(g_plain, words, sp)
    print(f"monotone gather i32 (no hint): {t*1e3:.2f} ms", flush=True)
    t, c = timeit(g_sorted, words, sp)
    print(f"monotone gather i32 (sorted hint): {t*1e3:.2f} ms", flush=True)
    t, c = timeit(g_u8, words, rp)
    print(f"random gather u8 : {t*1e3:.2f} ms", flush=True)

    # one-hot matmul "gather" at block granularity for comparison:
    # window 256 lanes, 2048 queries per 2048-token tile
    def g_mm(w, p):
        # queries constrained to 128-wide windows: emulate cost only
        wq = w.reshape(S, -1, 128).astype(jnp.bfloat16)
        oh = jax.nn.one_hot(p[:, :4096] % 128, 128, dtype=jnp.bfloat16)
        win = wq[:, :32].reshape(S, 32 * 128)[:, :128 * 32]
        return jnp.einsum("sqc,sc->sq", oh[:, :, :],
                          win[:, :128].astype(jnp.bfloat16))

    t, c = timeit(g_mm, words, rp)
    print(f"(onehot matmul probe, not comparable): {t*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
