"""Stage-level TPU timing probe for the encode pipeline (diagnostic).

Times each jitted stage of the chameleon container path on the
attached accelerator, plus microbenchmarks of the underlying sort and
scatter primitives, to direct optimization work.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(out):
    """Force execution to completion with a tiny host read --
    block_until_ready is not reliable on the tunneled axon platform."""
    leaf = jax.tree_util.tree_leaves(out)[-1]
    return np.asarray(leaf[(0,) * leaf.ndim])


def t(fn, *args, n=5):
    sync(fn(*args))  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from benches.corpus import corpus_bytes
    from density_tpu.codecs import chameleon
    from density_tpu.engine import layout

    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    data = corpus_bytes()
    n = len(data)
    stream_size = 1 << 20
    S = -(-n // stream_size)
    cap = layout.bucket_bytes(stream_size, 256)
    padded = np.zeros(S * cap, np.uint8)
    v = padded.reshape(S, cap)
    buf = np.frombuffer(data, np.uint8)
    for s in range(S):
        c = buf[s * stream_size:(s + 1) * stream_size]
        v[s, :c.size] = c
    words = jnp.asarray(v.view("<u4").reshape(S, cap // 4))
    nbytes = jnp.asarray(np.clip(n - np.arange(S) * stream_size, 0,
                                 stream_size).astype(np.int32))
    pipe = chameleon.PIPELINE
    nb = cap // 4 // chameleon.Q
    copy0 = jnp.zeros((S, nb), dtype=bool)

    print("compiling plan...", file=sys.stderr)
    t0 = time.perf_counter()
    plan_out = pipe.plan(words, nbytes, copy0)
    sync(plan_out)
    print(f"plan compile+run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    dt = t(lambda: pipe.plan(words, nbytes, copy0))
    print(f"plan: {dt*1e3:.2f} ms -> {n/1e9/dt:.2f} GB/s", file=sys.stderr)

    flags, pw, w0, w1, valid, bits = plan_out
    dt = t(lambda: pipe.step_fsm(bits, nbytes))
    print(f"fsm:  {dt*1e3:.2f} ms", file=sys.stderr)
    copy = pipe.step_fsm(bits, nbytes)

    t0 = time.perf_counter()
    out = pipe.assemble(words, nbytes, copy, flags, pw, w0, w1, valid)
    sync(out)
    print(f"assemble compile+run: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    dt = t(lambda: pipe.assemble(words, nbytes, copy, flags, pw, w0, w1,
                                 valid))
    print(f"assemble: {dt*1e3:.2f} ms -> {n/1e9/dt:.2f} GB/s",
          file=sys.stderr)

    # primitive microbenches at the same scale
    n_q = cap // 4
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.integers(0, 65536, (S, n_q)).astype(np.uint32))
    q = jnp.asarray(rng.integers(0, 2**31, (S, n_q)).astype(np.uint32))

    srt = jax.jit(jax.vmap(lambda k: jnp.argsort(k, stable=True)))
    dt = t(lambda: srt(h))
    print(f"argsort {S}x{n_q}: {dt*1e3:.2f} ms", file=sys.stderr)

    def lsort(k, v):
        return jax.lax.sort((k, v), num_keys=1, is_stable=True)
    vsort = jax.jit(jax.vmap(lsort))
    idx = jnp.broadcast_to(jnp.arange(n_q, dtype=jnp.int32), (S, n_q))
    dt = t(lambda: vsort(h, idx))
    print(f"lax.sort kv {S}x{n_q}: {dt*1e3:.2f} ms", file=sys.stderr)

    def scat(idx, vals):
        out = jnp.zeros((idx.shape[0],), jnp.uint32)
        return out.at[idx].set(vals, mode="drop")
    vscat = jax.jit(jax.vmap(lambda i, v: jnp.zeros(n_q, jnp.uint32)
                             .at[i].set(v, mode="drop")))
    perm = jnp.asarray(
        np.stack([rng.permutation(n_q) for _ in range(S)]).astype(np.int32))
    dt = t(lambda: vscat(perm, q))
    print(f"scatter {S}x{n_q} (random idx): {dt*1e3:.2f} ms", file=sys.stderr)

    mono = jnp.broadcast_to(jnp.arange(n_q, dtype=jnp.int32), (S, n_q))
    dt = t(lambda: vscat(mono, q))
    print(f"scatter {S}x{n_q} (monotone idx): {dt*1e3:.2f} ms",
          file=sys.stderr)

    vgat = jax.jit(jax.vmap(lambda i, v: v[i]))
    dt = t(lambda: vgat(perm, q))
    print(f"gather {S}x{n_q} (random idx): {dt*1e3:.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
