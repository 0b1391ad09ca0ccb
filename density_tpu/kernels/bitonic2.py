"""Pallas in-VMEM bitonic sort, statically unrolled (TPU).

Drop-in replacement for kernels/bitonic.py with the Batcher network
fully unrolled at trace time: every pass has a *static* XOR-distance,
so the butterfly compiles to static lane/sublane rotates (cheap VPU
shuffles) instead of dynamic `pltpu.roll` + a `lax.cond` per pass, and
the direction/half masks fold into broadcast compares of cached iotas.

Semantics identical to bitonic.sort (see bitonic.py): sorts (S, N) i32
arrays by the first n_keys keys (lexicographic, non-negative keys),
carrying the rest; N a power of two >= 256; NOT stable (fold a unique
index into the key).

Reference mapping: replaces the serial dictionary probe order of
chameleon.rs:88-100 with hash-group adjacency (SURVEY.md §7 step 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _schedule(n: int):
    """Batcher bitonic pass schedule: (d, kbit) per pass, static."""
    K = n.bit_length() - 1
    out = []
    for k in range(1, K + 1):
        for j in reversed(range(k)):
            out.append((1 << j, 1 << k))
    return out


def _make_kernel(R: int, n_keys: int, n_vals: int, schedule):
    n_arr = n_keys + n_vals

    def kernel(*refs):
        in_refs = refs[:n_arr]
        out_refs = refs[n_arr:2 * n_arr]
        scr = [r.at[0] for r in out_refs]
        for a in range(n_arr):
            scr[a][...] = in_refs[a][0]

        riota = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

        for d, kb in schedule:
            arrs = [scr[a][...] for a in range(n_arr)]
            if d < 128:
                parts = [pltpu.roll(x, 128 - d, axis=1) for x in arrs]
                alts = [pltpu.roll(x, d, axis=1) for x in arrs]
                low = ((ciota & d) == 0).astype(jnp.int32)
            else:
                dr = d // 128
                parts = [pltpu.roll(x, R - dr, axis=0) for x in arrs]
                alts = [pltpu.roll(x, dr, axis=0) for x in arrs]
                low = ((riota & dr) == 0).astype(jnp.int32)
            lowb = low == 1
            parts = [jnp.where(lowb, u, v) for u, v in zip(parts, alts)]

            k1, pk1 = arrs[0], parts[0]
            # i32 mask logic throughout: Mosaic vector i1 support is
            # partial on real TPU (see bitonic.py notes).
            if n_keys == 2:
                k2, pk2 = arrs[1], parts[1]
                p_lt = ((pk1 < k1).astype(jnp.int32)
                        | ((pk1 == k1).astype(jnp.int32)
                           & (pk2 < k2).astype(jnp.int32)))
                p_gt = ((k1 < pk1).astype(jnp.int32)
                        | ((k1 == pk1).astype(jnp.int32)
                           & (k2 < pk2).astype(jnp.int32)))
            else:
                p_lt = (pk1 < k1).astype(jnp.int32)
                p_gt = (k1 < pk1).astype(jnp.int32)
            if kb < 128:
                dirup = ((ciota & kb) == 0).astype(jnp.int32)
            elif kb == R * 128:
                dirup = jnp.ones((R, 128), jnp.int32)
            else:
                dirup = ((riota & (kb // 128)) == 0).astype(jnp.int32)
            sel_gt = dirup ^ low
            take = (sel_gt * p_gt + (1 - sel_gt) * p_lt) == 1
            for a in range(n_arr):
                scr[a][...] = jnp.where(take, parts[a], arrs[a])

    return kernel


@functools.partial(jax.jit, static_argnames=("n_keys", "interpret"))
def sort(*arrays, n_keys: int = 1, interpret: bool = False):
    """Sort (S, N) i32 arrays by the first `n_keys` (lexicographic),
    carrying the rest. N a power of two >= 256; keys non-negative."""
    S, N = arrays[0].shape
    assert N >= 256 and (N & (N - 1)) == 0, N
    R = N // 128
    schedule = _schedule(N)
    n_arr = len(arrays)
    kernel = _make_kernel(R, n_keys, n_arr - n_keys, schedule)
    outs = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[pl.BlockSpec((1, R, 128), lambda s: (s, 0, 0))] * n_arr,
        out_specs=[pl.BlockSpec((1, R, 128), lambda s: (s, 0, 0))] * n_arr,
        out_shape=[jax.ShapeDtypeStruct((S, R, 128), jnp.int32)] * n_arr,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*[a.astype(jnp.int32).reshape(S, R, 128) for a in arrays])
    return tuple(o.reshape(S, N) for o in outs)
