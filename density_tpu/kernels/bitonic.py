"""Pallas in-VMEM bitonic sort (TPU).

XLA's variadic `lax.sort` is the dominant cost of the encode planner
(~30 ms for 2.6M quads on v5e): its comparator network materializes
every stage through HBM. This kernel runs the whole Batcher bitonic
network on arrays resident in VMEM, one stream per grid step.

Design notes:
  * data is viewed as (R, 128) i32, flat index i = r*128 + c; a
    compare-exchange with XOR-partner distance d is a *butterfly*:
    for d < 128 the partner sits in lane c ^ d of the same row, for
    d >= 128 in row r ^ (d/128) of the same lane. Both reduce to two
    rotates plus a select on the `i & d` bit -- dense VPU ops, no
    gathers (`pltpu.roll` takes dynamic shifts, so the 171-pass
    schedule runs as a `fori_loop` over an SMEM table).
  * keys are one i32 array, or two compared lexicographically
    ((k1, k2) -- used for (hash|segment, index) pairs that exceed 32
    bits). All keys must be non-negative (signed compares).
  * bitonic networks are NOT stable: callers needing stability must
    fold a unique index into the key (lex2 or packed bits).
  * N must be a power of two and a multiple of 256 (pow2 >= 256).

Used by the codec planners to replace `grouping.sort_with` /
`unsort_with` on the hot path (reference semantics unchanged:
chameleon.rs:88-100 dictionary adjacency, SURVEY.md §7 step 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _schedule(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Batcher bitonic pass schedule: (d, kbit) per pass."""
    K = n.bit_length() - 1
    ds, ks = [], []
    for k in range(1, K + 1):
        for j in reversed(range(k)):
            ds.append(1 << j)
            ks.append(1 << k)
    return (np.asarray(ds, np.int32), np.asarray(ks, np.int32))


def _butterfly(x, d, R):
    """Partner values for XOR-distance d (dynamic scalar)."""

    def lane(x):
        dd = d
        up = pltpu.roll(x, 128 - dd, axis=1)   # y[c] = x[c + d]
        dn = pltpu.roll(x, dd, axis=1)         # y[c] = x[c - d]
        c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where((c & dd) == 0, up, dn)

    def sub(x):
        dr = d // 128
        up = pltpu.roll(x, R - dr, axis=0)
        dn = pltpu.roll(x, dr, axis=0)
        r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where((r & dr) == 0, up, dn)

    return jax.lax.cond(d < 128, lane, sub, x)


def _make_kernel(R: int, n_keys: int, n_vals: int, n_pass: int):
    n_arr = n_keys + n_vals

    def kernel(d_ref, k_ref, *refs):
        # sort in place in the output blocks: no VMEM scratch (a
        # scratch copy pushed the 2048-row x 3-operand case past the
        # 16 MB scoped-vmem limit with pipeline double buffering)
        in_refs = refs[:n_arr]
        out_refs = refs[n_arr:2 * n_arr]
        scr = [r.at[0] for r in out_refs]

        for a in range(n_arr):
            scr[a][...] = in_refs[a][0]

        iota = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))

        def body(t, _):
            d = d_ref[t]
            kb = k_ref[t]
            arrs = [scr[a][...] for a in range(n_arr)]
            parts = [_butterfly(x, d, R) for x in arrs]
            k1, pk1 = arrs[0], parts[0]
            # All mask logic stays in i32 (0/1): Mosaic's vector i1
            # support is partial on real TPU (arith.trunci i8->i1 is
            # rejected), so build selects from integer compares only.
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
            is_lower = ((iota & d) == 0).astype(jnp.int32)
            dirup = ((iota & kb) == 0).astype(jnp.int32)
            sel_gt = dirup ^ is_lower           # i32 0/1
            take = (sel_gt * p_gt + (1 - sel_gt) * p_lt) == 1
            for a in range(n_arr):
                scr[a][...] = jnp.where(take, parts[a], arrs[a])
            return 0

        jax.lax.fori_loop(0, n_pass, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_keys", "interpret"))
def sort(*arrays, n_keys: int = 1, interpret: bool = False):
    """Sort (S, N) i32 arrays by the first `n_keys` (lexicographic),
    carrying the rest. Returns the arrays in sorted order.

    N must be a power of two, >= 256. Keys must be non-negative.
    """
    S, N = arrays[0].shape
    assert N >= 256 and (N & (N - 1)) == 0, N
    R = N // 128
    ds, ks = _schedule(N)
    n_arr = len(arrays)
    kernel = _make_kernel(R, n_keys, n_arr - n_keys, len(ds))
    outs = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)] + [
            pl.BlockSpec((1, R, 128), lambda s: (s, 0, 0))] * n_arr,
        out_specs=[pl.BlockSpec((1, R, 128), lambda s: (s, 0, 0))] * n_arr,
        out_shape=[jax.ShapeDtypeStruct((S, R, 128), jnp.int32)] * n_arr,
        # 3-operand 2048-row streams need ~20 MB with pipeline double
        # buffering; v5e cores have 128 MB VMEM, the 16 MB scoped
        # default is just conservative
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(ds), jnp.asarray(ks),
      *[a.astype(jnp.int32).reshape(S, R, 128) for a in arrays])
    return tuple(o.reshape(S, N) for o in outs)
