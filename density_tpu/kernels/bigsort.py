"""Segmented Pallas bitonic sort: fast compiles at ANY length (TPU).

A monolithic statically-unrolled bitonic kernel (retired in r4) is fast
but its Mosaic compile time explodes with array length (1.4 s at 2^16
elements, 738 s at 2^18 -- the static row rotations unroll into O(rows)
vreg moves per pass). This module runs the SAME Batcher network as a
composition of fixed-size pieces, so every Pallas kernel that ever
compiles is a 65536-element (512x128) segment kernel:

  * `seg sort` kernel: bitonic stages 1..16 on each 65536-element
    segment. Stages < 16 have purely segment-local directions; the
    final stage's direction is the segment's global bit 16, passed in
    as a per-segment flag.
  * cross passes (XOR distance >= 65536) exchange whole segments --
    one fused elementwise XLA op per pass over a static segment
    permutation (no Pallas, negligible compile, HBM-bandwidth cost).
  * `finish` kernel: the remaining passes (d = 32768..1) of each merge
    stage, direction constant per segment (global bit k), again a
    per-segment flag.

Total pass count equals the monolithic network; compile cost is
O(seconds) and independent of N. Semantics match bitonic.sort: sorts
(S, N) i32 arrays by the first n_keys keys (lexicographic,
non-negative), carrying the rest; N a power of two >= 256; NOT stable
(fold a unique index into the key).

Reference mapping: replaces the serial dictionary probe order of
chameleon.rs:88-100 with hash-group adjacency (SURVEY.md §7 step 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 1 << 16          # elements per segment kernel
SEG_ROWS = SEG // 128  # 512

# direction-source marker: the pass direction comes from the
# per-segment flag instead of a local iota bit
FLAG_DIR = -1


def _full_schedule(n: int):
    """Stages 1..log2(n) on an n-element segment; the last stage's
    direction comes from the segment flag (global bit log2(n))."""
    K = n.bit_length() - 1
    out = []
    for k in range(1, K + 1):
        kb = (1 << k) if k < K else FLAG_DIR
        for j in reversed(range(k)):
            out.append((1 << j, kb))
    return out


def _finish_schedule(n: int):
    """Intra-segment tail of a global merge stage: d = n/2 .. 1, all
    directions from the segment flag."""
    return [(1 << j, FLAG_DIR) for j in reversed(range(n.bit_length() - 1))]


def _cmp_take(arrs, parts, n_keys, sel_gt):
    """take-partner mask for a compare-exchange (i32 mask logic: Mosaic
    vector i1 support is partial on real TPU, see bitonic.py)."""
    k1, pk1 = arrs[0], parts[0]
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
    return (sel_gt * p_gt + (1 - sel_gt) * p_lt) == 1


def _make_kernel(n_keys: int, n_vals: int, schedule, R: int):
    """Statically-unrolled pass kernel over one (R, 128) segment with a
    per-segment direction flag in SMEM."""
    n_arr = n_keys + n_vals

    def kernel(flag_ref, *refs):
        in_refs = refs[:n_arr]
        out_refs = refs[n_arr:2 * n_arr]
        scr = [r.at[0] for r in out_refs]
        for a in range(n_arr):
            scr[a][...] = in_refs[a][0]

        g = pl.program_id(0)
        flag = flag_ref[g]  # 1 = ascending, 0 = descending
        riota = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

        for d, kb in schedule:
            arrs = [scr[a][...] for a in range(n_arr)]
            if d < 128:
                up = [pltpu.roll(x, 128 - d, axis=1) for x in arrs]
                dn = [pltpu.roll(x, d, axis=1) for x in arrs]
                low = ((ciota & d) == 0).astype(jnp.int32)
            else:
                dr = d // 128
                up = [pltpu.roll(x, R - dr, axis=0) for x in arrs]
                dn = [pltpu.roll(x, dr, axis=0) for x in arrs]
                low = ((riota & dr) == 0).astype(jnp.int32)
            lowb = low == 1
            parts = [jnp.where(lowb, u, v) for u, v in zip(up, dn)]

            if kb == FLAG_DIR:
                dirup = jnp.full((R, 128), flag, jnp.int32)
            elif kb < 128:
                dirup = ((ciota & kb) == 0).astype(jnp.int32)
            elif kb == R * 128:
                dirup = jnp.ones((R, 128), jnp.int32)
            else:
                dirup = ((riota & (kb // 128)) == 0).astype(jnp.int32)
            take = _cmp_take(arrs, parts, n_keys, dirup ^ low)
            for a in range(n_arr):
                scr[a][...] = jnp.where(take, parts[a], arrs[a])

    return kernel


def _run_seg_kernel(arrays, flags, n_keys, schedule, R, interpret=False):
    """arrays: list of (G, R, 128) i32; flags: (G,) int32."""
    G = arrays[0].shape[0]
    n_arr = len(arrays)
    kernel = _make_kernel(n_keys, n_arr - n_keys, schedule, R)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [
            pl.BlockSpec((1, R, 128), lambda g: (g, 0, 0))] * n_arr,
        out_specs=[pl.BlockSpec((1, R, 128), lambda g: (g, 0, 0))] * n_arr,
        out_shape=[jax.ShapeDtypeStruct((G, R, 128), jnp.int32)] * n_arr,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flags, *arrays)
    return list(outs)


def _xla_cross_pass(arrays, n_keys, nseg, d_seg, kb_seg):
    """One global pass with XOR distance d_seg segments (>= 1 whole
    segment): elementwise compare-exchange between partner segments.
    arrays: list of (S, nseg, SEG) i32."""
    j = np.arange(nseg)
    perm = j ^ d_seg
    parts = [a[:, perm, :] for a in arrays]
    low = ((j & d_seg) == 0).astype(np.int32)
    dirup = ((j & kb_seg) == 0).astype(np.int32) if kb_seg < nseg \
        else np.ones(nseg, np.int32)
    sel_gt = jnp.asarray((dirup ^ low)[None, :, None])
    take = _cmp_take(arrays, parts, n_keys, sel_gt)
    return [jnp.where(take, p, a) for a, p in zip(arrays, parts)]


@functools.partial(jax.jit, static_argnames=("n_keys", "interpret"))
def sort(*arrays, n_keys: int = 1, interpret: bool = False):
    """Sort (S, N) i32 arrays by the first `n_keys` (lexicographic),
    carrying the rest. N a power of two >= 256; keys non-negative."""
    S, N = arrays[0].shape
    assert N >= 256 and (N & (N - 1)) == 0, N
    arrs = [a.astype(jnp.int32) for a in arrays]

    if N <= SEG:
        R = N // 128
        segd = [a.reshape(S, R, 128) for a in arrs]
        flags = jnp.ones(S, jnp.int32)
        outs = _run_seg_kernel(segd, flags, n_keys, _full_schedule(N), R,
                               interpret)
        return tuple(o.reshape(S, N) for o in outs)

    nseg = N // SEG
    R = SEG // 128
    G = S * nseg
    j = np.arange(nseg)
    seg_bits = SEG.bit_length() - 1

    # stages 1..seg_bits: sort each segment; the final stage's
    # direction is global bit seg_bits = segment parity
    flags0 = jnp.asarray(np.tile(((j & 1) == 0).astype(np.int32), S))
    segd = [a.reshape(G, R, 128) for a in arrs]
    segd = _run_seg_kernel(segd, flags0, n_keys, _full_schedule(SEG), R,
                           interpret)

    finish = _finish_schedule(SEG)
    K = N.bit_length() - 1
    for k in range(seg_bits + 1, K + 1):
        kb_seg = (1 << k) // SEG
        cross = [a.reshape(S, nseg, SEG) for a in segd]
        for jj in reversed(range(seg_bits, k)):
            cross = _xla_cross_pass(cross, n_keys, nseg,
                                    (1 << jj) // SEG, kb_seg)
        # intra-segment tail: direction = global bit k per segment
        fl = jnp.asarray(
            np.tile(((j & kb_seg) == 0).astype(np.int32)
                    if kb_seg < nseg else np.ones(nseg, np.int32), S))
        segd = [c.reshape(G, R, 128) for c in cross]
        segd = _run_seg_kernel(segd, fl, n_keys, finish, R, interpret)

    return tuple(o.reshape(S, N) for o in segd)
