"""Segmented move-to-front (MTF-K) depths via associative scan.

This is the TPU-native reformulation of lion's 5-deep prediction queue
(reference: lion.rs:42-57, 211-270): a hit at depth d promotes the
entry to the front (shifting 0..d-1 down), a miss shifts the whole
queue and inserts at the front. Probed and updated serially per quad in
the reference, the queue state is *associatively composable*:

    A segment of updates is summarized by its distinct values in
    recency order, capped at K:  D(seg) = take_K(distinct-by-recency).
    Composition:  D(a ++ b) = take_K(D(b) ++ (D(a) \\ set(D(b)))).

This monoid makes the MTF state a parallel prefix scan
(jax.lax.associative_scan) over hash-grouped subsequences -- O(n log n)
fully-vectorized work instead of a serial chain.

Zero-initialized queues are modelled exactly by zero-padding: the
initial five zero sentinels always sit *below* every live entry and
behave as "value 0 with a virtual occurrence before the stream", so

    depth(v at t) = position of v in [D_before ++ zeros][0:K]
                  = index in D_before if present,
                    else cnt_before if v == 0 and cnt_before < K,
                    else MISS.

Segments (hash groups) are handled with a sticky flag folded into the
monoid; masked elements contribute the identity (empty summary).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from density_tpu.engine.grouping import sort_by_group


def mtf_depths_in_group(group, values, valid, K: int):
    """MTF-K depth of each element at its time of arrival, within its
    group, over valid elements only.

    Returns depth (n,) int32 in [0, K] -- K means MISS (not in queue).
    Invalid elements get K. Original order.
    """
    order, inv = sort_by_group(group)
    g_s = group[order]
    v_s = values[order]
    valid_s = valid[order]
    first = jnp.concatenate([
        jnp.ones(1, dtype=bool), g_s[1:] != g_s[:-1]])
    return mtf_depths_sorted(first, v_s, valid_s, K)[inv]


def mtf_depths_sorted(first, v_s, valid_s, K: int, axis: int = 0):
    """Sorted-domain core of mtf_depths_in_group: inputs already
    grouped contiguously (segment starts marked by `first`). Dense --
    no gathers; usable directly on multi-operand-sorted data.
    Batched callers pass (S, n) arrays with axis=1."""
    # element summaries
    # State as K SEPARATE slot arrays with a fully unrolled combine:
    # the trailing-K-dim formulation forced XLA to materialize
    # (.., N, K, K) membership/one-hot intermediates at every doubling
    # step (36.6 ms for K=5 at (9, 2^18) on v5e); the unrolled form is
    # a chain of elementwise (.., N) ops XLA fuses flat (~6x faster).
    zero = jnp.zeros_like(v_s)
    D = [jnp.where(valid_s, v_s, zero)] + [zero] * (K - 1)
    # count (3 bits) and sticky (1 bit) packed into one operand -- one
    # fewer carried array in the traffic-bound doubling scan
    cs = (valid_s.astype(jnp.int32) << 1) | first.astype(jnp.int32)

    def combine(a, b):
        Da, csa = a[:K], a[K]
        Db, csb = b[:K], b[K]
        cnta = csa >> 1
        cntb, stb = csb >> 1, (csb & 1) == 1
        # merge: Db ++ (Da \ set(Db)), capped K
        keep = []
        for j in range(K):
            in_b = False
            for m in range(K):
                in_b = in_b | ((cntb >= m + 1) & (Da[j] == Db[m]))
            keep.append((cnta >= j + 1) & ~in_b)
        # kept-rank of Da[j] (exclusive count of kept entries before j)
        rank = []
        run = 0
        for j in range(K):
            rank.append(run)
            run = run + keep[j].astype(jnp.int32)
        nkept = run
        Dm = []
        for m in range(K):
            # slot m: Db[m] if m < cntb, else the (m - cntb)-th kept
            fill = zero
            for j in range(K):
                fill = jnp.where(keep[j] & (cntb + rank[j] == m),
                                 Da[j], fill)
            Dm.append(jnp.where(cntb >= m + 1, Db[m], fill))
        cntm = jnp.minimum(cntb + nkept, K)
        # sticky: b wins if it is a segment start
        Do = [jnp.where(stb, Db[m], Dm[m]) for m in range(K)]
        cnto = jnp.where(stb, cntb, cntm)
        return tuple(Do) + ((cnto << 1) | ((csa | csb) & 1),)

    from density_tpu.engine.grouping import monoid_scan
    scanned = monoid_scan(combine, tuple(D) + (cs,),
                          (0,) * K + (0,), axis)
    Ds, cnts = scanned[:K], scanned[K] >> 1

    # state BEFORE element t: scan at t-1, empty at segment starts
    D_before = [jnp.where(first, 0, jnp.roll(d, 1, axis=axis))
                for d in Ds]
    cnt_before = jnp.where(first, 0, jnp.roll(cnts, 1, axis=axis))

    depth_s = jnp.full(v_s.shape, K, jnp.int32)
    zero_pad_hit = (v_s == 0) & (cnt_before < K)
    depth_s = jnp.where(zero_pad_hit, cnt_before, depth_s)
    for m in reversed(range(K)):
        depth_s = jnp.where((cnt_before >= m + 1)
                            & (D_before[m] == v_s), m, depth_s)
    depth_s = jnp.where(valid_s, depth_s, K)
    return depth_s.astype(jnp.int32)
