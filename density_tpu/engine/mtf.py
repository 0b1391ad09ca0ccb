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
    slot = jnp.arange(K)
    D = jnp.where((slot == 0) & valid_s[..., None],
                  v_s[..., None], 0).astype(v_s.dtype)
    cnt = valid_s.astype(jnp.int32)
    sticky = first

    def combine(a, b):
        Da, cnta, sta = a
        Db, cntb, stb = b
        # merge: Db ++ (Da \ set(Db)), capped K
        in_b = ((Da[..., :, None] == Db[..., None, :])
                & (slot[None, :] < cntb[..., None, None])).any(-1)
        keep = (slot < cnta[..., None]) & ~in_b
        kcum = jnp.cumsum(keep.astype(jnp.int32), axis=-1)
        posn = cntb[..., None] + kcum - keep.astype(jnp.int32)
        posn = jnp.where(keep, posn, K)  # drop
        # scatter Da entries into slots >= cntb
        contrib = jnp.zeros_like(Da)
        onehot = (posn[..., :, None] == slot[None, :]).astype(Da.dtype)
        contrib = (Da[..., :, None] * onehot).sum(-2)
        Dm = jnp.where(slot < cntb[..., None], Db, contrib)
        cntm = jnp.minimum(cntb + keep.sum(-1), K)
        # sticky: b wins if it is a segment start
        Do = jnp.where(stb[..., None], Db, Dm)
        cnto = jnp.where(stb, cntb, cntm)
        sto = sta | stb
        return Do, cnto, sto

    from density_tpu.engine.grouping import monoid_scan
    Ds, cnts, _ = monoid_scan(combine, (D, cnt, sticky),
                              (0, 0, False), axis)

    # state BEFORE element t: scan at t-1, empty at segment starts
    D_before = jnp.where(first[..., None], 0, jnp.roll(Ds, 1, axis=axis))
    cnt_before = jnp.where(first, 0, jnp.roll(cnts, 1, axis=axis))

    match = (D_before == v_s[..., None]) & (slot < cnt_before[..., None])
    found = match.any(-1)
    first_match = jnp.argmax(match, axis=-1).astype(jnp.int32)
    zero_pad_hit = (~found) & (v_s == 0) & (cnt_before < K)
    depth_s = jnp.where(found, first_match,
                        jnp.where(zero_pad_hit, cnt_before, K))
    depth_s = jnp.where(valid_s, depth_s, K)
    return depth_s.astype(jnp.int32)
