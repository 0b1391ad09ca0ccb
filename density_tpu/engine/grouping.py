"""Sort-based hash-grouping primitives.

These are the TPU-native replacement for the reference's sequential
hash-table probes (reference: chameleon.rs:88-100, cheetah.rs:123-149).
The key reformulation: a dictionary keyed by a 16-bit hash, probed and
updated serially per quad, is equivalent to *adjacency within
hash-groups* -- for each position, the dictionary value it observes is
a function of the previous few positions with the same hash. A single
stable sort by hash makes those neighbours adjacent, turning the serial
chain into vectorized gathers.

All functions operate on one stream (1-D arrays) and are vmappable
across streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from density_tpu.constants import HASH_MULTIPLIER, HASH_BITS


def hash_quads(quads: jax.Array) -> jax.Array:
    """h = (quad * 0x9D6EF916) >> 16 as uint32 in [0, 65536)."""
    q = quads.astype(jnp.uint32)
    return (q * jnp.uint32(HASH_MULTIPLIER)) >> (32 - HASH_BITS)


def sort_with(key: jax.Array, *ops: jax.Array):
    """Stable sort by `key`, carrying `ops` through the sort network.

    Multi-operand lax.sort avoids post-sort random gathers, which cost
    ~20 ns/element on TPU -- an order of magnitude more than the sort
    itself for the array sizes here.
    """
    return jax.lax.sort((key,) + ops, num_keys=1, is_stable=True)


def unsort_with(idx_sorted: jax.Array, *ops: jax.Array):
    """Inverse of sort_with given the carried original indices: one
    more sort, by original index, carrying the computed results back
    to original order (again gather-free)."""
    out = jax.lax.sort((idx_sorted,) + ops, num_keys=1, is_stable=True)
    return out[1:] if len(ops) > 1 else out[1]


def shift_right(x: jax.Array, fill, axis: int = 0) -> jax.Array:
    """Dense shift by one along `axis` (the 'previous element' in a
    sorted domain)."""
    return shift_n(x, 1, fill, axis)


def shift_n(x: jax.Array, s: int, fill, axis: int = 0) -> jax.Array:
    """Dense shift by s along `axis`, filling with `fill`."""
    if s >= x.shape[axis]:
        shape = x.shape
    else:
        shape = list(x.shape)
        shape[axis] = s
    pad = jnp.broadcast_to(jnp.asarray(fill, x.dtype), shape)
    if s >= x.shape[axis]:
        return pad
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis] - s)
    return jnp.concatenate([pad, x[tuple(sl)]], axis=axis)


def monoid_scan(combine, elems, identities, axis: int = 0):
    """Inclusive segmented-monoid prefix scan via Hillis-Steele
    doubling: log2(n) applications of combine(state shifted by s,
    state), shifting along `axis` and filling with the monoid identity
    (so positions with no left partner combine with the identity and
    pass through unchanged).

    This replaces jax.lax.associative_scan for the codec monoids: its
    odd-even recursion emits O(log n) dynamic-slice/concat layers that
    XLA compiles ORDERS OF MAGNITUDE slower for multi-operand monoids
    (227 s vs ~2 s for the MTF-2 monoid at n=1024 on CPU; the same
    blowup made the cheetah/lion fused encode a multi-minute remote
    TPU compile). Same O(n log n) work, fully dense.

    `axis` indexes the scan dimension in EVERY operand; operands may
    carry extra trailing state dims (e.g. (n, K) with axis=0).
    """
    n = elems[0].shape[axis]
    state = list(elems)
    s = 1
    while s < n:
        shifted = [shift_n(x, s, f, axis)
                   for x, f in zip(state, identities)]
        state = list(combine(tuple(shifted), tuple(state)))
        s *= 2
    return state


def sort_by_group(group: jax.Array):
    """Stable argsort by group id. Returns (order, inv_order)."""
    n = group.shape[0]
    order = jnp.argsort(group, stable=True)
    inv = jnp.zeros(n, dtype=jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return order, inv


def seg_last_active_before(first, vals, active, axis: int = 0):
    """Sorted-domain segmented fill, gather-free: for each position t,
    the value of the latest ACTIVE position strictly before t within
    its segment (segments delimited by `first`), else 0.

    Dense doubling scan: state (value, has); combine keeps the
    right state when it has a value. Returns (value, has).
    """
    val0 = jnp.where(active, vals, 0)
    has0 = active
    sticky0 = first

    def combine(a, b):
        va, ha, sa = a
        vb, hb, sb = b
        v = jnp.where(sb, vb, jnp.where(hb, vb, va))
        h = jnp.where(sb, hb, ha | hb)
        return v, h, sa | sb

    vi, hi, _ = monoid_scan(combine, (val0, has0, sticky0),
                            (0, False, False), axis)
    # exclusive: shift by one, reset at segment starts
    v = jnp.where(first, 0, shift_right(vi, 0, axis))
    h = jnp.where(first, False, shift_right(hi, False, axis))
    return v, h


def seg_mtf2_before(first, vals, active, axis: int = 0):
    """Sorted-domain MTF-2 state observed BEFORE each position, over
    active positions, segment-reset at `first`. Gather-free (dense
    doubling scan with the MTF monoid, K=2).

    Returns (front, second): the chunk_a/chunk_b pair the reference
    dictionaries would hold when this position is processed, with the
    zero-init convention (missing entries read as 0).
    """
    d0 = jnp.where(active, vals, 0)
    d1 = jnp.zeros_like(vals)
    # count (2 bits) and sticky (1 bit) packed into one operand: the
    # doubling scan is HBM-traffic-bound, so 3 carried arrays instead
    # of 4 is a straight 25% cut on the scan
    cs0 = (active.astype(jnp.int32) << 1) | first.astype(jnp.int32)

    def combine(a, b):
        a0, a1, csa = a
        b0, b1, csb = b
        ca = csa >> 1
        cb = csb >> 1
        sb = (csb & 1) == 1
        # membership of a-entries in b's distinct set
        in_b0 = ((cb >= 1) & (a0 == b0)) | ((cb >= 2) & (a0 == b1))
        in_b1 = ((cb >= 1) & (a1 == b0)) | ((cb >= 2) & (a1 == b1))
        keep0 = (ca >= 1) & ~in_b0
        keep1 = (ca >= 2) & ~in_b1
        first_kept = jnp.where(keep0, a0, a1)
        any_kept = keep0 | keep1
        # merged D = b.D ++ kept(a.D), capped at 2
        m0 = jnp.where(cb >= 1, b0, jnp.where(any_kept, first_kept, 0))
        m1 = jnp.where(cb >= 2, b1,
                       jnp.where(cb == 1,
                                 jnp.where(any_kept, first_kept, 0),
                                 jnp.where(keep0 & keep1, a1, 0)))
        cm = jnp.minimum(cb + keep0.astype(jnp.int32)
                         + keep1.astype(jnp.int32), 2)
        o0 = jnp.where(sb, b0, m0)
        o1 = jnp.where(sb, b1, m1)
        co = jnp.where(sb, cb, cm)
        return o0, o1, (co << 1) | ((csa | csb) & 1)

    i0, i1, _ = monoid_scan(combine, (d0, d1, cs0), (0, 0, 0), axis)
    front = jnp.where(first, 0, shift_right(i0, 0, axis))
    second = jnp.where(first, 0, shift_right(i1, 0, axis))
    return front, second


def seg_mtf2_before_packed(first, vals, active, axis: int = 1):
    """seg_mtf2_before for values that fit 17 bits (the planners'
    in-group fingerprints): the whole (front, second, cnt, sticky)
    state packs into TWO scan operands (front | second+cnt+sticky) --
    the doubling scan is traffic-bound, so 2 carried arrays instead of
    3 is a straight cut. Semantics identical to seg_mtf2_before."""
    d0 = jnp.where(active, vals.astype(jnp.int32), 0)
    cs0 = ((active.astype(jnp.int32) << 17)
           | (first.astype(jnp.int32) << 19))

    def combine(a, b):
        a0, pa = a
        b0, pb = b
        a1 = pa & 0x1FFFF
        b1 = pb & 0x1FFFF
        ca = (pa >> 17) & 3
        cb = (pb >> 17) & 3
        sb = (pb >> 19) == 1
        in_b0 = ((cb >= 1) & (a0 == b0)) | ((cb >= 2) & (a0 == b1))
        in_b1 = ((cb >= 1) & (a1 == b0)) | ((cb >= 2) & (a1 == b1))
        keep0 = (ca >= 1) & ~in_b0
        keep1 = (ca >= 2) & ~in_b1
        first_kept = jnp.where(keep0, a0, a1)
        any_kept = keep0 | keep1
        m0 = jnp.where(cb >= 1, b0, jnp.where(any_kept, first_kept, 0))
        m1 = jnp.where(cb >= 2, b1,
                       jnp.where(cb == 1,
                                 jnp.where(any_kept, first_kept, 0),
                                 jnp.where(keep0 & keep1, a1, 0)))
        cm = jnp.minimum(cb + keep0.astype(jnp.int32)
                         + keep1.astype(jnp.int32), 2)
        o0 = jnp.where(sb, b0, m0)
        o1 = jnp.where(sb, b1, m1)
        co = jnp.where(sb, cb, cm)
        return o0, (o1 | (co << 17) | ((pa | pb) & (1 << 19)))

    i0, ip = monoid_scan(combine, (d0, cs0), (0, 0), axis)
    i1 = ip & 0x1FFFF
    front = jnp.where(first, 0, shift_right(i0, 0, axis))
    second = jnp.where(first, 0, shift_right(i1, 0, axis))
    return front.astype(vals.dtype), second.astype(vals.dtype)


OP_ID, OP_SWAP, OP_INS = 0, 1, 2


def seg_sel2_before(first, op, cval, axis: int = 0):
    """Sorted-domain MTF-2 state BEFORE each position from *flag-driven*
    ops (decode side): OP_INS inserts the constant `cval` ((a,b) <-
    (c, a)), OP_SWAP swaps ((a,b) <- (b, a)), OP_ID leaves the state.
    Segments reset to the zero-initialized state at `first`.

    This is the decoder's dictionary chain (reference: cheetah.rs:68-103,
    lion.rs:88-124): plain = OP_INS(payload quad), mapA = OP_ID,
    mapB = OP_SWAP -- unlike the encoder's value-driven MTF the ops are
    known from the wire flags, so the whole per-hash-group chain is one
    associative scan of selection maps (src in {A=0, B=1, const=2}).

    Returns (a_before, b_before) uint32.
    """
    cval = cval.astype(jnp.uint32)
    # element = composed map (srcA, cA, srcB, cB): out_a = [a,b,cA][srcA]
    sa = jnp.where(op == OP_INS, 2, jnp.where(op == OP_SWAP, 1, 0))
    sb = jnp.where(op == OP_INS, 0, jnp.where(op == OP_SWAP, 0, 1))
    ca = jnp.where(op == OP_INS, cval, 0)
    cb = jnp.zeros_like(cval)
    # segment starts compose with the zero-init state: any input
    # selector resolves to const 0
    ca = jnp.where(first & (sa != 2), 0, ca)
    sa = jnp.where(first, 2, sa)
    cb = jnp.where(first & (sb != 2), 0, cb)
    sb = jnp.where(first, 2, sb)

    def resolve(e_src, e_cst, l_src, l_cst):
        """Resolve a later selector through the earlier map."""
        src = jnp.where(l_src == 2, 2,
                        jnp.where(l_src == 0, e_src[0], e_src[1]))
        cst = jnp.where(l_src == 2, l_cst,
                        jnp.where(l_src == 0, e_cst[0], e_cst[1]))
        return src, cst

    def combine(a, b):
        asa, aca, asb, acb, sta = a
        bsa, bca, bsb, bcb, stb = b
        osa, oca = resolve((asa, asb), (aca, acb), bsa, bca)
        osb, ocb = resolve((asa, asb), (aca, acb), bsb, bcb)
        osa = jnp.where(stb, bsa, osa)
        oca = jnp.where(stb, bca, oca)
        osb = jnp.where(stb, bsb, osb)
        ocb = jnp.where(stb, bcb, ocb)
        return osa, oca, osb, ocb, sta | stb

    # identity map: out_a = in_a (src 0), out_b = in_b (src 1)
    isa, ica, isb, icb, _ = monoid_scan(
        combine, (sa, ca, sb, cb, first), (0, 0, 1, 0, False), axis)
    # state after prefix applied to zero-init: const if resolved, else 0
    a_inc = jnp.where(isa == 2, ica, 0)
    b_inc = jnp.where(isb == 2, icb, 0)
    a_before = jnp.where(first, 0, shift_right(a_inc, 0, axis))
    b_before = jnp.where(first, 0, shift_right(b_inc, 0, axis))
    return a_before, b_before


def seg_selq_before(first, kind, depth, cval, K: int,
                    axis: int = 0):
    """Sorted-domain K-slot prediction-queue state BEFORE each position
    from flag-driven ops (lion decode; reference lion.rs:50-57,126-186):

      kind == OP_INS:  shift-insert the constant `cval` at slot 0
                       (q <- [c, q0, .., q_{K-2}]; no dedup)
      kind == OP_SWAP: promote slot `depth` to the front
                       (q <- [q_d, q0, .., q_{d-1}, q_{d+1}, ..])
      kind == OP_ID:   leave the queue (invalid positions)

    Segments reset to the zero-initialized queue at `first`.
    Returns slots_before: (n, K) uint32.
    """
    cval = cval.astype(jnp.uint32)
    slot = jnp.arange(K, dtype=jnp.int32)
    d = depth[..., None]
    # element = selection map per output slot: src in [0..K-1] input
    # slot, or K = const
    src_ins = jnp.where(slot == 0, K, slot - 1)
    src_pro = jnp.where(slot == 0, d,
                        jnp.where(slot <= d, slot - 1, slot))
    src = jnp.where((kind == OP_INS)[..., None], src_ins,
                    jnp.where((kind == OP_SWAP)[..., None], src_pro,
                              jnp.broadcast_to(slot, d.shape[:-1] + (K,))))
    cst = jnp.where((kind == OP_INS)[..., None] & (slot == 0),
                    cval[..., None], 0)
    # segment starts: unresolved selectors become const 0
    cst = jnp.where(first[..., None] & (src != K), 0, cst)
    src = jnp.where(first[..., None], K, src)

    def combine(a, b):
        asrc, acst, sta = a
        bsrc, bcst, stb = b
        # resolve b's selectors through a: (n, K, K) one-hot of b.src
        # over input slots, contracted against a's maps
        oh = (bsrc[..., :, None]
              == jnp.arange(K, dtype=jnp.int32)).astype(jnp.int32)
        osrc = (oh * asrc[..., None, :]).sum(-1)
        ocst = (oh.astype(acst.dtype) * acst[..., None, :]).sum(-1)
        isc = bsrc == K
        osrc = jnp.where(isc, K, osrc)
        ocst = jnp.where(isc, bcst, ocst.astype(bcst.dtype))
        osrc = jnp.where(stb[..., None], bsrc, osrc)
        ocst = jnp.where(stb[..., None], bcst, ocst)
        return osrc, ocst, sta | stb

    # identity map: every output slot selects its own input slot
    isrc, icst, _ = monoid_scan(combine, (src, cst, first),
                                (jnp.arange(K, dtype=jnp.int32), 0, False),
                                axis)
    inc = jnp.where(isrc == K, icst, 0)
    before = jnp.where(first[..., None], 0, shift_right(inc, 0, axis))
    return before


def ctx_fill(h, valid, axis: int = 0):
    """Dense last_hash chain: hash of the latest valid position strictly
    before i, 0 if none (reference: cheetah.rs:148, lion.rs:269).
    Gather-free (keep-right-if-set doubling scan)."""
    x = jnp.where(valid, h.astype(jnp.int32), -1)

    def combine(a, b):
        return (jnp.where(b[0] < 0, a[0], b[0]),)

    (filled,) = monoid_scan(combine, (x,), (-1,), axis)
    prev = shift_right(filled, jnp.int32(-1), axis)
    return jnp.where(prev < 0, 0, prev).astype(jnp.uint32)


def prev_valid_value_in_group(group: jax.Array, values: jax.Array,
                              valid: jax.Array, fill: int = 0):
    """For each position i: the value of the latest position j < i with
    group[j] == group[i] and valid[j], else `fill`.

    This is exactly "what does dict[group[i]] hold when position i is
    processed" for a write-on-every-valid-visit dictionary (chameleon's
    chunk_map, reference chameleon.rs:90-95; cheetah's prediction_map
    keyed by previous-quad hash, reference cheetah.rs:125,144).

    Returns (prev_value, has_prev) in original order.
    """
    n = group.shape[0]
    order, inv = sort_by_group(group)
    g_s = group[order]
    v_s = values[order]
    valid_s = valid[order]

    idx = jnp.arange(n, dtype=jnp.int32)
    # last valid sorted-position <= t
    lv_incl = jax.lax.cummax(jnp.where(valid_s, idx, -1))
    # exclusive: last valid strictly before t
    lv = jnp.where(idx > 0, jnp.roll(lv_incl, 1), -1)
    lv = lv.at[0].set(-1)

    same_group = jnp.where(lv >= 0, g_s[jnp.maximum(lv, 0)] == g_s, False)
    has_prev_s = (lv >= 0) & same_group
    prev_val_s = jnp.where(has_prev_s, v_s[jnp.maximum(lv, 0)],
                           jnp.asarray(fill, values.dtype))
    return prev_val_s[inv], has_prev_s[inv]


def mru2_state_in_group(group: jax.Array, values: jax.Array,
                        valid: jax.Array):
    """MRU-2 (move-to-front, depth 2) dictionary state observed at each
    position, over valid positions grouped by `group`.

    Models the dual chunk_a/chunk_b dictionaries of cheetah and lion
    (reference: cheetah.rs:131-139, lion.rs:226-231): front == chunk_a,
    second == chunk_b at the moment position i is processed. Zero-filled
    when absent (dictionaries are zero-initialized).

    Closed form (no scan): front_i = previous valid value in group;
    second_i = the valid value immediately before the *run* of equal
    front values, i.e. the most recent valid value != front_i.

    Returns (front, second) in original order, zeros where absent.
    """
    n = group.shape[0]
    order, inv = sort_by_group(group)
    g_s = group[order]
    v_s = values[order]
    valid_s = valid[order]
    idx = jnp.arange(n, dtype=jnp.int32)

    lv_incl = jax.lax.cummax(jnp.where(valid_s, idx, -1))
    lv = jnp.where(idx > 0, jnp.roll(lv_incl, 1), -1)
    lv = lv.at[0].set(-1)
    lv_c = jnp.maximum(lv, 0)
    has_prev_s = (lv >= 0) & (g_s[lv_c] == g_s)
    front_s = jnp.where(has_prev_s, v_s[lv_c], 0)

    # Run structure over valid positions: a valid position starts a run
    # if it has no valid predecessor in its group or its value differs
    # from that predecessor's.
    # prev-valid value *for valid positions*: v_s[lv] guarded
    pv_s = jnp.where(has_prev_s, v_s[lv_c], 0)
    run_start = valid_s & (~has_prev_s | (v_s != pv_s))
    # value before the run = pv at the run-start position (0 if absent)
    run_start_idx = jax.lax.cummax(jnp.where(run_start, idx, -1))
    rs_c = jnp.maximum(run_start_idx, 0)
    before_run_s = jnp.where(run_start_idx >= 0, pv_s[rs_c], 0)
    # `second` observed at position t = value before the run containing
    # the previous valid position (= before_run at lv[t], since lv[t] is
    # in the same run context). Guard group boundary.
    second_s = jnp.where(has_prev_s, before_run_s[lv_c], 0)

    return front_s[inv].astype(values.dtype), second_s[inv].astype(values.dtype)


def last_valid_value_fill(group: jax.Array, values: jax.Array,
                          writer: jax.Array, reader_fill: int = 0):
    """For each position i: value of the latest position j <= i with
    group[j] == group[i] and writer[j] -- *inclusive* forward fill.

    Used by chameleon decode: a MAP token resolves to the nearest
    preceding PLAIN token with the same hash (reference:
    chameleon.rs:56-68). Note inclusivity is irrelevant for readers
    (a reader is never a writer at the same position for decode use).
    """
    n = group.shape[0]
    order, inv = sort_by_group(group)
    g_s = group[order]
    v_s = values[order]
    w_s = writer[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    lw = jax.lax.cummax(jnp.where(w_s, idx, -1))
    lw_c = jnp.maximum(lw, 0)
    ok = (lw >= 0) & (g_s[lw_c] == g_s)
    out_s = jnp.where(ok, v_s[lw_c], jnp.asarray(reader_fill, values.dtype))
    return out_s[inv]
