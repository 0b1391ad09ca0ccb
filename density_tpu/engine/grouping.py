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


def shift_right(x: jax.Array, fill) -> jax.Array:
    """Dense shift by one along axis 0 (the 'previous element' in a
    sorted domain)."""
    pad = jnp.full((1,) + x.shape[1:], fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[:-1]], axis=0)


def sort_by_group(group: jax.Array):
    """Stable argsort by group id. Returns (order, inv_order)."""
    n = group.shape[0]
    order = jnp.argsort(group, stable=True)
    inv = jnp.zeros(n, dtype=jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return order, inv


def seg_last_active_before(first, vals, active):
    """Sorted-domain segmented fill, gather-free: for each position t,
    the value of the latest ACTIVE position strictly before t within
    its segment (segments delimited by `first`), else 0.

    Dense associative scan: state (value, has); combine keeps the
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

    vi, hi, _ = jax.lax.associative_scan(combine, (val0, has0, sticky0))
    # exclusive: shift by one, reset at segment starts
    v = jnp.where(first, 0, shift_right(vi, 0))
    h = jnp.where(first, False, shift_right(hi, False))
    return v, h


def seg_mtf2_before(first, vals, active):
    """Sorted-domain MTF-2 state observed BEFORE each position, over
    active positions, segment-reset at `first`. Gather-free (dense
    associative scan with the MTF monoid, K=2).

    Returns (front, second): the chunk_a/chunk_b pair the reference
    dictionaries would hold when this position is processed, with the
    zero-init convention (missing entries read as 0).
    """
    d0 = jnp.where(active, vals, 0)
    d1 = jnp.zeros_like(vals)
    cnt = active.astype(jnp.int32)
    sticky0 = first

    def combine(a, b):
        a0, a1, ca, sa = a
        b0, b1, cb, sb = b
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
        return o0, o1, co, sa | sb

    i0, i1, ic, _ = jax.lax.associative_scan(
        combine, (d0, d1, cnt, sticky0))
    front = jnp.where(first, 0, shift_right(i0, 0))
    second = jnp.where(first, 0, shift_right(i1, 0))
    return front, second


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
