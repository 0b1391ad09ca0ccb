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


def sort_by_group(group: jax.Array):
    """Stable argsort by group id. Returns (order, inv_order)."""
    n = group.shape[0]
    order = jnp.argsort(group, stable=True)
    inv = jnp.zeros(n, dtype=jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return order, inv


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
