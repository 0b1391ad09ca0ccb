"""Cheetah codec -- TPU-native encode (fully parallel) and decode.

Wire format (reference: cheetah.rs:42-203): 128-byte blocks, 32
quads/block, 2-bit flags in a 64-bit LSB-first signature, dual
MRU-swapped dictionary (chunk_a/chunk_b) plus one prediction slot
keyed by the *previous* quad's hash.

TPU-native reformulation of the encoder (NOT a port):

  * Prediction. prediction_map[H] is rewritten at EVERY quad whose
    context (= hash of the previous encoded quad) is H -- a predicted
    hit leaves the identical value (reference: cheetah.rs:125-148). So
    at position i, prediction_map[ctx_i] == quad of the latest
    preceding position with the same context. Hence

        predicted_i <=> quad_{prev_ctx(i)} == quad_i

    -- the same sort-adjacency reformulation as chameleon's
    dictionary, over *context-hash groups* instead of hash groups.

  * Dictionary. chunk_a/chunk_b form a 2-deep move-to-front list per
    hash, updated only at NON-predicted quads. Closed form within a
    hash group (over non-predicted quads):
        chunk_a = previous value;
        chunk_b = value immediately before the run of equal previous
                  values (= most recent value != chunk_a);
    so mapA/mapB/plain are two gathers after one stable sort
    (density_tpu.engine.grouping.mru2_state_in_group).

  The decoder's chain (a predicted token's value and hence the next
  context depends on resolving the previous token) is inherently
  sequential per stream; it runs as a lax.scan with the dictionary
  tables as carry, vectorized across streams by the container layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from density_tpu.constants import CHEETAH as SPEC
from density_tpu.engine.grouping import (
    hash_quads, prev_valid_value_in_group, mru2_state_in_group,
    sort_with, unsort_with, shift_right, seg_mtf2_before,
    seg_mtf2_before_packed,
    seg_sel2_before, seg_last_active_before, ctx_fill,
    OP_ID, OP_SWAP, OP_INS)
from density_tpu.engine import layout
from density_tpu.engine.layout import TokenPlan

Q = SPEC.quads_per_block  # 32
SIG_WORDS = SPEC.sig_words  # 4
BLOCK = SPEC.block_size  # 128

FLAG_PLAIN, FLAG_MAP_A, FLAG_MAP_B, FLAG_PRED = 0, 1, 2, 3


def _contexts(hashes, valid):
    """ctx_i = hash of the latest valid quad before i (0 if none) --
    the `last_hash` chain (reference: cheetah.rs:148), which skips
    copy-block quads because encode_quad is never called for them."""
    n = hashes.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    lv_incl = jax.lax.cummax(jnp.where(valid, idx, -1))
    lv = jnp.where(idx > 0, jnp.roll(lv_incl, 1), -1)
    lv = lv.at[0].set(-1)
    return jnp.where(lv >= 0, hashes[jnp.maximum(lv, 0)], 0).astype(jnp.uint32)


def classify(quads, hashes, real, copy_blocks):
    n_q = quads.shape[0]
    block_of = jnp.arange(n_q, dtype=jnp.int32) // Q
    valid = real & ~copy_blocks[block_of]

    ctx = _contexts(hashes, valid)
    pred_val, _ = prev_valid_value_in_group(ctx, quads, valid, fill=0)
    predicted = valid & (quads == pred_val)

    dict_valid = valid & ~predicted
    front, second = mru2_state_in_group(hashes, quads, dict_valid)
    map_a = dict_valid & (quads == front)
    map_b = dict_valid & ~map_a & (quads == second)
    plain = dict_valid & ~map_a & ~map_b

    flags = jnp.where(predicted, FLAG_PRED,
                      jnp.where(map_a, FLAG_MAP_A,
                                jnp.where(map_b, FLAG_MAP_B, FLAG_PLAIN)))
    payload_words = jnp.where(valid,
                              jnp.where(predicted, 0,
                                        jnp.where(plain, 2, 1)), 0)
    w0 = jnp.where(plain, quads & 0xFFFF, hashes).astype(jnp.uint32)
    w1 = (quads >> 16).astype(jnp.uint32)
    return TokenPlan(flags.astype(jnp.int32), payload_words, w0, w1, valid)


def classify_fast(quads, hashes, real):
    """Copy-free hot path: dense context chain (ctx_i = h_{i-1}), two
    multi-operand sorts (context groups, hash groups), dense adjacent
    compares and a gather-free segmented MTF-2 scan. Padding quads sit
    at the end of their groups (largest indices, stable sort), so no
    masking is needed for predecessors."""
    n_q = quads.shape[0]
    idx = jnp.arange(n_q, dtype=jnp.int32)
    ctx = shift_right(hashes, jnp.uint32(0))  # last_hash chain, dense

    # prediction: prev value in context group
    c_s, idx1, q1 = sort_with(ctx, idx, quads)
    same = c_s == shift_right(c_s, jnp.uint32(0xFFFFFFFF))
    pred_s = jnp.where(same, q1 == shift_right(q1, jnp.uint32(0)), q1 == 0)
    predicted = unsort_with(idx1, pred_s) & real

    # dictionary: MTF-2 over non-predicted quads, per hash group
    act = (real & ~predicted).astype(jnp.int32)
    h_s, idx2, q2, act_s = sort_with(hashes, idx, quads, act)
    firstg = h_s != shift_right(h_s, jnp.uint32(0xFFFFFFFF))
    front, second = seg_mtf2_before(firstg, q2, act_s == 1)
    a_s = q2 == front
    b_s = ~a_s & (q2 == second)
    map_a, map_b = unsort_with(idx2, a_s, b_s)
    dict_valid = real & ~predicted
    map_a = dict_valid & map_a
    map_b = dict_valid & map_b
    plain = dict_valid & ~map_a & ~map_b

    flags = jnp.where(predicted, FLAG_PRED,
                      jnp.where(map_a, FLAG_MAP_A,
                                jnp.where(map_b, FLAG_MAP_B, FLAG_PLAIN)))
    payload_words = jnp.where(real,
                              jnp.where(predicted, 0,
                                        jnp.where(plain, 2, 1)), 0)
    w0 = jnp.where(plain, quads & 0xFFFF, hashes).astype(jnp.uint32)
    w1 = (quads >> 16).astype(jnp.uint32)
    return TokenPlan(flags.astype(jnp.int32), payload_words, w0, w1, real)


def sig_pack(flags_2d):
    """2-bit flags, LSB-first -> 4 u16 words per block (8 flags/word)."""
    nb = flags_2d.shape[0]
    f = flags_2d.reshape(nb, SIG_WORDS, 8).astype(jnp.uint32)
    shifts = (2 * jnp.arange(8, dtype=jnp.uint32))
    return (f << shifts).sum(axis=2)


def _pad_prev(x, fill):
    """Previous element along axis 1 (batched shift_right)."""
    return jnp.pad(x[:, :-1], ((0, 0), (1, 0)), constant_values=fill)


def _sig32(quads):
    """32-bit quad fingerprint whose equality EXACTLY matches quad
    equality, safe to carry through the sort network instead of the
    quad: top 16 bits = hash ((quad*M) >> 16), low 16 = the product's
    bits 15..1 plus the quad's top bit.  M/2 is odd, so
    (hash, low-product-bits, top bit) <-> quad is a bijection; and
    quad == 0 <=> sig32 == 0 (matching zero-initialized tables)."""
    from density_tpu.constants import HASH_MULTIPLIER
    prod = quads * jnp.uint32(HASH_MULTIPLIER)
    h = (prod >> 16).astype(jnp.uint32)
    cmp16 = ((prod & 0xFFFF) >> 1) | ((quads >> 31) << 15)
    return ((h << 16) | cmp16).astype(jnp.int32)


def plan_fast_pallas(quads, nbytes, interpret=False):
    """Batched copy-free planner on the Pallas segmented sorter.

    Same reformulation as classify_fast, with the four lax.sorts
    replaced by bigsort networks (lax.sort at 2^18 elements dominated
    both cheetah's 0.12 GB/s device encode AND its multi-minute XLA
    compiles -- VERDICT r3 item 3). Sort payloads are minimized the
    chameleon way: the quad travels as the 32-bit equality fingerprint
    _sig32, flag bits ride packed under the unique index."""
    sortmod = _sort_mod()
    S, n_q = quads.shape
    quads = quads.astype(jnp.uint32)
    h = hash_quads(quads).astype(jnp.int32)
    lidx = jnp.broadcast_to(
        jnp.arange(n_q, dtype=jnp.int32)[None, :], (S, n_q))
    sig = _sig32(quads)
    real = lidx < (nbytes[:, None] // 4)

    # --- prediction: prev value in context group ---------------------
    # dense last_hash chain (copy-free): ctx_i = h_{i-1}, 0 at start
    ctx = _pad_prev(h, 0)
    if n_q <= (1 << 16):
        # (ctx | index) packs into one u32 key (sign-bias trick, see
        # chameleon.plan_fast_pallas): 1-key 2-array network instead
        # of 2-key 3-array -- the sort is VMEM-traffic-bound, so one
        # fewer carried array is a straight 1/3 cut on this stage
        bias = jnp.int32(-2**31)
        kk = (((ctx.astype(jnp.uint32) << 16)
               | lidx.astype(jnp.uint32)).astype(jnp.int32) ^ bias)
        kk_s, v_s = sortmod.sort(kk, sig, n_keys=1, interpret=interpret)
        ku = (kk_s ^ bias).astype(jnp.uint32)
        c_s = (ku >> 16).astype(jnp.int32)
        i_s = (ku & 0xFFFF).astype(jnp.int32)
    else:
        c_s, i_s, v_s = sortmod.sort(ctx, lidx, sig, n_keys=2,
                                     interpret=interpret)
    same = c_s == _pad_prev(c_s, -1)
    pred_s = (jnp.where(same, v_s == _pad_prev(v_s, 0), v_s == 0)
              & (i_s < (nbytes[:, None] // 4)))

    # --- dictionary: MTF-2 over non-predicted, per hash group --------
    # sorted DIRECTLY from the ctx domain (a sort ignores input order,
    # so the prediction unsort is fused away): the element's own hash
    # is the fingerprint's top half, act/pred bits ride under the
    # index in key2.
    h_ctx = (v_s.astype(jnp.uint32) >> 16).astype(jnp.int32)
    real_ctx = i_s < (nbytes[:, None] // 4)
    act_ctx = real_ctx & ~pred_s
    if n_q <= (1 << 16):
        # (hash | index) as one packed key -- and because the dict
        # group IS the element's own hash (sig32's top half), value
        # equality within a group reduces to the 16-bit fingerprint:
        # the whole MTF payload (fingerprint + act/pred bits) rides
        # ONE 19-bit array. The h != 0 offset keeps the zero-init
        # convention exact: state 0 matches only quad 0 (sig32 == 0),
        # never a nonzero quad whose fingerprint happens to be 0.
        bias = jnp.int32(-2**31)
        kk = (((h_ctx.astype(jnp.uint32) << 16)
               | i_s.astype(jnp.uint32)).astype(jnp.int32) ^ bias)
        vp = ((v_s & 0xFFFF)
              | jnp.where(h_ctx != 0, jnp.int32(1 << 16), 0))
        payload = ((vp << 2) | (act_ctx.astype(jnp.int32) << 1)
                   | pred_s.astype(jnp.int32))
        kk_s, p_s = sortmod.sort(kk, payload, n_keys=1,
                                 interpret=interpret)
        ku2 = (kk_s ^ bias).astype(jnp.uint32)
        h_s = (ku2 >> 16).astype(jnp.int32)
        k2_s = (((ku2 & 0xFFFF).astype(jnp.int32) << 2) | (p_s & 3))
        v2_u = (p_s >> 2).astype(jnp.uint32)
        act_s = ((k2_s >> 1) & 1) == 1
        firstg = h_s != _pad_prev(h_s, -1)
        # 17-bit values: the MTF-2 scan state packs into 2 operands
        front, second = seg_mtf2_before_packed(firstg, v2_u, act_s,
                                               axis=1)
    else:
        k2 = ((i_s << 2) | (act_ctx.astype(jnp.int32) << 1)
              | pred_s.astype(jnp.int32))
        h_s, k2_s, v2_s = sortmod.sort(h_ctx, k2, v_s, n_keys=2,
                                       interpret=interpret)
        v2_u = v2_s.astype(jnp.uint32)
        act_s = ((k2_s >> 1) & 1) == 1
        firstg = h_s != _pad_prev(h_s, -1)
        front, second = seg_mtf2_before(firstg, v2_u, act_s, axis=1)
    a_s = v2_u == front
    b_s = ~a_s & (v2_u == second)
    packed2 = (((k2_s >> 2) << 3) | ((k2_s & 1) << 2)
               | (a_s.astype(jnp.int32) << 1) | b_s.astype(jnp.int32))
    (up2,) = sortmod.sort(packed2, n_keys=1, interpret=interpret)
    predicted = (((up2 >> 2) & 1) == 1) & real
    dict_valid = real & ~predicted
    map_a = dict_valid & (((up2 >> 1) & 1) == 1)
    map_b = dict_valid & ((up2 & 1) == 1)
    plain = dict_valid & ~map_a & ~map_b

    flags = jnp.where(predicted, FLAG_PRED,
                      jnp.where(map_a, FLAG_MAP_A,
                                jnp.where(map_b, FLAG_MAP_B, FLAG_PLAIN)))
    pw = jnp.where(real,
                   jnp.where(predicted, 0, jnp.where(plain, 2, 1)), 0)
    hu = h.astype(jnp.uint32)
    w0 = jnp.where(plain, quads & 0xFFFF, hu).astype(jnp.uint32)
    w1 = (quads >> 16).astype(jnp.uint32)
    # per-block incompressibility bits (reference: codec.rs:68)
    nb = n_q // Q
    pbw = pw.reshape(S, nb, Q).sum(axis=2)
    bidx = jnp.arange(nb, dtype=jnp.int32)[None, :]
    ragged = (nbytes % 4)[:, None]
    nbr = ((nbytes + BLOCK - 1) // BLOCK)[:, None]
    enc_bytes = (2 * SIG_WORDS + 2 * pbw
                 + jnp.where(bidx == nbr - 1, ragged, 0))
    bits = enc_bytes >= BLOCK
    return flags.astype(jnp.int32), pw, w0, w1, real, bits


def _sort_mod():
    import os
    from density_tpu.kernels import bigsort, bitonic
    return (bitonic if os.environ.get("DENSITY_TPU_SORT") == "bitonic"
            else bigsort)


PIPELINE = layout.build_pipeline(Q=Q, SIG_WORDS=SIG_WORDS, BLOCK=BLOCK,
                                 classify=classify, sig_pack=sig_pack,
                                 classify_fast=classify_fast,
                                 flag_bits=SPEC.flag_bits,
                                 plan_fast_pallas=plan_fast_pallas)


def encode(data: bytes | np.ndarray) -> bytes:
    return layout.encode_oneshot(PIPELINE, "cheetah", data)


# ---------------------------------------------------------------------------
# Decode: token extraction is parallel; value resolution is a scan with
# the dictionary tables as carry (the per-quad chain is inherent: the
# context of token i+1 is the hash of token i's resolved value).
# ---------------------------------------------------------------------------

@jax.jit
def _extract_tokens(words, in_word_off, is_copy, n_blocks_real, out_len):
    """Parallel part of decode: per-quad (flag, w0, w1, valid)."""
    nb = in_word_off.shape[0]
    n_q = nb * Q
    cap = words.shape[0]
    bidx = jnp.arange(nb, dtype=jnp.int32)
    is_real_block = bidx < n_blocks_real

    sig_idx = in_word_off[:, None] + jnp.arange(SIG_WORDS)[None, :]
    sig_w = words[jnp.clip(sig_idx, 0, cap - 1)]
    qq = jnp.arange(Q)
    wsel = sig_w[:, qq // 8]
    flags = (wsel >> (2 * (qq % 8)).astype(jnp.uint32)[None, :]) & 3
    flags = flags.reshape(-1).astype(jnp.int32)

    full_quads = out_len // 4
    kidx = jnp.arange(n_q, dtype=jnp.int32)
    block_of = kidx // Q
    real = kidx < full_quads
    valid = real & ~is_copy[block_of] & is_real_block[block_of]
    flags = jnp.where(valid, flags, FLAG_PRED)  # no-payload for invalid

    payload_words = jnp.where(valid,
                              jnp.where(flags == FLAG_PLAIN, 2,
                                        jnp.where(flags == FLAG_PRED, 0, 1)),
                              0)
    pw = payload_words.reshape(nb, Q)
    intra = jnp.cumsum(pw, axis=1) - pw
    pos = (in_word_off[:, None] + SIG_WORDS + intra).reshape(-1)
    w0 = words[jnp.clip(pos, 0, cap - 1)]
    w1 = words[jnp.clip(pos + 1, 0, cap - 1)]
    return flags, w0, w1, valid


@functools.partial(jax.jit, static_argnames=("max_rounds",))
def _resolve_parallel(flags, w0, w1, valid, max_rounds=12):
    """Parallel value resolution (no per-quad scan).

    Two exact facts make this possible (reference: cheetah.rs:68-103):

      1. The dictionary chain never involves predicted tokens, and
         every non-predicted token's hash group is known from the wire
         (plain: hash of its payload quad; mapA/mapB: the payload
         hash). The per-group state evolution is flag-driven -- plain
         inserts a known constant, mapA reads, mapB swaps -- a closed
         selection monoid, so ALL plain/mapA/mapB values resolve in
         ONE segmented associative scan. No speculation.

      2. A predicted token's value is the value of the latest token in
         its context group before it, which telescopes to the latest
         NON-predicted value in the group (predicted tokens copy it
         forward). Given correct context assignments (ctx_i = hash of
         quad_{i-1}), all predicted values resolve in one more pass.
         Contexts are only unknown after predicted tokens, so the pass
         iterates: any fixpoint is the unique correct solution (strong
         induction: the first wrong position is forced correct by its
         own equation, which reads only earlier positions).

    Returns (quads, converged). Non-converged streams (adversarial
    chains deeper than max_rounds) fall back to the sequential scan.
    """
    n_q = flags.shape[0]
    idx = jnp.arange(n_q, dtype=jnp.int32)
    plain_quad = (w0 | (w1 << 16)).astype(jnp.uint32)
    is_pred = (flags == FLAG_PRED) & valid
    nonpred = valid & ~is_pred
    is_plain = (flags == FLAG_PLAIN) & valid

    # --- dictionary chain: exact, one pass ---------------------------
    h_dict = jnp.where(is_plain, hash_quads(plain_quad).astype(jnp.int32),
                       w0.astype(jnp.int32))
    key = jnp.where(nonpred, h_dict, jnp.int32(1 << 16))
    op = jnp.where(is_plain, OP_INS,
                   jnp.where((flags == FLAG_MAP_B) & valid, OP_SWAP,
                             OP_ID))
    op = jnp.where(nonpred, op, OP_ID)
    k_s, idx_s, op_s, cv_s, fl_s = sort_with(
        key, idx, op, plain_quad.astype(jnp.int32), flags)
    first = k_s != shift_right(k_s, jnp.int32(-1))
    a_b, b_b = seg_sel2_before(first, op_s, cv_s.astype(jnp.uint32))
    val_s = jnp.where(fl_s == FLAG_MAP_A, a_b,
                      jnp.where(fl_s == FLAG_MAP_B, b_b,
                                cv_s.astype(jnp.uint32)))
    dict_vals = unsort_with(idx_s, val_s)
    quads0 = jnp.where(nonpred, dict_vals, 0).astype(jnp.uint32)

    # --- context fixpoint for predicted tokens -----------------------
    np_i = nonpred.astype(jnp.int32)

    def body(carry):
        quads, _, it = carry
        ctx = ctx_fill(hash_quads(quads), valid)
        ckey = jnp.where(valid, ctx.astype(jnp.int32), jnp.int32(1 << 16))
        ck_s, cidx_s, q_s, np_s = sort_with(
            ckey, idx, quads.astype(jnp.int32), np_i)
        cfirst = ck_s != shift_right(ck_s, jnp.int32(-1))
        fill, _ = seg_last_active_before(cfirst, q_s, np_s == 1)
        pred_new = unsort_with(cidx_s, fill).astype(jnp.uint32)
        new_quads = jnp.where(is_pred, pred_new, quads)
        changed = jnp.any((new_quads != quads) & is_pred)
        return new_quads, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_rounds)

    quads, changed, _ = jax.lax.while_loop(
        cond, body, (quads0, jnp.bool_(True), jnp.int32(0)))
    return quads, ~changed


@functools.partial(jax.jit, static_argnames=("max_rounds", "interpret"))
def _resolve_parallel_batched(flags, w0, w1, valid, max_rounds=12,
                              interpret=False):
    """Batched (S, N) resolve on the Pallas segmented sorter -- the
    same two exact facts as _resolve_parallel, with every lax.sort
    replaced by a bigsort network (lax.sort at 2^18 inside the
    fixpoint body was a multi-minute TPU compile and ~3x the runtime).
    N must be a power of two >= 256 (the dispatcher falls back to the
    vmapped lax.sort path otherwise)."""
    S, n_q = flags.shape
    lidx = jnp.broadcast_to(
        jnp.arange(n_q, dtype=jnp.int32)[None, :], (S, n_q))
    sortmod = _sort_mod()
    plain_quad = (w0 | (w1 << 16)).astype(jnp.uint32)
    is_pred = (flags == FLAG_PRED) & valid
    nonpred = valid & ~is_pred
    is_plain = (flags == FLAG_PLAIN) & valid

    # --- dictionary chain: exact, one pass ---------------------------
    h_dict = jnp.where(is_plain, hash_quads(plain_quad).astype(jnp.int32),
                       w0.astype(jnp.int32))
    key = jnp.where(nonpred, h_dict, jnp.int32(1 << 16))
    op = jnp.where(is_plain, OP_INS,
                   jnp.where((flags == FLAG_MAP_B) & valid, OP_SWAP,
                             OP_ID))
    op = jnp.where(nonpred, op, OP_ID)
    k2 = (lidx << 4) | (op << 2) | (flags & 3)
    k_s, k2_s, cv_s = sortmod.sort(key, k2,
                                   plain_quad.astype(jnp.int32), n_keys=2,
                                   interpret=interpret)
    first = k_s != _pad_prev(k_s, -1)
    a_b, b_b = seg_sel2_before(first, (k2_s >> 2) & 3,
                               cv_s.astype(jnp.uint32), axis=1)
    fl_s = k2_s & 3
    val_s = jnp.where(fl_s == FLAG_MAP_A, a_b,
                      jnp.where(fl_s == FLAG_MAP_B, b_b,
                                cv_s.astype(jnp.uint32)))
    _, dv = sortmod.sort(k2_s >> 4, val_s.astype(jnp.int32), n_keys=1,
                         interpret=interpret)
    quads0 = jnp.where(nonpred, dv.astype(jnp.uint32), 0)

    # --- context fixpoint for predicted tokens -----------------------
    np_i = nonpred.astype(jnp.int32)

    def body(carry):
        quads, _, it = carry
        ctx = ctx_fill(hash_quads(quads), valid, axis=1)
        ckey = jnp.where(valid, ctx.astype(jnp.int32), jnp.int32(1 << 16))
        ck2 = (lidx << 1) | np_i
        ck_s, ck2_s, q_s = sortmod.sort(ckey, ck2,
                                        quads.astype(jnp.int32), n_keys=2,
                                        interpret=interpret)
        cfirst = ck_s != _pad_prev(ck_s, -1)
        fill, _ = seg_last_active_before(cfirst, q_s, (ck2_s & 1) == 1,
                                         axis=1)
        _, pv = sortmod.sort(ck2_s >> 1, fill.astype(jnp.int32), n_keys=1,
                             interpret=interpret)
        new_quads = jnp.where(is_pred, pv.astype(jnp.uint32), quads)
        changed_s = jnp.any((new_quads != quads) & is_pred, axis=1)
        return new_quads, changed_s, it + 1

    def cond(carry):
        _, changed_s, it = carry
        return jnp.any(changed_s) & (it < max_rounds)

    quads, changed_s, _ = jax.lax.while_loop(
        cond, body, (quads0, jnp.ones(S, bool), jnp.int32(0)))
    # a stream unchanged in the final round is at ITS fixpoint (its
    # update reads only its own positions), hence exactly decoded
    return quads, ~changed_s


@jax.jit
def _assemble(quads, valid, words, in_word_off, is_copy, n_blocks_real,
              out_len):
    nb = in_word_off.shape[0]
    n_q = nb * Q
    cap = words.shape[0]
    bidx = jnp.arange(nb, dtype=jnp.int32)
    is_real_block = bidx < n_blocks_real
    kidx = jnp.arange(n_q, dtype=jnp.int32)

    out_cap = nb * (BLOCK // 2)
    out_words = jnp.zeros(out_cap, dtype=jnp.uint32)
    oidx0 = jnp.where(valid, 2 * kidx, out_cap)
    out_words = out_words.at[oidx0].set(quads & 0xFFFF, mode="drop")
    oidx1 = jnp.where(valid, 2 * kidx + 1, out_cap)
    out_words = out_words.at[oidx1].set(quads >> 16, mode="drop")

    w_per_block = BLOCK // 2
    j = jnp.arange(w_per_block)[None, :]
    blen = jnp.clip(out_len - bidx * BLOCK, 0, BLOCK)
    blen_words = (blen + 1) // 2
    src = in_word_off[:, None] + j
    dst = bidx[:, None] * w_per_block + j
    cmask = (is_copy & is_real_block)[:, None] & (j < blen_words[:, None])
    cidx = jnp.where(cmask, dst, out_cap)
    out_words = out_words.at[cidx.reshape(-1)].set(
        words[jnp.clip(src, 0, cap - 1)].reshape(-1), mode="drop")
    return out_words


def decode(data: bytes, decoded_size_hint: int | None = None) -> bytes:
    if len(data) == 0:
        return b""
    from density_tpu import native
    in_off, out_off, is_copy = native.scan("cheetah", data)
    nb = len(in_off)
    out_len = int(out_off[-1]) + _last_block_out_len(
        data, int(in_off[-1]), bool(is_copy[-1]))

    nb_cap = layout.bucket_bytes(nb * BLOCK, BLOCK) // BLOCK
    cap_bytes = layout.bucket_bytes(len(data) + 2, BLOCK)
    padded = np.zeros(cap_bytes, dtype=np.uint8)
    padded[:len(data)] = np.frombuffer(data, dtype=np.uint8)
    words = padded.view("<u2").astype(np.uint32)

    in_word_off = np.zeros(nb_cap, dtype=np.int32)
    in_word_off[:nb] = in_off // 2
    copy_pad = np.zeros(nb_cap, dtype=bool)
    copy_pad[:nb] = is_copy.astype(bool)

    jw = jnp.asarray(words)
    jo = jnp.asarray(in_word_off)
    jc = jnp.asarray(copy_pad)
    flags, w0, w1, valid = _extract_tokens(jw, jo, jc, jnp.int32(nb),
                                           jnp.int32(out_len))
    quads, ok = _resolve_parallel(flags, w0, w1, valid)
    if not bool(ok):
        # deep prediction chains: the context fixpoint exceeded its
        # round cap -- exact native redecode (~GB/s host)
        return native.decode("cheetah", data, decoded_size_hint=out_len)
    out_words = _assemble(quads, valid, jw, jo, jc, jnp.int32(nb),
                          jnp.int32(out_len))
    out = np.asarray(out_words[: (out_len + 1) // 2]).astype("<u2").tobytes()
    out = bytearray(out[:out_len])
    ragged = out_len % 4
    if ragged and not is_copy[-1]:
        out[-ragged:] = data[-ragged:]
    return bytes(out)


def _last_block_out_len(data: bytes, last_off: int, last_copy: bool) -> int:
    """Decoded length of the final block (host-side token walk)."""
    if last_copy:
        rem = len(data) - last_off
        return rem if rem <= BLOCK else BLOCK
    block = data[last_off:]
    sig = int.from_bytes(block[:8].ljust(8, b"\x00"), "little")
    pos = 8
    out = 0
    for _ in range(Q):
        flag = sig & 3
        sig >>= 2
        if flag == FLAG_PLAIN:
            rem = len(block) - pos
            if rem == 0:
                return out
            if rem <= 3:
                return out + rem
            pos += 4
        elif flag in (FLAG_MAP_A, FLAG_MAP_B):
            pos += 2
        out += 4
    return out
