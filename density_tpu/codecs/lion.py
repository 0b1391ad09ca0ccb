"""Lion codec -- TPU-native encode (fully parallel) and decode.

Wire format (reference: lion.rs:59-352): 64-byte blocks, 16
quads/block, 3-bit flags in a 48-bit LSB-first signature (only 6 of 8
signature bytes written, lion.rs:334-351), dual MRU dictionary plus a
5-deep prediction queue keyed by the previous quad's hash.

TPU-native reformulation of the encoder (NOT a port):

  * Prediction queue. The 5-slot queue prediction_map[H] is a
    move-to-front list over the quads arriving in context H (hits
    promote, misses shift-insert; reference lion.rs:50-57, 211-270).
    MTF state composes associatively (see engine/mtf.py), so the
    predicted depth of every quad -- PREDICTED_A..E = depth 0..4 --
    comes from one segmented associative scan over context groups.
    Zero-initialized queues are modelled exactly by the zero-padding
    rule proved in engine/mtf.py.

  * Dictionary. Same MRU-2 closed form as cheetah, over non-predicted
    quads only (predicted quads never touch chunk_map;
    reference lion.rs:216-231).

  Flag priority (semantic, reference lion.rs:211-270):
  next_a > next_b > next_c > next_d > next_e > chunk_a > chunk_b >
  plain -- preserved here because prediction depths are checked first
  and the dictionary classification only applies to prediction misses.

  Decode runs the inherently-serial chain as a lax.scan with the
  tables as carry (see cheetah.py for why), vectorized across streams
  by the container layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from density_tpu.constants import LION as SPEC
from density_tpu.engine.grouping import (
    hash_quads, mru2_state_in_group, sort_with, unsort_with, shift_right,
    seg_mtf2_before, seg_mtf2_before_packed, seg_sel2_before,
    seg_selq_before, ctx_fill,
    OP_ID, OP_SWAP, OP_INS)
from density_tpu.engine.mtf import mtf_depths_in_group, mtf_depths_sorted
from density_tpu.engine import layout
from density_tpu.engine.layout import TokenPlan

Q = SPEC.quads_per_block  # 16
SIG_WORDS = SPEC.sig_words  # 3
BLOCK = SPEC.block_size  # 64

FLAG_PLAIN = 0
FLAG_PRED_A = 1  # .. FLAG_PRED_E = 5
FLAG_MAP_A = 6
FLAG_MAP_B = 7
K = 5


def _contexts(hashes, valid):
    """last_hash chain: hash of latest valid quad before i, 0 if none
    (reference: lion.rs:269, 286)."""
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
    depth = mtf_depths_in_group(ctx, quads, valid, K)  # 0..5 (5 = miss)
    predicted = valid & (depth < K)

    dict_valid = valid & ~predicted
    front, second = mru2_state_in_group(hashes, quads, dict_valid)
    map_a = dict_valid & (quads == front)
    map_b = dict_valid & ~map_a & (quads == second)
    plain = dict_valid & ~map_a & ~map_b

    flags = jnp.where(predicted, depth + 1,
                      jnp.where(map_a, FLAG_MAP_A,
                                jnp.where(map_b, FLAG_MAP_B, FLAG_PLAIN)))
    payload_words = jnp.where(valid,
                              jnp.where(predicted, 0,
                                        jnp.where(plain, 2, 1)), 0)
    w0 = jnp.where(plain, quads & 0xFFFF, hashes).astype(jnp.uint32)
    w1 = (quads >> 16).astype(jnp.uint32)
    return TokenPlan(flags.astype(jnp.int32), payload_words, w0, w1, valid)


def classify_fast(quads, hashes, real):
    """Copy-free hot path: dense context chain, gather-free MTF-5
    (prediction queue) and MTF-2 (dictionary) segmented scans over
    multi-operand-sorted groups."""
    n_q = quads.shape[0]
    idx = jnp.arange(n_q, dtype=jnp.int32)
    ctx = shift_right(hashes, jnp.uint32(0))

    c_s, idx1, q1, real1 = sort_with(ctx, idx, quads,
                                     real.astype(jnp.int32))
    firstc = c_s != shift_right(c_s, jnp.uint32(0xFFFFFFFF))
    depth_s = mtf_depths_sorted(firstc, q1, real1 == 1, K)
    depth = unsort_with(idx1, depth_s)
    predicted = real & (depth < K)

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

    flags = jnp.where(predicted, depth + 1,
                      jnp.where(map_a, FLAG_MAP_A,
                                jnp.where(map_b, FLAG_MAP_B, FLAG_PLAIN)))
    payload_words = jnp.where(real,
                              jnp.where(predicted, 0,
                                        jnp.where(plain, 2, 1)), 0)
    w0 = jnp.where(plain, quads & 0xFFFF, hashes).astype(jnp.uint32)
    w1 = (quads >> 16).astype(jnp.uint32)
    return TokenPlan(flags.astype(jnp.int32), payload_words, w0, w1, real)


def sig_pack(flags_2d):
    """3-bit flags x 16 quads = 48 bits -> 3 u16 words, LSB-first.
    Two-limb u32 arithmetic (bit 30..32 of flag 10 crosses the limb)."""
    f = flags_2d.astype(jnp.uint32)  # (nb, 16)
    limb0 = jnp.zeros(f.shape[0], dtype=jnp.uint32)
    limb1 = jnp.zeros(f.shape[0], dtype=jnp.uint32)
    for q in range(11):  # shifts 0..30; uint32 wrap == masked low part
        limb0 = limb0 | (f[:, q] << (3 * q))
    limb1 = limb1 | (f[:, 10] >> 2)
    for q in range(11, 16):  # shifts 33..45 -> limb1 bits 1..15
        limb1 = limb1 | (f[:, q] << (3 * q - 32))
    w0 = limb0 & 0xFFFF
    w1 = limb0 >> 16
    w2 = limb1 & 0xFFFF
    return jnp.stack([w0, w1, w2], axis=1)


def sig_unpack(sig_w):
    """(nb, 3) u16 words -> (nb, 16) 3-bit flags."""
    limb0 = sig_w[:, 0] | (sig_w[:, 1] << 16)  # bits 0..31
    limb1 = sig_w[:, 2]  # bits 32..47
    flags = []
    for q in range(16):
        s = 3 * q
        if s + 3 <= 32:
            v = (limb0 >> s) & 7
        elif s < 32:  # q == 10: bits 30,31 + limb1 bit 0
            v = ((limb0 >> 30) | (limb1 << 2)) & 7
        else:
            v = (limb1 >> (s - 32)) & 7
        flags.append(v)
    return jnp.stack(flags, axis=1).astype(jnp.int32)


def plan_fast_pallas(quads, nbytes, interpret=False):
    """Batched copy-free planner on the Pallas segmented sorter (see
    cheetah.plan_fast_pallas; lion swaps the single prediction slot for
    MTF-5 depths via the same associative monoid, engine/mtf.py).
    lax.sort at 2^18 elements was both lion's device-encode floor and
    its multi-minute XLA compile (VERDICT r3 item 3)."""
    from density_tpu.codecs.cheetah import _pad_prev, _sig32, _sort_mod
    sortmod = _sort_mod()
    S, n_q = quads.shape
    quads = quads.astype(jnp.uint32)
    h = hash_quads(quads).astype(jnp.int32)
    lidx = jnp.broadcast_to(
        jnp.arange(n_q, dtype=jnp.int32)[None, :], (S, n_q))
    sig = _sig32(quads)
    real = lidx < (nbytes[:, None] // 4)

    # --- prediction queue: MTF-5 depth within context group ----------
    ctx = _pad_prev(h, 0)
    if n_q <= (1 << 16):
        # packed 1-key 2-array network (see cheetah.plan_fast_pallas)
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
    real1 = i_s < (nbytes[:, None] // 4)
    firstc = c_s != _pad_prev(c_s, -1)
    depth_s = mtf_depths_sorted(firstc, v_s.astype(jnp.uint32),
                                real1, K, axis=1)

    # --- dictionary: MTF-2 over non-predicted, per hash group --------
    # sorted DIRECTLY from the ctx domain (the prediction unsort is
    # fused away, see cheetah.plan_fast_pallas); depth rides under the
    # index in key2.
    h_ctx = (v_s.astype(jnp.uint32) >> 16).astype(jnp.int32)
    act_ctx = real1 & (depth_s >= K)
    if n_q <= (1 << 16):
        # packed key + single 21-bit payload (fingerprint with the
        # h != 0 zero-init offset, act bit, MTF-5 depth) -- see
        # cheetah.plan_fast_pallas for the in-group equality argument
        bias = jnp.int32(-2**31)
        kk = (((h_ctx.astype(jnp.uint32) << 16)
               | i_s.astype(jnp.uint32)).astype(jnp.int32) ^ bias)
        vp = ((v_s & 0xFFFF)
              | jnp.where(h_ctx != 0, jnp.int32(1 << 16), 0))
        payload = ((vp << 4) | (act_ctx.astype(jnp.int32) << 3)
                   | depth_s)
        kk_s, p_s = sortmod.sort(kk, payload, n_keys=1,
                                 interpret=interpret)
        ku2 = (kk_s ^ bias).astype(jnp.uint32)
        h_s = (ku2 >> 16).astype(jnp.int32)
        k2_s = (((ku2 & 0xFFFF).astype(jnp.int32) << 4) | (p_s & 15))
        v2_u = (p_s >> 4).astype(jnp.uint32)
        act_s = ((k2_s >> 3) & 1) == 1
        firstg = h_s != _pad_prev(h_s, -1)
        # 17-bit values: the MTF-2 scan state packs into 2 operands
        front, second = seg_mtf2_before_packed(firstg, v2_u, act_s,
                                               axis=1)
    else:
        k2 = (i_s << 4) | (act_ctx.astype(jnp.int32) << 3) | depth_s
        h_s, k2_s, v2_s = sortmod.sort(h_ctx, k2, v_s, n_keys=2,
                                       interpret=interpret)
        v2_u = v2_s.astype(jnp.uint32)
        act_s = ((k2_s >> 3) & 1) == 1
        firstg = h_s != _pad_prev(h_s, -1)
        front, second = seg_mtf2_before(firstg, v2_u, act_s, axis=1)
    a_s = v2_u == front
    b_s = ~a_s & (v2_u == second)
    packed2 = (((k2_s >> 4) << 5) | ((k2_s & 7) << 2)
               | (a_s.astype(jnp.int32) << 1) | b_s.astype(jnp.int32))
    (up2,) = sortmod.sort(packed2, n_keys=1, interpret=interpret)
    depth = (up2 >> 2) & 7
    predicted = real & (depth < K)
    dict_valid = real & ~predicted
    map_a = dict_valid & (((up2 >> 1) & 1) == 1)
    map_b = dict_valid & ((up2 & 1) == 1)
    plain = dict_valid & ~map_a & ~map_b

    flags = jnp.where(predicted, depth + 1,
                      jnp.where(map_a, FLAG_MAP_A,
                                jnp.where(map_b, FLAG_MAP_B, FLAG_PLAIN)))
    pw = jnp.where(real,
                   jnp.where(predicted, 0, jnp.where(plain, 2, 1)), 0)
    hu = h.astype(jnp.uint32)
    w0 = jnp.where(plain, quads & 0xFFFF, hu).astype(jnp.uint32)
    w1 = (quads >> 16).astype(jnp.uint32)
    nb = n_q // Q
    pbw = pw.reshape(S, nb, Q).sum(axis=2)
    bidx = jnp.arange(nb, dtype=jnp.int32)[None, :]
    ragged = (nbytes % 4)[:, None]
    nbr = ((nbytes + BLOCK - 1) // BLOCK)[:, None]
    enc_bytes = (2 * SIG_WORDS + 2 * pbw
                 + jnp.where(bidx == nbr - 1, ragged, 0))
    bits = enc_bytes >= BLOCK
    return flags.astype(jnp.int32), pw, w0, w1, real, bits


PIPELINE = layout.build_pipeline(Q=Q, SIG_WORDS=SIG_WORDS, BLOCK=BLOCK,
                                 classify=classify, sig_pack=sig_pack,
                                 classify_fast=classify_fast,
                                 flag_bits=SPEC.flag_bits,
                                 plan_fast_pallas=plan_fast_pallas)


def encode(data: bytes | np.ndarray) -> bytes:
    return layout.encode_oneshot(PIPELINE, "lion", data)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

@jax.jit
def _extract_tokens(words, in_word_off, is_copy, n_blocks_real, out_len):
    nb = in_word_off.shape[0]
    n_q = nb * Q
    cap = words.shape[0]
    bidx = jnp.arange(nb, dtype=jnp.int32)
    is_real_block = bidx < n_blocks_real

    sig_idx = in_word_off[:, None] + jnp.arange(SIG_WORDS)[None, :]
    sig_w = words[jnp.clip(sig_idx, 0, cap - 1)]
    flags = sig_unpack(sig_w).reshape(-1)

    full_quads = out_len // 4
    kidx = jnp.arange(n_q, dtype=jnp.int32)
    block_of = kidx // Q
    real = kidx < full_quads
    valid = real & ~is_copy[block_of] & is_real_block[block_of]
    flags = jnp.where(valid, flags, FLAG_PRED_A)  # no-payload for invalid

    payload_words = jnp.where(valid,
                              jnp.where(flags == FLAG_PLAIN, 2,
                                        jnp.where(flags >= FLAG_MAP_A, 1, 0)),
                              0)
    pw = payload_words.reshape(nb, Q)
    intra = jnp.cumsum(pw, axis=1) - pw
    pos = (in_word_off[:, None] + SIG_WORDS + intra).reshape(-1)
    w0 = words[jnp.clip(pos, 0, cap - 1)]
    w1 = words[jnp.clip(pos + 1, 0, cap - 1)]
    return flags, w0, w1, valid


@functools.partial(jax.jit, static_argnames=("max_rounds",))
def _resolve_parallel(flags, w0, w1, valid, max_rounds=12):
    """Parallel value resolution (see cheetah._resolve_parallel for the
    two exact facts; reference: lion.rs:88-186).

    Lion differences: the per-context state is the 5-deep prediction
    queue instead of a single slot -- but its decode-side ops are
    flag-driven selections too (non-predicted: shift-insert a KNOWN
    value; predicted at depth d: promote slot d, reading it), so given
    context assignments every predicted value still resolves in one
    segmented associative scan of the 5-slot selection monoid
    (grouping.seg_selq_before). The context fixpoint is identical.

    Returns (quads, converged).
    """
    n_q = flags.shape[0]
    idx = jnp.arange(n_q, dtype=jnp.int32)
    plain_quad = (w0 | (w1 << 16)).astype(jnp.uint32)
    is_pred = (flags >= FLAG_PRED_A) & (flags <= K) & valid
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

    # --- context fixpoint over the 5-slot queues ---------------------
    kind = jnp.where(nonpred, OP_INS, jnp.where(is_pred, OP_SWAP, OP_ID))
    depth = jnp.clip(flags - 1, 0, K - 1)
    slot = jnp.arange(K, dtype=jnp.int32)[None, :]

    def body(carry):
        quads, _, it = carry
        ctx = ctx_fill(hash_quads(quads), valid)
        ckey = jnp.where(valid, ctx.astype(jnp.int32), jnp.int32(1 << 16))
        ck_s, cidx_s, q_s, kind_s, d_s = sort_with(
            ckey, idx, quads.astype(jnp.int32), kind, depth)
        cfirst = ck_s != shift_right(ck_s, jnp.int32(-1))
        before = seg_selq_before(cfirst, kind_s,
                                 jnp.where(kind_s == OP_INS, 0, d_s),
                                 q_s.astype(jnp.uint32), K)
        read_s = (before * (slot == d_s[:, None])).sum(axis=1)
        pred_new = unsort_with(cidx_s, read_s).astype(jnp.uint32)
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
    """Batched (S, N) resolve on the Pallas segmented sorter (see
    cheetah._resolve_parallel_batched; lion swaps the 2-slot selection
    monoid for the K-slot queue, grouping.seg_selq_before). N must be
    a power of two >= 256."""
    from density_tpu.codecs.cheetah import _pad_prev, _sort_mod
    S, n_q = flags.shape
    lidx = jnp.broadcast_to(
        jnp.arange(n_q, dtype=jnp.int32)[None, :], (S, n_q))
    sortmod = _sort_mod()
    plain_quad = (w0 | (w1 << 16)).astype(jnp.uint32)
    is_pred = (flags >= FLAG_PRED_A) & (flags <= K) & valid
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
    k2 = (lidx << 5) | (op << 3) | flags
    k_s, k2_s, cv_s = sortmod.sort(key, k2,
                                   plain_quad.astype(jnp.int32), n_keys=2,
                                   interpret=interpret)
    first = k_s != _pad_prev(k_s, -1)
    a_b, b_b = seg_sel2_before(first, (k2_s >> 3) & 3,
                               cv_s.astype(jnp.uint32), axis=1)
    fl_s = k2_s & 7
    val_s = jnp.where(fl_s == FLAG_MAP_A, a_b,
                      jnp.where(fl_s == FLAG_MAP_B, b_b,
                                cv_s.astype(jnp.uint32)))
    _, dv = sortmod.sort(k2_s >> 5, val_s.astype(jnp.int32), n_keys=1,
                         interpret=interpret)
    quads0 = jnp.where(nonpred, dv.astype(jnp.uint32), 0)

    # --- context fixpoint over the K-slot queues ---------------------
    kind = jnp.where(nonpred, OP_INS, jnp.where(is_pred, OP_SWAP, OP_ID))
    depth = jnp.clip(flags - 1, 0, K - 1)
    slot = jnp.arange(K, dtype=jnp.int32)

    def body(carry):
        quads, _, it = carry
        ctx = ctx_fill(hash_quads(quads), valid, axis=1)
        ckey = jnp.where(valid, ctx.astype(jnp.int32), jnp.int32(1 << 16))
        ck2 = (lidx << 5) | (kind << 3) | depth
        ck_s, ck2_s, q_s = sortmod.sort(ckey, ck2,
                                        quads.astype(jnp.int32), n_keys=2,
                                        interpret=interpret)
        cfirst = ck_s != _pad_prev(ck_s, -1)
        kind_s = (ck2_s >> 3) & 3
        d_s = ck2_s & 7
        before = seg_selq_before(cfirst, kind_s,
                                 jnp.where(kind_s == OP_INS, 0, d_s),
                                 q_s.astype(jnp.uint32), K, axis=1)
        read_s = (before * (slot == d_s[..., None])).sum(axis=-1)
        _, pv = sortmod.sort(ck2_s >> 5, read_s.astype(jnp.int32),
                             n_keys=1, interpret=interpret)
        new_quads = jnp.where(is_pred, pv.astype(jnp.uint32), quads)
        changed_s = jnp.any((new_quads != quads) & is_pred, axis=1)
        return new_quads, changed_s, it + 1

    def cond(carry):
        _, changed_s, it = carry
        return jnp.any(changed_s) & (it < max_rounds)

    quads, changed_s, _ = jax.lax.while_loop(
        cond, body, (quads0, jnp.ones(S, bool), jnp.int32(0)))
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
    in_off, out_off, is_copy = native.scan("lion", data)
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
        return native.decode("lion", data, decoded_size_hint=out_len)
    out_words = _assemble(quads, valid, jw, jo, jc, jnp.int32(nb),
                          jnp.int32(out_len))
    out = np.asarray(out_words[: (out_len + 1) // 2]).astype("<u2").tobytes()
    out = bytearray(out[:out_len])
    ragged = out_len % 4
    if ragged and not is_copy[-1]:
        out[-ragged:] = data[-ragged:]
    return bytes(out)


def _last_block_out_len(data: bytes, last_off: int, last_copy: bool) -> int:
    if last_copy:
        rem = len(data) - last_off
        return rem if rem <= BLOCK else BLOCK
    block = data[last_off:]
    sig = int.from_bytes(block[:6].ljust(6, b"\x00"), "little")
    pos = 6
    out = 0
    for _ in range(Q):
        flag = sig & 7
        sig >>= 3
        if flag == FLAG_PLAIN:
            rem = len(block) - pos
            if rem == 0:
                return out
            if rem <= 3:
                return out + rem
            pos += 4
        elif flag >= FLAG_MAP_A:
            pos += 2
        out += 4
    return out
