"""Decode-side layout engine: batched token extraction + chameleon map
resolution on the segmented Pallas sorter.

This is the decode mirror of engine/layout.py, rebuilt for throughput.
The round-2 decode path resolved map tokens with multi-operand
`lax.sort` plus ~2 random XLA gathers per quad (~15 ns/element on
v5e) -- ~150 ms for 10 MB.  This module replaces both costs:

  * map resolution runs on kernels/bigsort.py (the same segmented
    bitonic network the encode planner uses), with the minimal operand
    set: two i32 sort keys carry (hash, index, is_plain) and one
    carries the plain payload;
  * token extraction is pluggable: the XLA gather fallback lives here,
    the Pallas unpack kernel (kernels/unpack.py) replaces it on TPU.

Reference semantics (chameleon.rs:105-135): a MAP token resolves to
the nearest preceding PLAIN token with the same hash, because maps
never modify the dictionary; first-in-group maps read the
zero-initialized dictionary (value 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from density_tpu.engine.grouping import hash_quads


def _shift1(x, fill):
    """Shift right by one along axis=1 (batched streams)."""
    pad = jnp.full((x.shape[0], 1) + x.shape[2:], fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[:, :-1]], axis=1)


def seg_fill_last(first, vals, active):
    """Batched inclusive segmented fill along axis=1: value of the
    latest ACTIVE position <= t within t's segment (0 if none)."""
    val0 = jnp.where(active, vals, 0)

    def combine(a, b):
        va, ha, sa = a
        vb, hb, sb = b
        v = jnp.where(sb, vb, jnp.where(hb, vb, va))
        h = jnp.where(sb, hb, ha | hb)
        return v, h, sa | sb

    vi, hi, _ = jax.lax.associative_scan(
        combine, (val0, active, first), axis=1)
    return vi


def extract_tokens_xla(words, woff, Q, SIG_WORDS, flag_bits):
    """XLA fallback extraction: flags + payload halfwords per quad.

    words: (S, W) uint32 halfword values; woff: (S, NB) int32 per-block
    word offsets.  Returns (flags, w0, w1) each (S, NB*Q) int32; the
    caller masks invalid quads.  pw mapping here is chameleon/cheetah/
    lion-generic via the flag->payload-word rule.
    """
    S, W = words.shape
    NB = woff.shape[1]
    n_q = NB * Q

    sig_idx = woff[:, :, None] + jnp.arange(SIG_WORDS)[None, None, :]
    sig_w = jnp.take_along_axis(
        words, jnp.clip(sig_idx, 0, W - 1).reshape(S, -1),
        axis=1).reshape(S, NB, SIG_WORDS)

    qq = jnp.arange(Q, dtype=jnp.int32)
    if flag_bits == 3:  # lion: flags cross u16 word boundaries
        bitpos = 3 * qq
        wi = bitpos // 16
        off = (bitpos % 16).astype(jnp.uint32)
        sig_ext = jnp.concatenate(
            [sig_w, jnp.zeros((S, NB, 1), sig_w.dtype)], axis=2)
        lo = jnp.take_along_axis(
            sig_ext, jnp.broadcast_to(wi[None, None, :], (S, NB, Q)),
            axis=2)
        hi = jnp.take_along_axis(
            sig_ext, jnp.broadcast_to(wi[None, None, :] + 1, (S, NB, Q)),
            axis=2)
        flags = ((lo >> off[None, None, :])
                 | (hi << (16 - off)[None, None, :])) & 7
    else:
        per_word = 16 // flag_bits
        wsel = jnp.take_along_axis(
            sig_w, jnp.broadcast_to((qq // per_word)[None, None, :],
                                    (S, NB, Q)), axis=2)
        sh = (flag_bits * (qq % per_word)).astype(jnp.uint32)
        flags = (wsel >> sh[None, None, :]) & ((1 << flag_bits) - 1)
    flags = flags.reshape(S, n_q).astype(jnp.int32)

    pw = flag_payload_words(flags, flag_bits)
    pwb = pw.reshape(S, NB, Q)
    intra = jnp.cumsum(pwb, axis=2) - pwb
    pos = (woff[:, :, None] + SIG_WORDS + intra).reshape(S, n_q)
    w0 = jnp.take_along_axis(words, jnp.clip(pos, 0, W - 1), axis=1)
    w1 = jnp.take_along_axis(words, jnp.clip(pos + 1, 0, W - 1), axis=1)
    return flags, w0.astype(jnp.int32), w1.astype(jnp.int32)


def flag_payload_words(flags, flag_bits):
    """Payload halfwords per token from its flag (before validity
    masking): plain(0) -> 2; map flags -> 1; predicted -> 0.
    Map flags: chameleon {1}, cheetah {1,2}, lion {6,7}
    (reference: chameleon.rs:18-22, cheetah.rs:19-21, lion.rs:19-25)."""
    if flag_bits == 1:
        return jnp.where(flags == 0, 2, 1)
    if flag_bits == 2:
        return jnp.where(flags == 0, 2,
                         jnp.where(flags == 3, 0, 1))
    return jnp.where(flags == 0, 2, jnp.where(flags >= 6, 1, 0))


def resolve_chameleon(is_map, is_plain, h, plain_quad, interpret=False):
    """Resolve chameleon map tokens on the Pallas sorter.

    All inputs (S, N), N a power of two >= 256.  A map token's value is
    the payload quad of the latest preceding plain token with the same
    hash (zero if none -- the zero-initialized dictionary).  Two sorts:
    forward by (hash, index) with the plain payload carried, one
    inclusive segmented fill, and a sort back by index.
    """
    from density_tpu.kernels import bigsort
    S, N = is_map.shape
    sb = max(0, (N - 1).bit_length() - 16)
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    k1 = (h.astype(jnp.int32) << sb) | (idx >> 16)
    k2 = ((idx & 0xFFFF) << 1) | is_plain.astype(jnp.int32)
    v = jnp.where(is_plain, plain_quad, 0).astype(jnp.int32)
    k1s, k2s, vs = bigsort.sort(k1, k2, v, n_keys=2, interpret=interpret)
    grp = k1s >> sb
    first = grp != _shift1(grp, -1)
    isp = (k2s & 1) == 1
    fill = seg_fill_last(first, vs, isp)
    idx_back = ((k1s & ((1 << sb) - 1)) << 16) | (k2s >> 1)
    _, vr = bigsort.sort(idx_back, fill, n_keys=1, interpret=interpret)
    return jnp.where(is_map, vr.astype(jnp.uint32), plain_quad)


def decode_chameleon_batch(words, woff, is_copy, nb_real, out_len,
                           *, use_kernel=True, with_copy=True,
                           interpret=False):
    """Batched chameleon decode, TPU path.

    words: (S, W) uint32 halfword values of the compressed streams;
    woff: (S, NB) int32 block word offsets; is_copy: (S, NB) bool;
    nb_real, out_len: (S,) int32.  NB*Q must be a power of two >= 256
    (callers bucket to this).  Returns out_words (S, NB*Q*2) uint32
    halfwords; ragged-tail bytes are stamped host-side by the caller.
    """
    from density_tpu.constants import CHAMELEON as SPEC
    Q = SPEC.quads_per_block
    SIG_WORDS = SPEC.sig_words
    BLOCK = SPEC.block_size
    S, W = words.shape
    NB = woff.shape[1]
    N = NB * Q

    if use_kernel:
        from density_tpu.kernels import unpack
        flags, w0, w1 = unpack.unpack(
            words, woff, q=Q, sig_words=SIG_WORDS, flag_bits=1,
            interpret=interpret)
    else:
        flags, w0, w1 = extract_tokens_xla(words, woff, Q, SIG_WORDS, 1)

    bidx = jnp.arange(NB, dtype=jnp.int32)[None, :]
    is_real_block = bidx < nb_real[:, None]
    kidx = jnp.arange(N, dtype=jnp.int32)[None, :]
    block_of = kidx // Q
    real = kidx < (out_len[:, None] // 4)
    blk_ok = (is_real_block & ~is_copy)
    valid = real & jnp.take_along_axis(blk_ok, block_of, axis=1)

    is_map = (flags == 1) & valid
    is_plain = valid & ~is_map
    plain_quad = (w0.astype(jnp.uint32)
                  | (w1.astype(jnp.uint32) << 16))
    h = jnp.where(is_map, w0.astype(jnp.uint32), hash_quads(plain_quad))
    quads = resolve_chameleon(is_map, is_plain, h, plain_quad,
                              interpret=interpret)

    # dense interleave: quad k -> output words 2k, 2k+1
    lo = jnp.where(valid, quads & 0xFFFF, 0)
    hi = jnp.where(valid, quads >> 16, 0)
    out_words = jnp.stack([lo, hi], axis=-1).reshape(S, 2 * N)

    if with_copy:
        # copy blocks: raw input words at dense output positions (a
        # full-width gather -- only traced when the host has seen at
        # least one copy block in the batch)
        w_per_block = BLOCK // 2
        widx = jnp.arange(NB * w_per_block, dtype=jnp.int32)[None, :]
        wb = widx // w_per_block
        wj = widx % w_per_block
        csrc = jnp.take_along_axis(woff, wb, axis=1) + wj
        take_copy = jnp.take_along_axis(is_copy & is_real_block, wb,
                                        axis=1)
        copy_words = jnp.take_along_axis(
            words, jnp.clip(csrc, 0, W - 1), axis=1)
        out_words = jnp.where(take_copy, copy_words, out_words)
    return out_words.astype(jnp.uint32)
