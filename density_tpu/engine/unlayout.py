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


HASH_MUL = 0x9D6EF916
INV_MHALF = 0x11B00B23  # (HASH_MUL >> 1)^-1 mod 2^31


def quad_cmp16(quad):
    """16-bit exact quad fingerprint given the hash: low product bits
    (their LSB is always 0 -- the multiplier is even) plus the quad's
    top bit.  (hash, cmp16) <-> quad is a bijection."""
    prod = quad.astype(jnp.uint32) * jnp.uint32(HASH_MUL)
    return ((prod & 0xFFFF) >> 1) | ((quad.astype(jnp.uint32) >> 31)
                                     << 15)


def quad_from_cmp16(h, c16):
    """Invert (hash, cmp16) -> quad."""
    t = (c16 & 0x7FFF) << 1
    P = (h.astype(jnp.uint32) << 16) | t
    qlow = ((P >> 1) * jnp.uint32(INV_MHALF)) & jnp.uint32(0x7FFFFFFF)
    return qlow | ((c16 & 0x8000).astype(jnp.uint32) << 16)


def _seg_fill_last_nonzero(x, first):
    """Batched (axis=1) segmented INCLUSIVE fill of the latest nonzero
    value (0 = 'nothing yet'), segments delimited by `first`.

    Dense Hillis-Steele doubling on a 2-operand monoid -- replaces the
    r3 chunked `associative_scan` max-fill, which cost 9.4 ms for 10 MB
    on v5e (more than either sort of the resolve; XLA's odd-even
    recursion materializes every window through HBM). log2(n) shifted
    combines, ~1 ms at the same shape."""
    from density_tpu.engine.grouping import monoid_scan

    def combine(a, b):
        va, fa = a
        vb, fb = b
        v = jnp.where(fb, vb, jnp.where(vb != 0, vb, va))
        return v, fa | fb

    v, _ = monoid_scan(combine, (x, first), (jnp.uint32(0), False),
                       axis=1)
    return v


def resolve_chameleon(is_map, is_plain, h, plain_quad, interpret=False):
    """Resolve chameleon map tokens on the Pallas sorter.

    All inputs (S, N), N a power of two >= 256.  A map token's value is
    the payload quad of the latest preceding plain token with the same
    hash (zero if none -- the zero-initialized dictionary, reference
    chameleon.rs:56-68).  Sort operands are minimal: the forward sort
    carries TWO i32 arrays (hash+index | index+is_plain+fingerprint),
    the fill is a dense doubling scan of the latest plain fingerprint,
    and map values are reconstructed from (hash, fingerprint) by
    modular inversion.
    """
    from density_tpu.kernels import bigsort
    S, N = is_map.shape
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    c16 = quad_cmp16(plain_quad)
    bias = jnp.int32(-2**31)
    if N <= (1 << 16):
        # (hash | index) packs into ONE u32 key (sign-bias ordering);
        # (is_plain | fingerprint) rides as the single carried array:
        # a 1-key 2-array network instead of 2-key 2-array
        kk = (((h.astype(jnp.uint32) << 16)
               | idx.astype(jnp.uint32)).astype(jnp.int32) ^ bias)
        v = ((is_plain.astype(jnp.int32) << 16)
             | jnp.where(is_plain, c16, 0).astype(jnp.int32))
        kk_s, v_s = bigsort.sort(kk, v, n_keys=1, interpret=interpret)
        ku = (kk_s ^ bias).astype(jnp.uint32)
        grp = (ku >> 16).astype(jnp.int32)
        idx_back = (ku & 0xFFFF).astype(jnp.int32)
        isp = ((v_s >> 16) & 1) == 1
        c16s = (v_s & 0xFFFF).astype(jnp.uint32)
    else:
        sbh = (N - 1).bit_length() - 15  # index bits above 15
        k1 = (h.astype(jnp.int32) << sbh) | (idx >> 15)
        k2 = ((((idx.astype(jnp.uint32) & 0x7FFF) << 17)
               | (is_plain.astype(jnp.uint32) << 16)
               | jnp.where(is_plain, c16, 0)).astype(jnp.int32) ^ bias)
        k1s, k2s = bigsort.sort(k1, k2, n_keys=2, interpret=interpret)
        k2u = (k2s ^ bias).astype(jnp.uint32)
        grp = k1s >> sbh
        idx_back = (((k1s & ((1 << sbh) - 1)) << 15)
                    | ((k2u >> 17) & 0x7FFF).astype(jnp.int32))
        isp = (k2u >> 16) & 1 == 1
        c16s = k2u & 0xFFFF
    first = grp != _shift1(grp, -1)

    # latest plain's fingerprint before/at each sorted position: the
    # 'has' bit rides above the 16 fingerprint bits (plain entries are
    # always nonzero); inclusive == exclusive for readers (a map is
    # never a writer at its own position)
    x = jnp.where(isp, jnp.uint32(1 << 16) | c16s, jnp.uint32(0))
    fill = _seg_fill_last_nonzero(x, first)
    has = fill != 0
    q_rec = quad_from_cmp16(grp.astype(jnp.uint32), fill & 0xFFFF)
    resolved_s = jnp.where(has, q_rec, 0).astype(jnp.int32)

    _, vr = bigsort.sort(idx_back, resolved_s, n_keys=1,
                         interpret=interpret)
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

    bidx = jnp.arange(NB, dtype=jnp.int32)[None, :]
    is_real_block = bidx < nb_real[:, None]
    kidx = jnp.arange(N, dtype=jnp.int32)[None, :]
    block_of = kidx // Q
    real = kidx < (out_len[:, None] // 4)

    if use_kernel:
        from density_tpu.kernels import unpack
        woff_k = jnp.where(is_real_block, woff, -1)
        flags, w0, w1 = unpack.unpack(
            words, woff_k, is_copy, q=Q, sig_words=SIG_WORDS,
            flag_bits=1, interpret=interpret)
    else:
        flags, w0, w1 = extract_tokens_xla(words, woff, Q, SIG_WORDS, 1)

    blk_ok = (is_real_block & ~is_copy)
    # dense per-block -> per-quad broadcast (block_of == kidx // Q);
    # a take_along_axis gather here costs real time at (S, 2^18)
    valid = real & jnp.repeat(blk_ok, Q, axis=1)

    is_map = (flags == 1) & valid
    is_plain = valid & ~is_map
    plain_quad = (w0.astype(jnp.uint32)
                  | (w1.astype(jnp.uint32) << 16))
    h = jnp.where(is_map, w0.astype(jnp.uint32), hash_quads(plain_quad))
    quads = resolve_chameleon(is_map, is_plain, h, plain_quad,
                              interpret=interpret)

    if with_copy and use_kernel:
        # copy blocks flow through the unpack routing as raw halfword
        # pairs, so the interleave below needs no gather at all; the
        # ragged final quad of a trailing copy block is included (its
        # raw words are real data, host-side trimming cuts to out_len)
        real_pad = kidx < ((out_len[:, None] + 3) // 4)
        in_copy = real_pad & jnp.repeat(is_copy & is_real_block, Q,
                                        axis=1)
        quads = jnp.where(in_copy, plain_quad, quads)
        valid = valid | in_copy
    lo = jnp.where(valid, quads & 0xFFFF, 0)
    hi = jnp.where(valid, quads >> 16, 0)
    out_words = jnp.stack([lo, hi], axis=-1).reshape(S, 2 * N)

    if with_copy and not use_kernel:
        # XLA path: raw copy words via a full-width gather
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
