"""Chameleon codec -- fully parallel TPU-native encode/decode.

Wire format (reference: chameleon.rs:34-151): 256-byte blocks, 64
quads/block, 1-bit flags in a 64-bit LSB-first signature, payloads are
u32 quads (plain) or u16 hashes (map), single 2^16-entry dictionary.

TPU-native reformulation (NOT a port of the serial loop):

  The dictionary slot dict[h] is written by every quad whose hash is h
  (plain writes the quad; a map hit leaves the identical value). Hence
  at position i, dict[h_i] == quad of the *latest preceding position
  with the same hash* (0 if none, matching zero-init). So:

      flag_i = MAP  <=>  quad_{prev(i)} == quad_i

  with prev(i) = latest j < i, h_j == h_i, j not inside a copy block.
  A single stable sort by hash makes prev(i) adjacent -> the per-quad
  serial dependency disappears entirely. Decode mirrors this: a MAP
  token resolves to the nearest preceding PLAIN token with the same
  hash, because maps never modify the dictionary.

  Block layout, protection-FSM fixed point, and u16-word-lattice
  packing live in density_tpu.engine.layout (shared by all codecs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from density_tpu.constants import CHAMELEON as SPEC
from density_tpu.engine.grouping import (
    hash_quads, prev_valid_value_in_group, last_valid_value_fill,
    sort_with, unsort_with, shift_right, seg_last_active_before)
from density_tpu.engine import layout
from density_tpu.engine.layout import TokenPlan

Q = SPEC.quads_per_block  # 64
SIG_WORDS = SPEC.sig_words  # 4
BLOCK = SPEC.block_size  # 256


def classify(quads, hashes, real, copy_blocks):
    """Per-quad token decisions given the copy-block hypothesis."""
    n_q = quads.shape[0]
    block_of = jnp.arange(n_q, dtype=jnp.int32) // Q
    valid = real & ~copy_blocks[block_of]
    prev_val, _ = prev_valid_value_in_group(hashes, quads, valid, fill=0)
    is_map = valid & (quads == prev_val)
    flags = is_map.astype(jnp.int32)
    payload_words = jnp.where(valid, jnp.where(is_map, 1, 2), 0)
    w0 = jnp.where(is_map, hashes, quads & 0xFFFF).astype(jnp.uint32)
    w1 = (quads >> 16).astype(jnp.uint32)
    return TokenPlan(flags, payload_words, w0, w1, valid)


def classify_fast(quads, hashes, real):
    """Copy-free hot path: one multi-operand sort in, dense adjacent
    compares, one sort back. No gathers.

    Padding quads (beyond the real stream) are all-zero, hash to group
    0, and carry the largest original indices, so the stable sort
    parks them at the end of group 0 where no real quad ever sees one
    as its predecessor -- masking is unnecessary.
    """
    n_q = quads.shape[0]
    idx = jnp.arange(n_q, dtype=jnp.int32)
    h_s, idx_s, q_s = sort_with(hashes, idx, quads)
    same = h_s == shift_right(h_s, jnp.uint32(0xFFFFFFFF))
    prev_q = shift_right(q_s, jnp.uint32(0))
    # first-in-group sees the zero-initialized dictionary
    is_map_s = jnp.where(same, q_s == prev_q, q_s == 0)
    is_map = unsort_with(idx_s, is_map_s) & real
    flags = is_map.astype(jnp.int32)
    payload_words = jnp.where(real, jnp.where(is_map, 1, 2), 0)
    w0 = jnp.where(is_map, hashes, quads & 0xFFFF).astype(jnp.uint32)
    w1 = (quads >> 16).astype(jnp.uint32)
    return TokenPlan(flags, payload_words, w0, w1, real)


def sig_pack(flags_2d):
    """1-bit flags, LSB-first -> 4 u16 words per block."""
    nb = flags_2d.shape[0]
    bits = flags_2d.reshape(nb, SIG_WORDS, 16).astype(jnp.uint32)
    weights = jnp.uint32(1) << jnp.arange(16, dtype=jnp.uint32)
    return (bits * weights).sum(axis=2)


def _sort_mod():
    """Pallas sort kernel choice (trace-time): the segmented bigsort
    compiles in seconds at any stream size; the monolithic bitonic is
    kept selectable for comparison (DENSITY_TPU_SORT=bitonic)."""
    import os
    from density_tpu.kernels import bigsort, bitonic
    return (bitonic if os.environ.get("DENSITY_TPU_SORT") == "bitonic"
            else bigsort)


def plan_fast_pallas(quads, nbytes, interpret=False):
    """Batched copy-free planner on the Pallas bitonic sorter.

    Same reformulation as classify_fast, but the hash-major order comes
    from an in-VMEM sort by the lexicographic key (hash | segment,
    index-within-segment) -- 34 bits split across two i32 keys -- and
    the unsort routes the single map bit back packed into the unique
    index key ((lidx << 1) | bit), one array instead of two.
    """
    bitonic = _sort_mod()
    S, n_q = quads.shape
    quads = quads.astype(jnp.uint32)
    h = hash_quads(quads).astype(jnp.int32)
    lidx = jnp.arange(n_q, dtype=jnp.int32)[None, :]
    if n_q <= (1 << 16):
        # (hash | index) fits one u32 exactly; sort it as i32 with the
        # sign-bit-xor bias (signed order of k^0x80000000 == unsigned
        # order of k). Single-key 2-operand sort: 11.3 ms vs 22.6 ms
        # for the 2-key 3-operand network at the same total bytes.
        bias = jnp.int32(-2**31)
        key = (((h.astype(jnp.uint32) << 16)
                | lidx.astype(jnp.uint32)).astype(jnp.int32) ^ bias)
        k_s, q_s = bitonic.sort(key, quads, n_keys=1,
                                interpret=interpret)
        u_s = (k_s ^ bias).astype(jnp.uint32)
        h_grp = (u_s >> 16).astype(jnp.int32)
        lidx_s = (u_s & 0xFFFF).astype(jnp.int32)
        prev_h = jnp.pad(h_grp[:, :-1], ((0, 0), (1, 0)),
                         constant_values=-1)
        same = prev_h == h_grp
        prev_q = jnp.pad(q_s[:, :-1], ((0, 0), (1, 0)))
    else:
        # Two-key two-ARRAY sort: instead of carrying the 32-bit quad
        # through the network, compare quads within a hash group via a
        # 16-bit fingerprint packed under the index in key2.  Given
        # equal hashes, cmp16 determines the quad exactly: the hash
        # pins (quad*M) >> 16, cmp16 restores the low product bits
        # (whose LSB is always 0 -- M is even) plus the quad's top bit,
        # and M/2 is odd so quad*M mod 2^32 + top bit <-> quad.
        seg_bits = (n_q - 1).bit_length() - 16
        prod = quads * jnp.uint32(0x9D6EF916)
        cmp16 = ((prod & 0xFFFF) >> 1) | ((quads >> 31) << 15)
        p = (h << seg_bits) | (lidx >> 16)
        bias = jnp.int32(-2**31)
        k2 = ((((lidx.astype(jnp.uint32) & 0xFFFF) << 16) | cmp16)
              .astype(jnp.int32) ^ bias)
        p_s, k2_s = bitonic.sort(p, k2, n_keys=2, interpret=interpret)
        u = (k2_s ^ bias).astype(jnp.uint32)
        cmp_s = u & 0xFFFF
        prev_p = jnp.pad(p_s[:, :-1], ((0, 0), (1, 0)),
                         constant_values=-1)
        prev_cmp = jnp.pad(cmp_s[:, :-1], ((0, 0), (1, 0)))
        h_grp = p_s >> seg_bits
        same = (prev_p >> seg_bits) == h_grp
        lidx_s = (((p_s & ((1 << seg_bits) - 1)) << 16)
                  | (u >> 16).astype(jnp.int32))
        q_s = cmp_s  # fingerprint stands in for the quad value
        prev_q = prev_cmp
        # first-in-group sees the zero-initialized dictionary
        # (quad == 0 <=> hash == 0 and fingerprint == 0)
        is_map_s = jnp.where(same, q_s == prev_q,
                             (h_grp == 0) & (q_s == 0))
        packed = (lidx_s << 1) | is_map_s.astype(jnp.int32)
        (up,) = bitonic.sort(packed, n_keys=1, interpret=interpret)
        return _finish_plan_fp(up, lidx, quads, h, nbytes, S, n_q)
    # first-in-group sees the zero-initialized dictionary
    is_map_s = jnp.where(same, q_s == prev_q, q_s == 0)
    packed = (lidx_s << 1) | is_map_s.astype(jnp.int32)
    (up,) = bitonic.sort(packed, n_keys=1, interpret=interpret)
    return _finish_plan_fp(up, lidx, quads, h, nbytes, S, n_q)


def _finish_plan_fp(up, lidx, quads, h, nbytes, S, n_q):
    """Shared plan tail: unsorted (lidx<<1|map) bits -> TokenPlan
    arrays + per-block incompressibility bits."""
    real = lidx < (nbytes[:, None] // 4)
    is_map = ((up & 1) == 1) & real
    flags = is_map.astype(jnp.int32)
    pw = jnp.where(real, jnp.where(is_map, 1, 2), 0)
    w0 = jnp.where(is_map, h.astype(jnp.uint32),
                   quads & 0xFFFF).astype(jnp.uint32)
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
    return flags, pw, w0, w1, real, bits


PIPELINE = layout.build_pipeline(Q=Q, SIG_WORDS=SIG_WORDS, BLOCK=BLOCK,
                                 classify=classify, sig_pack=sig_pack,
                                 classify_fast=classify_fast,
                                 flag_bits=SPEC.flag_bits,
                                 plan_fast_pallas=plan_fast_pallas)


def encode(data: bytes | np.ndarray) -> bytes:
    """One-shot single-stream encode; density-compatible bytes."""
    return layout.encode_oneshot(PIPELINE, "chameleon", data)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("with_copy",))
def _decode_core(words, in_word_off, is_copy, n_blocks_real, out_len,
                 with_copy=True):
    """words: uint32[cap] u16 values of the compressed stream.
    in_word_off/is_copy: per-block metadata (padded to fixed nb).
    Returns out_words uint32[out_cap] (u16 values).

    Decoded output positions are static (every block emits exactly
    BLOCK bytes), so assembly is a dense interleave -- no scatter. The
    map fill is a gather-free segmented scan in the hash-sorted domain
    (sort_with / unsort_with carry everything through the sort
    network)."""
    nb = in_word_off.shape[0]
    n_q = nb * Q
    cap = words.shape[0]
    bidx = jnp.arange(nb, dtype=jnp.int32)
    is_real_block = bidx < n_blocks_real

    # signatures -> flags
    sig_idx = in_word_off[:, None] + jnp.arange(SIG_WORDS)[None, :]
    sig_w = words[jnp.clip(sig_idx, 0, cap - 1)]  # (nb, 4)
    qq = jnp.arange(Q)
    wsel = sig_w[:, qq // 16]  # (nb, 64)
    flags = (wsel >> (qq % 16).astype(jnp.uint32)[None, :]) & 1
    is_map = (flags == 1)

    full_quads = out_len // 4
    kidx = jnp.arange(n_q, dtype=jnp.int32)
    block_of = kidx // Q
    real = kidx < full_quads
    valid = real & is_real_block[block_of]
    if with_copy:
        valid = valid & ~is_copy[block_of]
    is_map_q = is_map.reshape(-1) & valid

    payload_words = jnp.where(valid, jnp.where(is_map_q, 1, 2), 0)
    pw = payload_words.reshape(nb, Q)
    intra = jnp.cumsum(pw, axis=1) - pw
    pos = (in_word_off[:, None] + SIG_WORDS + intra).reshape(-1)
    w0 = words[jnp.clip(pos, 0, cap - 1)]
    w1 = words[jnp.clip(pos + 1, 0, cap - 1)]
    plain_quad = (w0 | (w1 << 16)).astype(jnp.uint32)

    # map resolution: nearest preceding plain with same hash, as a
    # segmented fill in the hash-sorted domain (gather-free)
    is_plain_q = valid & ~is_map_q
    h = jnp.where(is_map_q, w0, hash_quads(plain_quad)).astype(jnp.uint32)
    h_s, idx_s, v_s, p_s = sort_with(
        h, kidx, jnp.where(is_plain_q, plain_quad, 0),
        is_plain_q.astype(jnp.int32))
    firstg = h_s != shift_right(h_s, jnp.uint32(0xFFFFFFFF))
    fill_s, _ = seg_last_active_before(firstg, v_s, p_s == 1)
    # inclusive for readers == exclusive here: readers are never
    # writers at the same position
    resolved = unsort_with(idx_s, fill_s)
    quads = jnp.where(is_map_q, resolved, plain_quad)

    # dense interleave: quad k occupies output words 2k, 2k+1
    out_words = jnp.stack(
        [quads & 0xFFFF, quads >> 16], axis=-1).reshape(-1)
    out_words = jnp.where(
        jnp.repeat(valid, 2), out_words, 0).astype(jnp.uint32)

    if with_copy:
        # copy blocks: raw input words at dense output positions
        w_per_block = BLOCK // 2
        widx = jnp.arange(nb * w_per_block, dtype=jnp.int32)
        wb = widx // w_per_block
        wj = widx % w_per_block
        csrc = in_word_off[wb] + wj
        take_copy = is_copy[wb] & is_real_block[wb]
        copy_words = words[jnp.clip(csrc, 0, cap - 1)]
        out_words = jnp.where(take_copy, copy_words, out_words)

    return out_words


def decode(data: bytes, decoded_size_hint: int | None = None) -> bytes:
    """One-shot single-stream decode of a density chameleon stream."""
    if len(data) == 0:
        return b""
    from density_tpu import native
    in_off, out_off, is_copy = native.scan("chameleon", data)
    nb = len(in_off)
    out_len = _scan_out_len(data, in_off, out_off, is_copy, nb)

    nb_cap = layout.bucket_bytes(nb * BLOCK, BLOCK) // BLOCK
    cap_bytes = layout.bucket_bytes(len(data) + 2, BLOCK)
    padded = np.zeros(cap_bytes, dtype=np.uint8)
    padded[:len(data)] = np.frombuffer(data, dtype=np.uint8)
    words = padded.view("<u2").astype(np.uint32)

    in_word_off = np.zeros(nb_cap, dtype=np.int32)
    in_word_off[:nb] = in_off // 2
    copy_pad = np.zeros(nb_cap, dtype=bool)
    copy_pad[:nb] = is_copy.astype(bool)

    out_words = _decode_core(jnp.asarray(words), jnp.asarray(in_word_off),
                             jnp.asarray(copy_pad), jnp.int32(nb),
                             jnp.int32(out_len),
                             with_copy=bool(is_copy.any()))
    out = np.asarray(out_words[: (out_len + 1) // 2]).astype("<u2").tobytes()
    out = bytearray(out[:out_len])
    ragged = out_len % 4
    if ragged and not is_copy[-1]:
        # ragged tail bytes are the last bytes of the compressed stream
        out[-ragged:] = data[-ragged:]
    return bytes(out)


def _scan_out_len(data, in_off, out_off, is_copy, nb) -> int:
    """Decoded length from scanner metadata."""
    last_in = len(data) - int(in_off[-1])
    if is_copy[-1]:
        last_out = last_in if last_in <= BLOCK else BLOCK
    else:
        last_out = _last_block_out_len(data[int(in_off[-1]):])
    return int(out_off[-1]) + last_out


def _last_block_out_len(block: bytes) -> int:
    """Walk the final block's tokens to find its decoded length
    (host-side, at most 64 tokens)."""
    sig = int.from_bytes(block[:8].ljust(8, b"\x00"), "little")
    pos = 8
    out = 0
    for _ in range(Q):
        flag = sig & 1
        sig >>= 1
        if flag == 0:
            rem = len(block) - pos
            if rem == 0:
                return out
            if rem <= 3:
                return out + rem
            pos += 4
        else:
            pos += 2
        out += 4
    return out
