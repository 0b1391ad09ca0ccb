"""Generic block-stream layout engine (encode side).

Codec-independent reimplementation of the reference's block driver
(reference: src/codec/codec.rs:34-80) as an array program:

  * blocks the input stream into `BLOCK`-byte blocks,
  * runs the per-codec token classifier (a pure function of the quads
    and the current copy-block hypothesis),
  * sizes each block, replays the blowup-protection FSM, and iterates
    to a fixed point over the copy-block set (copied blocks do not
    update codec state, which can change downstream flags),
  * assembles the final stream on a u16-word lattice with masked
    scatters: [signature][payload tokens][ragged tail] per block, raw
    bytes for copy blocks.

The per-codec part is two callbacks:

  classify(quads, hashes, real, copy_blocks) -> TokenPlan
  sig_pack(flags_2d)  -> (nb, SIG_WORDS) uint32 signature words

Everything here is shape-static and vmappable across streams.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from density_tpu.engine.grouping import hash_quads
from density_tpu.engine.protection import replay_fsm

MAX_FIXED_POINT_ITERS = 8


@dataclasses.dataclass
class TokenPlan:
    """Per-quad token layout decided by a codec classifier."""

    flags: jax.Array          # (n_q,) int32 flag values
    payload_words: jax.Array  # (n_q,) int32 in {0, 1, 2}
    w0: jax.Array             # (n_q,) uint32 first payload u16 word
    w1: jax.Array             # (n_q,) uint32 second payload word (plain hi)
    valid: jax.Array          # (n_q,) bool -- real quad in non-copy block


def encode_stream(words, n_bytes, *, Q: int, SIG_WORDS: int, BLOCK: int,
                  classify: Callable, sig_pack: Callable):
    """Generic encode. `words` is uint32[cap_words] of u16 input values
    with cap_words % (2*Q) == 0. Returns (out_words, total_bytes,
    converged, iters)."""
    sig_bytes = 2 * SIG_WORDS
    cap_words = words.shape[0]
    n_q = cap_words // 2
    nb = n_q // Q

    quads = (words[0:2 * n_q:2] | (words[1:2 * n_q:2] << 16)).astype(jnp.uint32)
    hashes = hash_quads(quads)
    full_quads = n_bytes // 4
    real = jnp.arange(n_q, dtype=jnp.int32) < full_quads
    n_blocks_real = (n_bytes + BLOCK - 1) // BLOCK
    ragged = n_bytes % 4
    last_real = n_blocks_real - 1
    bidx = jnp.arange(nb, dtype=jnp.int32)

    def block_sizes(plan: TokenPlan):
        per_block_words = plan.payload_words.reshape(nb, Q).sum(axis=1)
        enc_bytes = (sig_bytes + 2 * per_block_words
                     + jnp.where(bidx == last_real, ragged, 0))
        return enc_bytes

    def body(state):
        copy, _, it = state
        plan = classify(quads, hashes, real, copy)
        enc_bytes = block_sizes(plan)
        bits = enc_bytes >= BLOCK
        new_copy = replay_fsm(bits) & (bidx < n_blocks_real)
        converged = jnp.all(new_copy == copy)
        return new_copy, converged, it + 1

    def cond(state):
        _, converged, it = state
        return (~converged) & (it < MAX_FIXED_POINT_ITERS)

    state = body((jnp.zeros(nb, dtype=bool), jnp.bool_(False), jnp.int32(0)))
    copy, converged, iters = jax.lax.while_loop(cond, body, state)

    plan = classify(quads, hashes, real, copy)
    enc_bytes = block_sizes(plan)

    is_real_block = bidx < n_blocks_real
    blen = jnp.clip(n_bytes - bidx * BLOCK, 0, BLOCK)
    out_bytes_b = jnp.where(is_real_block,
                            jnp.where(copy, blen, enc_bytes), 0)
    byte_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(out_bytes_b)[:-1]]).astype(jnp.int32)
    total_bytes = jnp.sum(out_bytes_b).astype(jnp.int32)
    word_off = byte_off // 2  # every block starts even-aligned

    # worst case: every quad plain -> safe_encode_buffer_size words
    out_words = jnp.zeros(cap_words + nb * SIG_WORDS, dtype=jnp.uint32)
    oob = out_words.shape[0]  # positive OOB sentinel (mode="drop")

    # --- signatures
    sig_words = sig_pack(plan.flags.reshape(nb, Q))
    sig_idx = word_off[:, None] + jnp.arange(SIG_WORDS)[None, :]
    sig_idx = jnp.where((is_real_block & ~copy)[:, None], sig_idx, oob)
    out_words = out_words.at[sig_idx.reshape(-1)].set(
        sig_words.reshape(-1), mode="drop")

    # --- payload tokens
    pw = plan.payload_words.reshape(nb, Q)
    intra = jnp.cumsum(pw, axis=1) - pw
    pos = (word_off[:, None] + SIG_WORDS + intra).reshape(-1)
    idx0 = jnp.where(plan.valid & (plan.payload_words >= 1), pos, oob)
    out_words = out_words.at[idx0].set(plan.w0, mode="drop")
    idx1 = jnp.where(plan.valid & (plan.payload_words == 2), pos + 1, oob)
    out_words = out_words.at[idx1].set(plan.w1, mode="drop")

    # --- ragged tail of the last (non-copy) block
    lr = jnp.clip(last_real, 0, nb - 1)
    last_is_copy = copy[lr]
    rag_src = full_quads * 2 + jnp.arange(2)
    rag_pos = word_off[lr] + (enc_bytes[lr] - ragged) // 2 + jnp.arange(2)
    rag_valid = ((~last_is_copy) & (jnp.arange(2) * 2 < ragged)
                 & (n_blocks_real > 0))
    rag_idx = jnp.where(rag_valid, rag_pos, oob)
    out_words = out_words.at[rag_idx].set(
        words[jnp.clip(rag_src, 0, cap_words - 1)], mode="drop")

    # --- copy blocks: raw input words
    w_per_block = BLOCK // 2
    j = jnp.arange(w_per_block)[None, :]
    copy_src = bidx[:, None] * w_per_block + j
    copy_dst = word_off[:, None] + j
    blen_words = (blen + 1) // 2
    copy_mask = (copy & is_real_block)[:, None] & (j < blen_words[:, None])
    copy_idx = jnp.where(copy_mask, copy_dst, oob)
    out_words = out_words.at[copy_idx.reshape(-1)].set(
        words[jnp.clip(copy_src, 0, cap_words - 1)].reshape(-1), mode="drop")

    return out_words, total_bytes, converged, iters


def bucket_bytes(n: int, block: int) -> int:
    """Round capacity up to a coarse bucket (bounded jit cache, <=12.5%
    padding): next multiple of pow2/8, min one block, multiple of the
    block size."""
    n = max(n, block)
    n = -(-n // block) * block
    p = 1 << (n - 1).bit_length()
    step = max(p // 8, block)
    step = -(-step // block) * block
    return -(-n // step) * step
