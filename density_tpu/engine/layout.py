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

The fixed point is driven from the host over three separately-jitted
stages (plan / fsm / assemble): the common case (no incompressible
block) costs one plan call, and splitting the graph keeps XLA compile
times bounded -- a monolithic while_loop version compiled 5-10x
slower on TPU.

All stages are batched over a leading streams axis; sharding that axis
over a mesh makes them SPMD with zero collectives.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from density_tpu.engine.grouping import hash_quads
from density_tpu.engine.protection import replay_fsm

MAX_FIXED_POINT_ITERS = 8

# Assembly-kernel escape hatch, captured ONCE at import: the choice is
# baked into every jitted encode variant (it is part of the traced
# graph), so flipping the env var later would silently not apply to
# already-cached shapes -- capturing here makes the contract explicit:
# set DENSITY_TPU_PACK=onehot before importing density_tpu to compare
# the r3 one-hot/MXU pack kernel against the routing pack.
_PACK_MODE = os.environ.get("DENSITY_TPU_PACK", "route")


@dataclasses.dataclass
class TokenPlan:
    """Per-quad token layout decided by a codec classifier."""

    flags: jax.Array          # (n_q,) int32 flag values
    payload_words: jax.Array  # (n_q,) int32 in {0, 1, 2}
    w0: jax.Array             # (n_q,) uint32 first payload u16 word
    w1: jax.Array             # (n_q,) uint32 second payload word (plain hi)
    valid: jax.Array          # (n_q,) bool -- real quad in non-copy block


@dataclasses.dataclass
class EncodePipeline:
    """Jitted, stream-batched encode stages for one codec."""

    plan: Callable       # (words, nbytes, copy) -> plan tuple + bits
    step_fsm: Callable   # (bits, nbytes) -> new copy mask
    assemble: Callable   # (words, nbytes, copy, plan tuple) -> (out, total)
    Q: int
    SIG_WORDS: int
    BLOCK: int
    plan_fast: Callable | None = None  # (words, nbytes) -> same, copy-free
    assemble_fast: Callable | None = None  # copy-free assembly
    encode_fused: Callable | None = None  # (words, nbytes) -> (out, tot, ok)
    encode_fused_xla: Callable | None = None     # same, XLA assembly
    encode_fused_pallas: Callable | None = None  # same, Pallas assembly


def build_pipeline(*, Q: int, SIG_WORDS: int, BLOCK: int,
                   classify: Callable, sig_pack: Callable,
                   classify_fast: Callable | None = None,
                   flag_bits: int | None = None,
                   plan_fast_pallas: Callable | None = None
                   ) -> EncodePipeline:
    sig_bytes = 2 * SIG_WORDS

    def geometry(quads, n_bytes):
        # encode-side staging is u32 quads (little-endian view of the
        # input bytes): no strided u16 de-interleave anywhere -- a
        # words[0::2] | words[1::2] relayout cost ~25 ms for 10 MB on
        # v5e, dwarfing the actual planning math.
        n_q = quads.shape[0]
        nb = n_q // Q
        full_quads = n_bytes // 4
        n_blocks_real = (n_bytes + BLOCK - 1) // BLOCK
        return 2 * n_q, n_q, nb, full_quads, n_blocks_real

    def _finish_plan(p, n_bytes, nb, n_blocks_real):
        per_block_words = p.payload_words.reshape(nb, Q).sum(axis=1)
        bidx = jnp.arange(nb, dtype=jnp.int32)
        ragged = n_bytes % 4
        enc_bytes = (sig_bytes + 2 * per_block_words
                     + jnp.where(bidx == n_blocks_real - 1, ragged, 0))
        bits = enc_bytes >= BLOCK
        return p.flags, p.payload_words, p.w0, p.w1, p.valid, bits

    def plan_one(quads, n_bytes, copy):
        cap_words, n_q, nb, full_quads, n_blocks_real = geometry(
            quads, n_bytes)
        quads = quads.astype(jnp.uint32)
        hashes = hash_quads(quads)
        real = jnp.arange(n_q, dtype=jnp.int32) < full_quads
        p = classify(quads, hashes, real, copy)
        return _finish_plan(p, n_bytes, nb, n_blocks_real)

    def plan_fast_one(quads, n_bytes):
        """Copy-free hot path: no masking anywhere (valid == real, and
        padding quads provably sort behind every real quad in their
        hash group), so group-prev becomes a dense shift."""
        cap_words, n_q, nb, full_quads, n_blocks_real = geometry(
            quads, n_bytes)
        quads = quads.astype(jnp.uint32)
        hashes = hash_quads(quads)
        real = jnp.arange(n_q, dtype=jnp.int32) < full_quads
        p = classify_fast(quads, hashes, real)
        return _finish_plan(p, n_bytes, nb, n_blocks_real)

    def fsm_one(bits, n_bytes):
        nb = bits.shape[0]
        n_blocks_real = (n_bytes + BLOCK - 1) // BLOCK
        return replay_fsm(bits) & (jnp.arange(nb) < n_blocks_real)

    def assemble_one(quads, n_bytes, copy, flags, payload_words, w0, w1,
                     valid, with_copy=True):
        cap_words, n_q, nb, full_quads, n_blocks_real = geometry(
            quads, n_bytes)
        quads = quads.astype(jnp.uint32)
        bidx = jnp.arange(nb, dtype=jnp.int32)
        ragged = n_bytes % 4
        last_real = n_blocks_real - 1
        per_block_words = payload_words.reshape(nb, Q).sum(axis=1)
        enc_bytes = (sig_bytes + 2 * per_block_words
                     + jnp.where(bidx == last_real, ragged, 0))

        is_real_block = bidx < n_blocks_real
        blen = jnp.clip(n_bytes - bidx * BLOCK, 0, BLOCK)
        out_bytes_b = jnp.where(is_real_block,
                                jnp.where(copy, blen, enc_bytes)
                                if with_copy else enc_bytes, 0)
        byte_off = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(out_bytes_b)[:-1]]).astype(jnp.int32)
        total_bytes = jnp.sum(out_bytes_b).astype(jnp.int32)
        word_off = byte_off // 2  # every block starts even-aligned

        # worst case: every quad plain -> safe_encode_buffer_size words
        out_words = jnp.zeros(cap_words + nb * SIG_WORDS, dtype=jnp.uint32)
        oob = out_words.shape[0]  # positive OOB sentinel (mode="drop")

        sig_words = sig_pack(flags.reshape(nb, Q))
        sig_idx = word_off[:, None] + jnp.arange(SIG_WORDS)[None, :]
        sig_idx = jnp.where((is_real_block & ~copy)[:, None], sig_idx, oob)
        out_words = out_words.at[sig_idx.reshape(-1)].set(
            sig_words.reshape(-1), mode="drop")

        pw = payload_words.reshape(nb, Q)
        intra = jnp.cumsum(pw, axis=1) - pw
        pos = (word_off[:, None] + SIG_WORDS + intra).reshape(-1)
        idx0 = jnp.where(valid & (payload_words >= 1), pos, oob)
        out_words = out_words.at[idx0].set(w0, mode="drop")
        idx1 = jnp.where(valid & (payload_words == 2), pos + 1, oob)
        out_words = out_words.at[idx1].set(w1, mode="drop")

        lr = jnp.clip(last_real, 0, nb - 1)
        last_is_copy = copy[lr]
        rag_quad = quads[jnp.clip(full_quads, 0, n_q - 1)]
        rag_val = jnp.stack([rag_quad & 0xFFFF, rag_quad >> 16])
        rag_pos = word_off[lr] + (enc_bytes[lr] - ragged) // 2 + jnp.arange(2)
        rag_valid = ((~last_is_copy) & (jnp.arange(2) * 2 < ragged)
                     & (n_blocks_real > 0))
        rag_idx = jnp.where(rag_valid, rag_pos, oob)
        out_words = out_words.at[rag_idx].set(rag_val, mode="drop")

        if with_copy:
            # copy-block u16 source words come straight out of the
            # staged quads (word j = half (j & 1) of quad j // 2)
            w_per_block = BLOCK // 2
            j = jnp.arange(w_per_block)[None, :]
            copy_src = bidx[:, None] * w_per_block + j
            copy_dst = word_off[:, None] + j
            blen_words = (blen + 1) // 2
            copy_mask = ((copy & is_real_block)[:, None]
                         & (j < blen_words[:, None]))
            copy_idx = jnp.where(copy_mask, copy_dst, oob)
            src_q = quads[jnp.clip(copy_src // 2, 0, n_q - 1)]
            src_w = jnp.where((copy_src & 1) == 0, src_q & 0xFFFF,
                              src_q >> 16)
            out_words = out_words.at[copy_idx.reshape(-1)].set(
                src_w.reshape(-1), mode="drop")

        return out_words, total_bytes

    def assemble_fast_one(quads, n_bytes, flags, payload_words, w0, w1,
                          valid):
        nb = quads.shape[0] // Q
        return assemble_one(quads, n_bytes, jnp.zeros(nb, bool), flags,
                            payload_words, w0, w1, valid, with_copy=False)

    def fused_one(quads, n_bytes):
        """Single-dispatch fast path: copy-free plan + assembly, plus an
        exact no-copy certificate.

        The protection FSM (reference: protection_state.rs:37-47) arms a
        copy penalty only after TWO consecutive incompressible blocks, so
        if no two adjacent blocks are incompressible the FSM provably
        never leaves the encode path -- no scan, no fixed point. `ok`
        reports that certificate; when False the caller falls back to
        the general host-driven fixed point.
        """
        if classify_fast is not None:
            flags, pw, w0, w1, valid, bits = plan_fast_one(quads, n_bytes)
        else:
            nb = quads.shape[0] // Q
            flags, pw, w0, w1, valid, bits = plan_one(
                quads, n_bytes, jnp.zeros(nb, bool))
        ok = ~jnp.any(bits[1:] & bits[:-1])
        out_words, total = assemble_fast_one(quads, n_bytes, flags, pw,
                                             w0, w1, valid)
        return out_words, total, ok

    def fused_pallas_batched(quads, nbytes, interpret=False):
        """Batched fused fast path with Pallas pack assembly (TPU).

        Assembly kernel choice (trace-time): the routing-network pack
        (kernels/packroute.py -- monotone compact/expand passes, the
        unpack kernel's inverse) replaced the one-hot/MXU placement
        kernel as default in r4: 15.2 ms -> ~3 ms for 10 MB on v5e.
        DENSITY_TPU_PACK=onehot selects the old kernel for comparison.
        """
        from density_tpu.kernels import pack as _packold
        from density_tpu.kernels import packroute as _packroute
        n_q = quads.shape[1]
        use_route = _PACK_MODE == "route" and n_q % 16384 == 0
        packmod = _packroute if use_route else _packold
        pow2 = n_q >= 256 and (n_q & (n_q - 1)) == 0
        if plan_fast_pallas is not None and pow2:
            flags, pw, w0, w1, valid, bits = plan_fast_pallas(
                quads, nbytes, interpret=interpret)
        else:
            plan_b = (jax.vmap(plan_fast_one) if classify_fast is not None
                      else jax.vmap(
                          lambda w, n: plan_one(
                              w, n, jnp.zeros(w.shape[0] // Q, bool))))
            flags, pw, w0, w1, valid, bits = plan_b(quads, nbytes)
        ok = ~jnp.any(bits[:, 1:] & bits[:, :-1], axis=1)
        # The pack kernel emits the ragged tail from the plan's w0/w1 at
        # the partial-quad index, but classifiers may put a hash there
        # (the padding quad can match dictionary state). Stamp in the
        # raw input halfwords (reference: codec.rs:58-62 pushes the
        # ragged remainder verbatim).
        S = quads.shape[0]
        n_q = quads.shape[1]
        fq = jnp.minimum(nbytes // 4, n_q - 1)
        rows = jnp.arange(S)
        ragged = nbytes % 4 > 0
        rq = quads[rows, fq].astype(jnp.uint32)
        raw0 = (rq & 0xFFFF).astype(w0.dtype)
        raw1 = (rq >> 16).astype(w1.dtype)
        w0 = w0.at[rows, fq].set(jnp.where(ragged, raw0, w0[rows, fq]))
        w1 = w1.at[rows, fq].set(jnp.where(ragged, raw1, w1[rows, fq]))
        out_words = packmod.pack(
            flags, pw, w0, w1, nbytes, q=Q, sig_words=SIG_WORDS,
            block=BLOCK, flag_bits=flag_bits, interpret=interpret)
        nbr = (nbytes + BLOCK - 1) // BLOCK
        totals = (2 * jnp.sum(pw, axis=1) + nbr * sig_bytes
                  + nbytes % 4).astype(jnp.int32)
        return out_words, totals, ok

    fused_xla = jax.jit(jax.vmap(fused_one))
    fused_pallas = (jax.jit(functools.partial(fused_pallas_batched,
                                              interpret=False))
                    if flag_bits is not None else None)
    fused_pallas_interp = (
        jax.jit(functools.partial(fused_pallas_batched, interpret=True))
        if flag_bits is not None else None)

    def fused_dispatch(quads, nbytes):
        """Host-level dispatch: Pallas pack on a single TPU device when
        the geometry allows, XLA assembly otherwise. (Jitted callers
        must pick a variant explicitly.)"""
        mode = os.environ.get("DENSITY_TPU_PALLAS", "auto")
        from density_tpu.kernels import pack as packmod
        n_q = quads.shape[1]
        eligible = (fused_pallas is not None and mode != "0"
                    and n_q % packmod.GQ_MIN == 0)
        if eligible and mode == "interpret":
            return fused_pallas_interp(quads, nbytes)
        # On hardware, only take the Pallas variant when the WHOLE plan
        # is Pallas (chameleon): shipping the vmapped XLA sort planner
        # + pack kernel as one remote AOT compile stalled the v5e
        # toolchain for cheetah/lion in round 1. Force with
        # DENSITY_TPU_PALLAS=1 to re-test.
        if eligible and (plan_fast_pallas is not None or mode == "1"):
            try:
                devs = quads.devices()
                plat = next(iter(devs)).platform
            except Exception:
                devs, plat = (), ""
            if len(devs) == 1 and plat in ("tpu", "axon"):
                return fused_pallas(quads, nbytes)
        return fused_xla(quads, nbytes)

    return EncodePipeline(
        plan=jax.jit(jax.vmap(plan_one)),
        step_fsm=jax.jit(jax.vmap(fsm_one)),
        assemble=jax.jit(jax.vmap(
            lambda w, n, c, f, p, w0, w1, v: assemble_one(
                w, n, c, f, p, w0, w1, v))),
        Q=Q, SIG_WORDS=SIG_WORDS, BLOCK=BLOCK,
        plan_fast=(jax.jit(jax.vmap(plan_fast_one))
                   if classify_fast is not None else None),
        assemble_fast=jax.jit(jax.vmap(assemble_fast_one)),
        encode_fused=fused_dispatch,
        encode_fused_xla=fused_xla,
        encode_fused_pallas=fused_pallas)


def run_encode(pipe: EncodePipeline, quads, nbytes):
    """Host-driven fixed point over the copy-block set.

    The first iteration assumes no copy blocks; when the codec provides
    a copy-free fast plan it is used there (dense, no masking). If the
    FSM then arms no copies -- every stream without an incompressible
    region -- that single fast pass is the whole hot path. Otherwise
    the general masked plan iterates to the fixed point.

    quads: uint32[(S, n_q)] device array of little-endian input quads
    (may be sharded over a mesh along the leading axis);
    nbytes: int32[(S,)]. Returns (out_words, totals, converged: bool).
    """
    S, n_q = quads.shape
    nb = n_q // pipe.Q
    if pipe.encode_fused is not None:
        # single dispatch + single host sync for the common case (no
        # stream has two adjacent incompressible blocks)
        out_words, totals, ok = pipe.encode_fused(quads, nbytes)
        if bool(jnp.all(ok)):
            return out_words, totals, True
    copy = jnp.zeros((S, nb), dtype=bool)
    converged = False
    for it in range(MAX_FIXED_POINT_ITERS):
        if it == 0 and pipe.plan_fast is not None:
            flags, pw, w0, w1, valid, bits = pipe.plan_fast(quads, nbytes)
        else:
            flags, pw, w0, w1, valid, bits = pipe.plan(quads, nbytes, copy)
        new_copy = pipe.step_fsm(bits, nbytes)
        if not bool(jnp.any(new_copy != copy)):
            converged = True
            break
        copy = new_copy
    no_copies = converged and not bool(jnp.any(copy))
    if no_copies and pipe.assemble_fast is not None:
        out_words, totals = pipe.assemble_fast(quads, nbytes, flags, pw,
                                               w0, w1, valid)
    else:
        out_words, totals = _assemble_masked(pipe, quads, nbytes, copy,
                                             flags, pw, w0, w1, valid)
    return out_words, totals, converged


def _assemble_masked(pipe, quads, nbytes, copy, flags, pw, w0, w1, valid):
    """Masked (with-copy) assembly, chunked to <= 8 streams on TPU.

    XLA:TPU miscompiles the vmapped masked assembly at some stream
    batches: lion (SIG_WORDS=3) at S in 9..12 returns ALL-ZERO outputs
    on v5e while S <= 8 and S = 16 are exact and CPU is exact at every
    S (identical jitted code; jax 0.9.0/libtpu, reproduced with and
    without the persistent compile cache). The copy path is rare --
    only streams whose blowup FSM armed copy blocks reach it -- so the
    extra dispatches are noise; regression pinned in
    tests/test_tpu_smoke.py.

    Chunking applies only to single-device arrays: on a stream-sharded
    mesh the quads[lo:hi] slices would cut across shard boundaries and
    force resharding + per-chunk-shape recompiles, and each shard's
    local batch is at most S/n_dev anyway."""
    try:
        devs = quads.devices()
        plat = next(iter(devs)).platform
    except Exception:  # noqa: BLE001
        devs, plat = (), ""
    S = quads.shape[0]
    if plat not in ("tpu", "axon") or S <= 8 or len(devs) > 1:
        return pipe.assemble(quads, nbytes, copy, flags, pw, w0, w1,
                             valid)
    outs, tots = [], []
    for lo in range(0, S, 8):
        hi = min(lo + 8, S)
        ow, tt = pipe.assemble(quads[lo:hi], nbytes[lo:hi], copy[lo:hi],
                               flags[lo:hi], pw[lo:hi], w0[lo:hi],
                               w1[lo:hi], valid[lo:hi])
        outs.append(ow)
        tots.append(tt)
    return jnp.concatenate(outs, axis=0), jnp.concatenate(tots, axis=0)


def encode_oneshot(pipe: EncodePipeline, codec_name: str,
                   data) -> bytes:
    """Single-stream host wrapper: bytes in, density-stream bytes out."""
    buf = np.frombuffer(bytes(data), dtype=np.uint8) if isinstance(
        data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    n = buf.size
    if n == 0:
        return b""
    cap_bytes = bucket_bytes(n, pipe.BLOCK)
    padded = np.zeros(cap_bytes, dtype=np.uint8)
    padded[:n] = buf
    quads = padded.view("<u4")[None, :]
    nbytes = jnp.asarray(np.array([n], dtype=np.int32))
    out_words, totals, converged = run_encode(pipe, jnp.asarray(quads),
                                              nbytes)
    if not converged:  # pathological stream: exact native fallback
        from density_tpu import native
        return native.encode(codec_name, buf.tobytes())
    total = int(totals[0])
    out = np.asarray(out_words[0, : (total + 1) // 2]).astype(
        "<u2").tobytes()
    return out[:total]


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
