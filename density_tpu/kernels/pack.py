"""Pallas block-stream pack kernel (encode assembly, copy-free path).

Replaces the XLA scatter-based `layout.assemble_fast` -- the dominant
encode cost (~14 ns per scattered element on TPU) -- with an in-VMEM
assembly that never scatters:

  * the stream is walked group-by-group (grid = (streams, groups),
    sequential on a TensorCore) with the running output word offset
    carried in SMEM;
  * each group's tokens (signature words, payload halfwords, ragged
    tail -- reference layout: src/codec/codec.rs:34-70) are placed by
    one-hot matmuls on the MXU: position one-hots (bf16) contracted
    against byte-plane value matrices, f32-accumulated (exact: one-hot
    rows are 0/1, byte values <= 255, sums < 2^24);
  * positions are computed relative to each tile's 128-aligned base,
    so misalignment is absorbed by the one-hot itself -- no dynamic
    lane rotation anywhere;
  * tiles are OR-merged into the revisited per-stream output block
    with a dynamic-slice read-modify-write (disjoint nonzero support,
    so OR is exact).

Copy blocks are NOT handled here: the caller uses this kernel only
with the no-copy certificate (see layout.fused_one) and falls back to
the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GQ = 16384         # max quads per grid group (adaptive per call)
GQ_MIN = 4096      # group-size quantum (callers pad N to this)
TQR = 16           # quad-rows per assembly tile


def _sig_weights(Q: int, sig_words: int, flag_bits: int) -> np.ndarray:
    """(flag_bits, 128, wpr) f32: weight of flag-bit plane j of the
    quad in lane c on signature word w of its row.

    Signatures pack flags LSB-first (reference: write_signature.rs:14-17);
    lion's 3-bit flags cross u16 word boundaries, which is why packing
    is per *bit* plane: bit j of quad i lands at signature bit
    flag_bits*i + j, i.e. u16 word (flag_bits*i + j) // 16.
    """
    bpr = 128 // Q
    wpr = bpr * sig_words
    w = np.zeros((flag_bits, 128, wpr), np.float32)
    for j in range(flag_bits):
        for c in range(128):
            b, i = divmod(c, Q)
            bit = flag_bits * i + j
            w[j, c, b * sig_words + bit // 16] = float(1 << (bit % 16))
    return w


def _expand_mat(Q: int) -> np.ndarray:
    """(bpr, 128) f32: broadcast per-block scalars to per-quad lanes."""
    bpr = 128 // Q
    e = np.zeros((bpr, 128), np.float32)
    for c in range(128):
        e[c // Q, c] = 1.0
    return e


def _lane_seg_cumsum(x, seg: int):
    """Inclusive cumsum along lanes within `seg`-lane segments.
    x: (..., 128) int32."""
    c = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    acc = x
    sh = 1
    while sh < seg:
        rolled = jnp.roll(acc, sh, axis=-1)
        acc = acc + jnp.where((c % seg) >= sh, rolled, 0)
        sh *= 2
    return acc


def _sublane_excl_cumsum(x):
    """Exclusive cumsum along axis 0. x: (rows, k) int32."""
    rows = x.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    acc = jnp.where(r >= 1, jnp.roll(x, 1, axis=0), 0)
    sh = 1
    while sh < rows:
        acc = acc + jnp.where(r >= sh + 1, jnp.roll(acc, sh, axis=0), 0)
        sh *= 2
    return acc


def _bcast_lanes(vals, group: int, lanes: int):
    """Exact integer broadcast of per-block values to lanes: output
    lane c takes vals[:, c // group]. Replaces a f32 one-hot dot,
    which silently demotes inputs to bf16 on the MXU (values >= 257
    round) -- positions must stay exact."""
    rows, k = vals.shape
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    acc = jnp.zeros((rows, lanes), vals.dtype)
    for j in range(k):
        acc = acc + jnp.where(c // group == j, vals[:, j:j + 1], 0)
    return acc


def _token_mats(tokens_pos, tokens_valid, val_u16, row0, trows):
    """One-hot operand construction for the placement matmul: returns
    (row2 (t, trows) bf16, rhs (t, 256) bf16) where rhs packs the lo
    byte plane in cols 0..127 and the hi plane in cols 128..255.

    All 3D construction stays in i32 (Mosaic only supports minor-dim
    insertion for 32-bit types); bf16 casts happen on the folded 2D
    arrays. Exactness: one-hots are 0/1, byte values <= 255 (bf16
    represents ints <= 256), accumulation is f32.
    """
    rel = tokens_pos - row0 * 128
    r = rel // 128
    c = rel % 128
    shape_r = tokens_pos.shape + (trows,)
    shape_c = tokens_pos.shape + (128,)
    nd = tokens_pos.ndim
    vmask = jnp.where(tokens_valid, 1, 0)
    row_i = ((r[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, shape_r, nd)).astype(jnp.int32)
        * vmask[..., None])
    col_i = (c[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, shape_c, nd)).astype(jnp.int32)
    lo = (val_u16 & 255)
    hi = (val_u16 >> 8)
    t = int(np.prod(tokens_pos.shape))
    row2 = row_i.reshape(t, trows).astype(jnp.bfloat16)
    rhs = jnp.concatenate(
        [(col_i * lo[..., None]).reshape(t, 128),
         (col_i * hi[..., None]).reshape(t, 128)],
        axis=1).astype(jnp.bfloat16)
    return row2, rhs


def _place_all(parts, trows):
    """Single placement matmul over concatenated token sets.
    parts: list of (row2, rhs) from _token_mats. Returns (lo, hi)
    f32 (trows, 128) byte planes."""
    row2 = jnp.concatenate([p[0] for p in parts], axis=0)
    rhs = jnp.concatenate([p[1] for p in parts], axis=0)
    out = jax.lax.dot_general(
        row2, rhs, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out[:, :128], out[:, 128:]


def _make_kernel(Q: int, sig_words: int, block: int, flag_bits: int,
                 n_groups: int, wrows: int, trows: int, gq: int):
    bpr = 128 // Q
    wpr = bpr * sig_words
    QROWS = gq // 128
    TILES = QROWS // TQR

    def kernel(nb_ref, flags_ref, pw_ref, w0_ref, w1_ref,
               sigw_ref, exp_ref, out_ref, carry):
        s = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
            carry[0] = 0

        n_bytes = nb_ref[s, 0]
        flags = flags_ref[0]   # (32, 128) i32
        pw = pw_ref[0]
        w0 = w0_ref[0].astype(jnp.int32)
        w1 = w1_ref[0].astype(jnp.int32)

        riota = jax.lax.broadcasted_iota(jnp.int32, (QROWS, 128), 0)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (QROWS, 128), 1)
        gqi = g * gq + riota * 128 + ciota         # global quad index

        full_quads = n_bytes // 4
        ragged = n_bytes % 4
        rag_hw = (ragged + 1) // 2
        nbr = (n_bytes + block - 1) // block       # real blocks
        last_b = nbr - 1

        # ---- per-block geometry --------------------------------------
        blk_r = jax.lax.broadcasted_iota(jnp.int32, (QROWS, bpr), 0)
        blk_c = jax.lax.broadcasted_iota(jnp.int32, (QROWS, bpr), 1)
        blk_g = g * (QROWS * bpr) + blk_r * bpr + blk_c  # global block id
        real_b = blk_g * block < n_bytes
        is_last = blk_g == last_b

        ones_h = jnp.transpose(exp_ref[...])               # (128, bpr)
        bpw = jax.lax.dot_general(
            pw.astype(jnp.float32), ones_h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        bw = jnp.where(real_b,
                       sig_words + bpw + jnp.where(is_last, rag_hw, 0), 0)

        incl = _lane_seg_cumsum(bw, bpr)
        row_tot = incl[:, bpr - 1:bpr]
        row_excl = _sublane_excl_cumsum(row_tot)
        gco = row_excl + incl - bw                  # group-local excl
        g_total = row_excl[QROWS - 1, 0] + row_tot[QROWS - 1, 0]

        word_base = carry[0]
        boff = word_base + gco                      # (32, bpr) abs words

        # ---- per-quad token positions --------------------------------
        boff_q = _bcast_lanes(boff, Q, 128)
        intra = _lane_seg_cumsum(pw, Q) - pw
        pos0 = boff_q + sig_words + intra
        valid0 = pw >= 1
        valid1 = pw == 2

        # ---- signature words ------------------------------------------
        sig_val = jnp.zeros((QROWS, wpr), jnp.float32)
        for j in range(flag_bits):
            bit = ((flags >> j) & 1).astype(jnp.float32)
            sig_val = sig_val + jax.lax.dot_general(
                bit, sigw_ref[j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        sig_val = sig_val.astype(jnp.int32)
        sig_base = _bcast_lanes(boff, sig_words, wpr)
        sig_widx = jax.lax.broadcasted_iota(
            jnp.int32, (QROWS, wpr), 1) % sig_words
        sig_pos = sig_base + sig_widx
        sig_valid = _bcast_lanes(real_b.astype(jnp.int32), sig_words,
                                 wpr) > 0

        # ---- ragged tail tokens ---------------------------------------
        # rag halfwords are w0/w1 of the partial quad (zero-padded input)
        in_group = ((full_quads >= g * gq) & (full_quads < (g + 1) * gq)
                    & (ragged > 0))
        at_fq = gqi == full_quads
        ragv0 = jnp.sum(jnp.where(at_fq, w0, 0))
        ragv1 = jnp.sum(jnp.where(at_fq, w1, 0))
        rag_base = jnp.sum(jnp.where(is_last, gco + sig_words + bpw, 0)
                           ) + word_base
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        rag_pos = rag_base + lane
        rag_valid = in_group & (
            (lane == 0) | ((lane == 1) & (ragged > 2)))
        rag_val = jnp.where(lane == 0, ragv0, ragv1)

        # ---- assemble tiles -------------------------------------------
        for t in range(TILES):
            sl = slice(t * TQR, (t + 1) * TQR)
            tb = boff[t * TQR, 0]
            row0 = tb // 128
            # ragged tokens follow the stream's last real block, which
            # can fall in any tile: range-mask so they land exactly once
            rag_rel = rag_pos - row0 * 128
            rag_in_tile = rag_valid & (rag_rel >= 0) & (
                rag_rel < trows * 128)
            lo, hi = _place_all([
                _token_mats(pos0[sl], valid0[sl], w0[sl], row0, trows),
                _token_mats(pos0[sl] + 1, valid1[sl], w1[sl], row0,
                            trows),
                _token_mats(sig_pos[sl], sig_valid[sl], sig_val[sl],
                            row0, trows),
                _token_mats(rag_pos, rag_in_tile, rag_val, row0, trows),
            ], trows)
            lat = (lo.astype(jnp.int32)
                   + (hi.astype(jnp.int32) << 8)).astype(jnp.uint32)
            cur = out_ref[0, pl.ds(row0, trows), :]
            out_ref[0, pl.ds(row0, trows), :] = cur | lat

        carry[0] = word_base + g_total

    return kernel


@functools.partial(jax.jit, static_argnames=("q", "sig_words", "block",
                                             "flag_bits", "interpret"))
def pack(flags, pw, w0, w1, nbytes, *, q, sig_words, block, flag_bits,
         interpret=False):
    """Assemble copy-free encoded streams.

    flags/pw/w0/w1: (S, N) int32/uint32 per-quad token plan (from the
    codec classifier); nbytes: (S,) int32. N must be a multiple of 4096.
    Returns out_words (S, W) uint32 halfword lattice, W >= the safe
    encode size, 128-row padded.
    """
    S, N = flags.shape
    assert N % GQ_MIN == 0, N
    gq = GQ
    while N % gq:
        gq //= 2
    n_groups = N // gq
    nb = N // q
    wout = 2 * N + nb * sig_words
    tq = TQR * 128
    trows = (tq // q * (sig_words + 2 * q) + 2 + 127) // 128 + 1
    wrows = (wout + 127) // 128 + trows

    kernel = _make_kernel(q, sig_words, block, flag_bits, n_groups,
                          wrows, trows, gq)
    bpr = 128 // q
    wpr = bpr * sig_words
    sigw = jnp.asarray(_sig_weights(q, sig_words, flag_bits))
    expm = jnp.asarray(_expand_mat(q))
    out3 = pl.pallas_call(
        kernel,
        grid=(S, n_groups),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, gq // 128, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, gq // 128, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, gq // 128, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, gq // 128, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((flag_bits, 128, wpr), lambda s, g: (0, 0, 0)),
            pl.BlockSpec((bpr, 128), lambda s, g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, wrows, 128), lambda s, g: (s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((S, wrows, 128), jnp.uint32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        # the unrolled tile loop's one-hot intermediates need ~45 MB of
        # scoped stack at gq=16384; v5e has 128 MB VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nbytes.reshape(S, 1).astype(jnp.int32),
      flags.astype(jnp.int32).reshape(S, N // 128, 128),
      pw.astype(jnp.int32).reshape(S, N // 128, 128),
      w0.astype(jnp.int32).reshape(S, N // 128, 128),
      w1.astype(jnp.int32).reshape(S, N // 128, 128),
      sigw, expm)
    return out3.reshape(S, wrows * 128)
