"""Pallas block-stream unpack kernel (decode token extraction).

The decode mirror of kernels/pack.py: turns compressed block streams
into dense per-quad (flags, w0, w1) token lattices without a single
XLA gather (computed-index gathers cost ~15 ns/element on v5e -- the
dominant round-2 decode cost).

Layout being decoded (reference: src/codec/codec.rs:82-126): each
block is [signature][payload halfwords...], block word offsets come
from the host stream scanner.  Per grid step (stream, group of GQ
quads):

  * the input window covering the group's blocks is DMA'd HBM->VMEM
    (block offsets are monotone, so one contiguous window suffices);
  * signature words are pulled from the window by a one-hot matmul
    triple (extract rows on the MXU, select columns, fold back to a
    (rows, 128) lattice with static fold matrices -- all MXU work, no
    vector relayouts);
  * flags are broadcast from signature words to quad lanes by one more
    static-pattern fold matmul, then payload sizes and intra-block
    prefix sums give every token's word position;
  * payload halfwords (w0, w1) are pulled by the same extract triple.

Exactness: one-hot operands are 0/1 in bf16; window values are split
into byte planes (<= 255, exact in bf16); accumulation is f32; the
recombined value is an exact u16.

Copy blocks and blocks past the real end produce garbage tokens that
the caller masks with its validity lattice (offsets stay monotone, so
they never corrupt other blocks' extraction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GQ = 16384   # quads per grid group
QROWS = GQ // 128  # 128
TQR = 16     # quad-rows per tile
TILES = QROWS // TQR


def _geom(q: int, sig_words: int):
    """Static geometry for one codec."""
    nbg = GQ // q                      # blocks per group
    span = sig_words + 2 * q + 2       # max words per block (+ragged)
    wrows = -(-(-(-nbg * span // 128) + 2) // 8) * 8  # window rows (8-mult)
    nbt = TQR * 128 // q               # blocks per tile
    tw = -(-(-(-nbt * span // 128) + 2) // 8) * 8     # tile window rows
    srows_g = nbg * sig_words // 128   # sig-token rows per group
    srows_t = nbt * sig_words // 128   # sig-token rows per tile
    return nbg, span, wrows, nbt, tw, srows_g, srows_t


def _fold_mats(q: int, sig_words: int, flag_bits: int):
    """Static one-hot fold matrices (numpy, passed as kernel inputs).

    Dr/Dc: fold a (T=TQR*128,) token-major vector back onto the
    (TQR, 128) lattice: token t -> (t // 128, t % 128).
    U2/V2[/V2b]: broadcast sig-token values onto quad lanes: quad lane
    (r, c) needs sig word k(c) of its block; for lion (3-bit flags) a
    second pattern V2b selects word k+1 (zero column when k+1 == 3,
    matching the zero-padded 6-byte signature read, lion.rs:339-351).
    """
    T = TQR * 128
    t = np.arange(T)
    dr = (t[:, None] // 128 == np.arange(TQR)[None, :])
    dc = (t[:, None] % 128 == np.arange(128)[None, :])

    nbt = TQR * 128 // q
    bpt = 128 // q  # blocks per quad-row
    ts = np.arange(nbt * sig_words)
    b_t = ts // sig_words
    k_t = ts % sig_words
    c = np.arange(128)
    if flag_bits == 3:
        kc = (3 * (c % q)) // 16
    else:
        kc = (c % q) // (16 // flag_bits)
    u2 = (b_t[:, None] // bpt == np.arange(TQR)[None, :])
    v2 = ((b_t[:, None] % bpt == (c // q)[None, :])
          & (k_t[:, None] == kc[None, :]))
    mats = dict(dr=dr, dc=dc, u2=u2, v2=v2)
    if flag_bits == 3:
        mats["v2b"] = ((b_t[:, None] % bpt == (c // q)[None, :])
                       & (k_t[:, None] == kc[None, :] + 1)
                       & (k_t[:, None] < sig_words))
    return {k: v.astype(np.float32) for k, v in mats.items()}


def _extract(window, rel, valid, tw):
    """Extract window halfword values at `rel` (element offsets into
    the (tw, 128) window tile) for each token of a lattice.

    rel/valid: (rows, 128).  Returns (zz_lo, zz_hi): (rows*128, TQR)
    f32, every column holding the token's byte-plane value (the
    column-broadcast form all fold matmuls consume).
    """
    rows = rel.shape[0]
    T = rows * 128
    rid = rel // 128
    cid = rel % 128
    ok = valid & (rel >= 0) & (rid < tw)
    okm = jnp.where(ok, 1, 0)
    r3 = ((rid[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (rows, 128, tw), 2)).astype(jnp.int32)
        * okm[..., None])
    c3 = (cid[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (rows, 128, 128), 2)).astype(jnp.int32)
    R = r3.reshape(T, tw).astype(jnp.bfloat16)
    C = c3.reshape(T, 128)

    wlo = (window & 255).astype(jnp.bfloat16)
    whi = (window >> 8).astype(jnp.bfloat16)
    wcat = jnp.concatenate([wlo, whi], axis=1)  # (tw, 256)
    tmp = jax.lax.dot_general(
        R, wcat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (T, 256)
    z_lo = (tmp[:, :128].astype(jnp.bfloat16)
            * C.astype(jnp.bfloat16))
    z_hi = (tmp[:, 128:].astype(jnp.bfloat16)
            * C.astype(jnp.bfloat16))
    ones = jnp.ones((128, TQR), jnp.bfloat16)
    zz_lo = jax.lax.dot_general(
        z_lo, ones, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    zz_hi = jax.lax.dot_general(
        z_hi, ones, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return zz_lo, zz_hi


def _fold(zz_lo, zz_hi, drm, dcm, out_rows):
    """Fold column-broadcast token values onto a (out_rows, 128)
    lattice via dot_general over the token dimension."""
    ylo = jax.lax.dot_general(
        (drm[:, :out_rows] * zz_lo[:, :out_rows]).astype(jnp.bfloat16),
        dcm.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    yhi = jax.lax.dot_general(
        (drm[:, :out_rows] * zz_hi[:, :out_rows]).astype(jnp.bfloat16),
        dcm.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return ylo.astype(jnp.int32) + (yhi.astype(jnp.int32) << 8)


def _lane_seg_cumsum(x, seg: int):
    """Inclusive cumsum along lanes within `seg`-lane segments."""
    c = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    acc = x
    sh = 1
    while sh < seg:
        rolled = pltpu.roll(acc, sh, axis=x.ndim - 1)
        acc = acc + jnp.where((c % seg) >= sh, rolled, 0)
        sh *= 2
    return acc


def _flag_pw(flags, flag_bits):
    """flag -> payload halfwords (see unlayout.flag_payload_words)."""
    if flag_bits == 1:
        return jnp.where(flags == 0, 2, 1)
    if flag_bits == 2:
        return jnp.where(flags == 0, 2, jnp.where(flags == 3, 0, 1))
    return jnp.where(flags == 0, 2, jnp.where(flags >= 6, 1, 0))


def _make_kernel(q, sig_words, flag_bits):
    nbg, span, wrows, nbt, tw, srows_g, srows_t = _geom(q, sig_words)
    has_v2b = flag_bits == 3
    per_word = 16 // flag_bits if flag_bits != 3 else None

    def kernel(window_ref, boffq_ref, sigpos_ref,
               dr_ref, dc_ref, u2_ref, *rest):
        if has_v2b:
            v2_ref, v2b_ref = rest[0], rest[1]
            rest = rest[2:]
        else:
            v2_ref = rest[0]
            rest = rest[1:]
        out_f, out_w0, out_w1 = rest[:3]

        lane = jax.lax.broadcasted_iota(jnp.int32, (TQR, 128), 1)
        for t in range(TILES):
            boffq_sl = boffq_ref[0, t * TQR:(t + 1) * TQR, :]
            # tile window start (window-relative, 128-row aligned);
            # positions come in pre-rebased to the group window
            tr0 = jnp.clip(boffq_ref[0, t * TQR, 0] // 128,
                           0, wrows - tw)
            base = tr0 * 128
            wt = window_ref[0, pl.ds(tr0, tw), :]

            # --- signature words -> flags --------------------------
            sp = sigpos_ref[0, t * srows_t:(t + 1) * srows_t, :]
            zz_lo, zz_hi = _extract(wt, sp - base,
                                    jnp.full(sp.shape, True), tw)
            sw_lat_lo = jax.lax.dot_general(
                (u2_ref[...] * zz_lo[:, :TQR]).astype(jnp.bfloat16),
                v2_ref[...].astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sw_lat_hi = jax.lax.dot_general(
                (u2_ref[...] * zz_hi[:, :TQR]).astype(jnp.bfloat16),
                v2_ref[...].astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            w_k = (sw_lat_lo.astype(jnp.int32)
                   + (sw_lat_hi.astype(jnp.int32) << 8))
            if has_v2b:
                nx_lo = jax.lax.dot_general(
                    (u2_ref[...] * zz_lo[:, :TQR]).astype(jnp.bfloat16),
                    v2b_ref[...].astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                nx_hi = jax.lax.dot_general(
                    (u2_ref[...] * zz_hi[:, :TQR]).astype(jnp.bfloat16),
                    v2b_ref[...].astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                w_k1 = (nx_lo.astype(jnp.int32)
                        + (nx_hi.astype(jnp.int32) << 8))
                off = (3 * (lane % q)) % 16
                flags = ((w_k >> off) | (w_k1 << (16 - off))) & 7
            else:
                sh = flag_bits * (lane % q) % (flag_bits * per_word)
                flags = (w_k >> sh) & ((1 << flag_bits) - 1)

            # --- token positions -----------------------------------
            pw = _flag_pw(flags, flag_bits)
            intra = _lane_seg_cumsum(pw, q) - pw
            pos0 = boffq_sl + sig_words + intra
            rel0 = pos0 - base

            zz0l, zz0h = _extract(wt, rel0, pw >= 1, tw)
            w0 = _fold(zz0l, zz0h, dr_ref[...], dc_ref[...], TQR)
            zz1l, zz1h = _extract(wt, rel0 + 1, pw == 2, tw)
            w1 = _fold(zz1l, zz1h, dr_ref[...], dc_ref[...], TQR)

            sl = slice(t * TQR, (t + 1) * TQR)
            out_f[0, sl, :] = flags
            out_w0[0, sl, :] = w0
            out_w1[0, sl, :] = w1

    return kernel


@functools.partial(jax.jit, static_argnames=("q", "sig_words",
                                             "flag_bits", "interpret"))
def unpack(words, woff, *, q, sig_words, flag_bits, interpret=False):
    """Extract (flags, w0, w1) token lattices from compressed streams.

    words: (S, W) uint32 halfword values; woff: (S, NB) int32 block
    word offsets (monotone over real blocks; anything after them must
    be zero-padded).  NB*q must be a multiple of 16384.
    Returns (flags, w0, w1), each (S, NB*q) int32.

    The per-group input windows are materialized by XLA (row-granular
    dynamic slices -- cheap contiguous copies) rather than DMA'd
    manually inside the kernel: on the axon-tunneled v5e, manual
    ANY-space DMAs combined with multiple pipelined buffers faulted
    the TPU worker, while the all-blocked pipeline (the pack.py /
    bigsort.py pattern) is solid.
    """
    S, W = words.shape
    NB = woff.shape[1]
    N = NB * q
    assert N % GQ == 0, N
    n_groups = N // GQ
    nbg, span, wrows, nbt, tw, srows_g, srows_t = _geom(q, sig_words)

    # pad the word array to whole 128-lane rows and >= one window
    wr_total = max(-(-W // 128), wrows)
    pad = wr_total * 128 - W
    wpad = jnp.pad(words.astype(jnp.int32), ((0, 0), (0, pad)))
    w3 = wpad.reshape(S, wr_total, 128)

    # per-group windows + window-relative positions (prepared in XLA)
    row_start = jnp.clip(woff[:, ::nbg] // 128, 0, wr_total - wrows)

    def slice_windows(w3s, rss):
        return jax.vmap(lambda r: jax.lax.dynamic_slice(
            w3s, (r, 0), (wrows, 128)))(rss)

    windows = jax.vmap(slice_windows)(w3, row_start)  # (S,G,wrows,128)
    windows = windows.reshape(S, n_groups * wrows, 128)

    base_q = jnp.repeat(row_start * 128, GQ, axis=1)
    boffq = (jnp.repeat(woff, q, axis=1) - base_q).reshape(
        S, N // 128, 128)
    base_s = jnp.repeat(row_start * 128, nbg * sig_words, axis=1)
    sigpos = (jnp.repeat(woff, sig_words, axis=1)
              + jnp.tile(jnp.arange(sig_words, dtype=woff.dtype),
                         (1, NB))
              - base_s).reshape(S, NB * sig_words // 128, 128)

    mats = _fold_mats(q, sig_words, flag_bits)
    kernel = _make_kernel(q, sig_words, flag_bits)

    const_specs = [
        pl.BlockSpec(mats["dr"].shape, lambda s, g: (0, 0)),
        pl.BlockSpec(mats["dc"].shape, lambda s, g: (0, 0)),
        pl.BlockSpec(mats["u2"].shape, lambda s, g: (0, 0)),
        pl.BlockSpec(mats["v2"].shape, lambda s, g: (0, 0)),
    ]
    const_vals = [jnp.asarray(mats["dr"]), jnp.asarray(mats["dc"]),
                  jnp.asarray(mats["u2"]), jnp.asarray(mats["v2"])]
    if flag_bits == 3:
        const_specs.append(
            pl.BlockSpec(mats["v2b"].shape, lambda s, g: (0, 0)))
        const_vals.append(jnp.asarray(mats["v2b"]))

    out = pl.pallas_call(
        kernel,
        grid=(S, n_groups),
        in_specs=[
            pl.BlockSpec((1, wrows, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, QROWS, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, srows_g, 128), lambda s, g: (s, g, 0)),
        ] + const_specs,
        out_specs=[pl.BlockSpec((1, QROWS, 128), lambda s, g: (s, g, 0))
                   ] * 3,
        out_shape=[jax.ShapeDtypeStruct((S, N // 128, 128), jnp.int32)
                   ] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(windows, boffq, sigpos, *const_vals)
    flags, w0, w1 = (o.reshape(S, N) for o in out)
    return flags, w0, w1
