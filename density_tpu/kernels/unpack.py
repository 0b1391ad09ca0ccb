"""Pallas block-stream unpack kernels (decode token extraction).

The decode mirror of kernels/pack.py: turns compressed block streams
into dense per-quad (flags, w0, w1) token lattices with NO XLA gathers
and NO per-token one-hot matmuls.  Everything rides two routing
primitives built from log-many conditional flat shifts (VPU rolls):

  * compact-left: move kept elements left by h = #dropped-before
    (LSB->MSB conditional shifts, elements carry their remaining h);
  * expand-right: move live elements right by a per-SOURCE displacement
    (the exact reverse schedule, MSB->LSB).

Both are exact for the monotone displacements this layout produces
(verified against brute force; tests/test_unpack_decode.py).  The
work splits into two kernels with a thin XLA stage between them (the
middle stage is dense bit math; keeping it in XLA sidesteps in-kernel
relayouts Mosaic cannot compile):

  kernel 1 (per stream x quad-group):
    a. route block-start markers into the window (expand-right from
       the block-index domain) and smear them sig_words wide;
    b. compact-left the window by the signature mask -> signature
       words in block-major order;
    c. compact-left the window by the payload mask -> the payload
       halfword stream `comp` (sig-stripped).
  XLA: signature words -> per-quad flags (reference bit order
    write_signature.rs:14-17; lion's 6-byte straddle lion.rs:334-351),
    payload sizes pw (plain=2, map=1, predicted=0 -- chameleon.rs:18-22,
    cheetah.rs:19-21, lion.rs:19-25), intra-block prefix sums ->
    every token's position c(t) in `comp`.
  kernel 2: expand-right token markers to positions c(t); one final
    compact-left of (comp, comp<<1word) by those markers yields w0/w1
    aligned to the token lattice.

Copy blocks (blowup protection, protection_state.rs) need no separate
path: they are modeled as 2*Q raw halfword tokens starting at the
block offset (no signature), so their payload flows through the same
routing and w0/w1 hold the raw words -- the caller's interleave stage
needs no copy-block gather at all.

Layout being decoded (reference: src/codec/codec.rs:82-126): each
block is [signature][payload halfwords...]; block word offsets come
from the host stream scanner.
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


def _geom(q: int, sig_words: int):
    """Static geometry for one codec."""
    nbg = GQ // q                      # blocks per group
    span = sig_words + 2 * q + 2       # max words per block (+ragged)
    wrows = -(-(-(-nbg * span // 128) + 2) // 8) * 8  # window rows
    srows = max(8, nbg * sig_words // 128)  # sig rows (8-aligned)
    brows = max(8, -(-nbg // 128))     # block-index rows (8-aligned)
    return nbg, span, wrows, srows, brows


# ---------------------------------------------------------------------------
# flat-shift routing primitives (2D (rows, 128) arrays, row-major flat
# order; shifts fill with `fill`)
# ---------------------------------------------------------------------------

def _fshift(x, s: int, fill):
    """Flat shift right by s (s may be negative = left)."""
    rows = x.shape[0]
    if s == 0:
        return x
    flat = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, x.shape, 1))
    n = rows * 128
    if s > 0:
        a, b = divmod(s, 128)
        y = x
        if b:
            y = pltpu.roll(y, b, axis=1)
            yp = pltpu.roll(y, 1, axis=0)
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            y = jnp.where(lane >= b, y, yp)
        if a:
            y = pltpu.roll(y, a, axis=0)
        return jnp.where(flat >= s, y, fill)
    s = -s
    a, b = divmod(s, 128)
    y = x
    if b:
        y = pltpu.roll(y, 128 - b, axis=1)
        yn = pltpu.roll(y, rows - 1, axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        y = jnp.where(lane < 128 - b, y, yn)
    if a:
        y = pltpu.roll(y, rows - a, axis=0)
    return jnp.where(flat < n - s, y, fill)


def _flat_cumsum_excl(x):
    """Exclusive flat cumsum of x (rows, 128) int32."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    sh = 1
    while sh < 128:
        acc = acc + jnp.where(lane >= sh,
                              pltpu.roll(acc, sh, axis=1), 0)
        sh *= 2
    rows = x.shape[0]
    tot = acc[:, 127:128]  # inclusive row totals
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    ro = jnp.where(r >= 1, pltpu.roll(tot, 1, axis=0), 0)
    sh = 1
    while sh < rows:
        ro = ro + jnp.where(r >= sh + 1, pltpu.roll(ro, sh, axis=0), 0)
        sh *= 2
    return ro + acc - x


def _compact_left(arrays, h, keep, max_disp: int):
    """Move kept elements left by h = #dropped-before (precomputed).
    arrays: list of (rows,128) i32 value arrays; h only meaningful
    where keep.  Returns routed arrays + arrival mask."""
    hh = jnp.where(keep, h, -1)
    K = max(1, (max_disp).bit_length())
    vs = list(arrays)
    for k in range(K):
        s = 1 << k
        yh = _fshift(hh, -s, jnp.int32(-1))
        yv = [_fshift(v, -s, jnp.int32(0)) for v in vs]
        take = (yh >= 0) & (((yh >> k) & 1) == 1)
        stay = (hh >= 0) & (((hh >> k) & 1) == 0)
        vs = [jnp.where(take, y, jnp.where(stay, v, 0))
              for y, v in zip(yv, vs)]
        hh = jnp.where(take, yh - s, jnp.where(stay, hh, -1))
    return vs, hh == 0


def _expand_right(arrays, e, live, max_disp: int):
    """Move live elements right by per-source displacement e
    (nondecreasing over live sources, distinct destinations)."""
    hh = jnp.where(live, e, -1)
    K = max(1, (max_disp).bit_length())
    vs = list(arrays)
    for k in reversed(range(K)):
        s = 1 << k
        yh = _fshift(hh, s, jnp.int32(-1))
        yv = [_fshift(v, s, jnp.int32(0)) for v in vs]
        take = (yh >= 0) & (((yh >> k) & 1) == 1)
        stay = (hh >= 0) & (((hh >> k) & 1) == 0)
        vs = [jnp.where(take, y, jnp.where(stay, v, 0))
              for y, v in zip(yv, vs)]
        hh = jnp.where(take, yh - s, jnp.where(stay, hh, -1))
    return vs, hh == 0


# Packed variants: every payload is a 16-bit value (low halfword), so
# the routing displacement rides the HIGH 16 bits of the first array
# and each pass shifts len(arrays) arrays instead of len(arrays)+1 --
# the same diet bigsort/packroute got in r5 (fewer carried operands is
# the whole cost model of these shift networks).  hh == 0xFFFF is the
# 'dropped' sentinel, so max_disp must be <= 0xFFFE (the unpack
# windows are < 40k words for every codec).

_SENT16 = -65536  # hh = 0xFFFF, value = 0


def _w16(v: int) -> int:
    """Python int -> int32 two's-complement value (jnp literals must
    fit int32; (1 << 15) << 16 wraps to the sign bit)."""
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _compact_left16(arrays, h, keep, max_disp: int):
    """_compact_left for 16-bit payloads (displacement packed into
    arrays[0]'s high halfword).  Dropped/empty positions return 0."""
    assert max_disp <= 0xFFFE, max_disp
    w0 = jnp.where(keep, (h << 16) | (arrays[0] & 0xFFFF),
                   jnp.int32(_SENT16))
    rest = [jnp.where(keep, v, 0) for v in arrays[1:]]
    K = max(1, (max_disp).bit_length())
    for k in range(K):
        s = 1 << k
        y0 = _fshift(w0, -s, jnp.int32(_SENT16))
        yr = [_fshift(v, -s, jnp.int32(0)) for v in rest]
        yh = (y0 >> 16) & 0xFFFF
        hh = (w0 >> 16) & 0xFFFF
        take = (yh != 0xFFFF) & (((yh >> k) & 1) == 1)
        stay = (hh != 0xFFFF) & (((hh >> k) & 1) == 0)
        w0 = jnp.where(take, y0 - _w16(s << 16),
                       jnp.where(stay, w0, jnp.int32(_SENT16)))
        rest = [jnp.where(take, y, jnp.where(stay, v, 0))
                for y, v in zip(yr, rest)]
    arrived = ((w0 >> 16) & 0xFFFF) == 0
    return ([jnp.where(arrived, w0 & 0xFFFF, 0)]
            + [jnp.where(arrived, v, 0) for v in rest]), arrived


def _expand_right16(arrays, e, live, max_disp: int):
    """_expand_right for 16-bit payloads (displacement packed)."""
    assert max_disp <= 0xFFFE, max_disp
    w0 = jnp.where(live, (e << 16) | (arrays[0] & 0xFFFF),
                   jnp.int32(_SENT16))
    rest = [jnp.where(live, v, 0) for v in arrays[1:]]
    K = max(1, (max_disp).bit_length())
    for k in reversed(range(K)):
        s = 1 << k
        y0 = _fshift(w0, s, jnp.int32(_SENT16))
        yr = [_fshift(v, s, jnp.int32(0)) for v in rest]
        yh = (y0 >> 16) & 0xFFFF
        hh = (w0 >> 16) & 0xFFFF
        take = (yh != 0xFFFF) & (((yh >> k) & 1) == 1)
        stay = (hh != 0xFFFF) & (((hh >> k) & 1) == 0)
        w0 = jnp.where(take, y0 - _w16(s << 16),
                       jnp.where(stay, w0, jnp.int32(_SENT16)))
        rest = [jnp.where(take, y, jnp.where(stay, v, 0))
                for y, v in zip(yr, rest)]
    arrived = ((w0 >> 16) & 0xFFFF) == 0
    return ([jnp.where(arrived, w0 & 0xFFFF, 0)]
            + [jnp.where(arrived, v, 0) for v in rest]), arrived


def _make_kernel1(q, sig_words):
    nbg, span, wrows, srows, brows = _geom(q, sig_words)
    nwin = wrows * 128

    def kernel(window_ref, wofff_ref, cpf_ref, out_sig, out_comp):
        window = window_ref[0]
        flat_w = (jax.lax.broadcasted_iota(jnp.int32, (wrows, 128), 0)
                  * 128
                  + jax.lax.broadcasted_iota(jnp.int32, (wrows, 128), 1))

        # --- pass 0: block-start markers into the window domain -----
        wf = wofff_ref[0]   # (brows, 128) flat block offsets (rebased)
        cf = cpf_ref[0]     # (brows, 128) copy flags
        bflat = (jax.lax.broadcasted_iota(jnp.int32, (brows, 128), 0)
                 * 128
                 + jax.lax.broadcasted_iota(jnp.int32, (brows, 128), 1))
        e0 = jnp.concatenate(
            [wf - bflat, jnp.zeros((wrows - brows, 128), jnp.int32)],
            axis=0)
        live0 = jnp.concatenate(
            [(wf >= 0) & (bflat < nbg),
             jnp.zeros((wrows - brows, 128), jnp.bool_)], axis=0)
        cf_pad = jnp.concatenate(
            [cf, jnp.zeros((wrows - brows, 128), jnp.int32)], axis=0)
        (cp_w,), arrived = _expand_right16([cf_pad], e0, live0,
                                           nwin - 1)
        start_all = arrived
        start_nc = arrived & (cp_w == 0)

        # smear sig_words wide (copy blocks get pseudo-signature reads
        # so the block-major signature layout stays dense; their flags
        # are overridden by the XLA stage); both marker sets ride one
        # shifted word (bit0 = any start, bit1 = non-copy start)
        both = start_all.astype(jnp.int32) | (start_nc.astype(jnp.int32)
                                              << 1)
        acc = both
        for i in range(1, sig_words):
            acc = acc | _fshift(both, i, 0)
        sig_keep = (acc & 1) == 1
        sig_drop = (acc & 2) == 2

        w0s = jnp.clip(wofff_ref[0, 0, 0], 0, nwin - 1)
        in_block = flat_w >= w0s
        pay_keep = in_block & ~sig_drop

        # --- pass 1: signature words ---------------------------------
        h_sig = _flat_cumsum_excl((~sig_keep).astype(jnp.int32))
        (sig_c,), _ = _compact_left16([window], h_sig, sig_keep,
                                      nwin - 1)
        out_sig[0] = sig_c[0:srows, :]

        # --- pass 2: payload stream ----------------------------------
        h_pay = _flat_cumsum_excl((~pay_keep).astype(jnp.int32))
        (comp,), _ = _compact_left16([window], h_pay, pay_keep,
                                     nwin - 1)
        out_comp[0] = comp

    return kernel


def _make_kernel2(q, sig_words):
    nbg, span, wrows, srows, brows = _geom(q, sig_words)
    nwin = wrows * 128

    def kernel(comp_ref, c3_ref, out_w0, out_w1):
        comp = comp_ref[0]
        c3 = c3_ref[0]          # (QROWS, 128); -1 marks no-payload
        live = c3 >= 0

        # token -> payload-position routing in two monotone hops:
        # compact to the live-token RANK domain (displacement
        # #no-payload-before, nondecreasing), then expand by
        # c(rank) - rank (= #2-word tokens before, nondecreasing) --
        # the direct c(t) - t displacement is sign-mixed once 0-payload
        # (predicted) tokens exist.  The compact and the final expand
        # run on the TOKEN rows only (ranks and token destinations
        # never exceed GQ); only the rank -> payload-position hop
        # spans the full window.
        flat_q = (jax.lax.broadcasted_iota(jnp.int32, (QROWS, 128), 0)
                  * 128
                  + jax.lax.broadcasted_iota(jnp.int32, (QROWS, 128), 1))
        h1 = _flat_cumsum_excl((~live).astype(jnp.int32))
        (c_r, t_r), rankm = _compact_left16([c3, flat_q], h1, live,
                                            GQ - 1)
        pad = jnp.zeros((wrows - QROWS, 128), jnp.int32)
        c_rw = jnp.concatenate([c_r, pad], axis=0)
        rankmw = jnp.concatenate([rankm, pad.astype(jnp.bool_)], axis=0)
        flat_w = (jax.lax.broadcasted_iota(jnp.int32, (wrows, 128), 0)
                  * 128
                  + jax.lax.broadcasted_iota(jnp.int32, (wrows, 128), 1))
        e2 = c_rw - flat_w
        _, keep0 = _expand_right([], e2, rankmw & (e2 >= 0), nwin - 1)

        # (w0, w1) ride one i32 as a packed halfword pair: the pair
        # compact and the final expand move ONE value array each
        comp1 = _fshift(comp, -1, jnp.int32(0))
        pair = (comp & 0xFFFF) | (comp1 << 16)
        h0 = _flat_cumsum_excl((~keep0).astype(jnp.int32))
        (pair_r,), _ = _compact_left([pair], h0, keep0, nwin - 1)
        # rank order -> token lattice (displacement #no-payload-before)
        et = t_r - flat_q
        (pair_t,), _ = _expand_right([pair_r[0:QROWS, :]], et,
                                     rankm & (et >= 0), GQ - 1)
        out_w0[0] = jnp.where(live, pair_t & 0xFFFF, 0)
        out_w1[0] = jnp.where(live, (pair_t >> 16) & 0xFFFF, 0)

    return kernel


def flags_from_sig(sig3, q, sig_words, flag_bits):
    """Per-quad flags from block-major signature words.
    sig3: (S, NB, sig_words) int32.  Dense/static selects only."""
    S, NB, _ = sig3.shape
    qq = jnp.arange(q, dtype=jnp.int32)
    if flag_bits == 3:
        bitpos = 3 * qq
        wi = bitpos // 16
        off = bitpos % 16
        lo = sum(jnp.where(wi[None, None, :] == k, sig3[:, :, k:k + 1], 0)
                 for k in range(sig_words))
        hi = sum(jnp.where(wi[None, None, :] + 1 == k,
                           sig3[:, :, k:k + 1], 0)
                 for k in range(sig_words))
        flags = ((lo >> off[None, None, :])
                 | (hi << (16 - off)[None, None, :])) & 7
    else:
        per_word = 16 // flag_bits
        wi = qq // per_word
        wsel = sum(jnp.where(wi[None, None, :] == k,
                             sig3[:, :, k:k + 1], 0)
                   for k in range(sig_words))
        sh = flag_bits * (qq % per_word)
        flags = (wsel >> sh[None, None, :]) & ((1 << flag_bits) - 1)
    return flags.reshape(S, NB * q)


def flag_payload_words(flags, flag_bits):
    """flag -> payload halfwords: plain(0)->2, map->1, predicted->0
    (reference: chameleon.rs:18-22, cheetah.rs:19-21, lion.rs:19-25)."""
    if flag_bits == 1:
        return jnp.where(flags == 0, 2, 1)
    if flag_bits == 2:
        return jnp.where(flags == 0, 2, jnp.where(flags == 3, 0, 1))
    return jnp.where(flags == 0, 2, jnp.where(flags >= 6, 1, 0))


@functools.partial(jax.jit, static_argnames=("q", "sig_words",
                                             "flag_bits", "interpret"))
def unpack(words, woff, is_copy=None, *, q, sig_words, flag_bits,
           interpret=False):
    """Extract (flags, w0, w1) token lattices from compressed streams.

    words: (S, W) uint32 halfword values; woff: (S, NB) int32 block
    word offsets (monotone over real blocks); is_copy: (S, NB) bool or
    None.  Blocks after the real end must have woff < 0 (sentinel).
    NB*q must be a multiple of 16384.
    Returns (flags, w0, w1), each (S, NB*q) int32.  Copy blocks yield
    flags == 0 and w0/w1 == their raw halfword pairs.
    """
    S, W = words.shape
    NB = woff.shape[1]
    N = NB * q
    assert N % GQ == 0, N
    n_groups = N // GQ
    nbg, span, wrows, srows, brows = _geom(q, sig_words)

    if is_copy is None:
        is_copy = jnp.zeros((S, NB), jnp.bool_)

    # pad the word array to whole 128-lane rows and >= one window
    wr_total = max(-(-W // 128), wrows)
    pad = wr_total * 128 - W
    wpad = jnp.pad(words.astype(jnp.int32), ((0, 0), (0, pad)))
    w3 = wpad.reshape(S, wr_total, 128)

    # per-group windows (XLA row-granular dynamic slices) + rebased
    # offsets; dead blocks keep a negative sentinel
    woff_first = jnp.where(woff[:, ::nbg] < 0, 0, woff[:, ::nbg])
    row_start = jnp.clip(woff_first // 128, 0, wr_total - wrows)

    def slice_windows(w3s, rss):
        return jax.vmap(lambda r: jax.lax.dynamic_slice(
            w3s, (r, 0), (wrows, 128)))(rss)

    windows = jax.vmap(slice_windows)(w3, row_start)
    windows = windows.reshape(S, n_groups * wrows, 128)

    base = jnp.repeat(row_start * 128, nbg, axis=1)
    woff_rel = jnp.where(woff < 0, jnp.int32(-(1 << 20)), woff - base)
    nbf = brows * 128
    wofff = jnp.pad(woff_rel.reshape(S, n_groups, nbg),
                    ((0, 0), (0, 0), (0, nbf - nbg))
                    ).reshape(S, n_groups * brows, 128)
    cpf = jnp.pad(is_copy.astype(jnp.int32).reshape(S, n_groups, nbg),
                  ((0, 0), (0, 0), (0, nbf - nbg))
                  ).reshape(S, n_groups * brows, 128)

    sig_lat, comp = pl.pallas_call(
        _make_kernel1(q, sig_words),
        grid=(S, n_groups),
        in_specs=[
            pl.BlockSpec((1, wrows, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, brows, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, brows, 128), lambda s, g: (s, g, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, srows, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, wrows, 128), lambda s, g: (s, g, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, n_groups * srows, 128), jnp.int32),
            jax.ShapeDtypeStruct((S, n_groups * wrows, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(windows, wofff, cpf)

    # ---- XLA middle stage: flags + token positions -----------------
    sig3 = (sig_lat.reshape(S, n_groups, srows * 128)
            [:, :, :nbg * sig_words]
            .reshape(S, NB, sig_words))
    flags = flags_from_sig(sig3, q, sig_words, flag_bits)
    cp_q = jnp.repeat(is_copy, q, axis=1)
    dead_q = jnp.repeat(woff < 0, q, axis=1)
    flags = jnp.where(cp_q | dead_q, 0, flags)
    pw = jnp.where(dead_q, 0,
                   jnp.where(cp_q, 2, flag_payload_words(flags,
                                                         flag_bits)))
    pw3 = pw.reshape(S, n_groups, GQ)
    c3 = jnp.cumsum(pw3, axis=2) - pw3          # group-local excl
    c_in = jnp.where(pw3 >= 1, c3, -1).reshape(
        S, n_groups * QROWS, 128)

    w0, w1 = pl.pallas_call(
        _make_kernel2(q, sig_words),
        grid=(S, n_groups),
        in_specs=[
            pl.BlockSpec((1, wrows, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, QROWS, 128), lambda s, g: (s, g, 0)),
        ],
        out_specs=[pl.BlockSpec((1, QROWS, 128), lambda s, g: (s, g, 0))
                   ] * 2,
        out_shape=[jax.ShapeDtypeStruct((S, N // 128, 128), jnp.int32)
                   ] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(comp, c_in)
    return flags, w0.reshape(S, N), w1.reshape(S, N)
