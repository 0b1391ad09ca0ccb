"""Routing-network pack kernel (encode-side assembly, v2).

The r3 one-hot/MXU pack kernel (kernels/pack.py) measured 15.2 ms of
chameleon's 23.2 ms device encode at 10 MB -- two thirds of encode is
payload placement. This module assembles the same block streams with
the shift-routing primitives that already carried decode's unpack to
3.2 ms (kernels/unpack.py): every placement here is a MONOTONE routing
-- destinations strictly increase with source order -- so three
compact/expand passes place everything:

  pass A  w0 halfwords of live tokens  -> dest(t)   = block word
          offset + sig_words + intra-block payload prefix
  pass B  w1 halfwords of 2-word tokens -> dest(t)+1
  pass C  signature words (block-major lattice, packed in XLA by the
          per-codec sig_pack) -> block word offset + word index

The three routed windows OR together (destinations are disjoint), and
the group window ORs into the output at the running word base (the
groups of one stream pack back-to-back at word granularity): a
dynamic flat shift by base%128 lanes + a dynamic-row write, with the
base carried in SMEM across the sequential group grid -- the same
group-chaining contract as kernels/pack.py.

Ragged tails (the final 1-3 bytes, reference codec.rs:58-62) are NOT
placed here: the partial quad has pw == 0, and the caller stamps the
raw halfwords after the kernel (layout.fused_pallas_batched), exactly
as it already sizes them into the totals.

Output contract matches kernels/pack.py: (S, W) uint32 halfword
lattice, groups packed at their cumulative word offsets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from density_tpu.kernels.unpack import (
    GQ, QROWS, _compact_left, _expand_right, _flat_cumsum_excl, _fshift,
    _geom)


def _monotone_place(vals, dest, live, out_rows):
    """Route vals[t] (flat (src_rows,128)) to strictly-increasing
    destinations dest[t] over live t: compact to the rank domain, then
    expand by dest(rank) - rank (nondecreasing). Returns the routed
    (out_rows, 128) window (zeros elsewhere).

    The cumsum + compact run on the SOURCE rows only (ranks never
    exceed the live-source count), and the rank domain is zero-padded
    up to the output window for the expand -- for the 8-row signature
    lattice this trims the compact from 272 window rows to 8.

    An element whose routed displacement comes out negative is DROPPED
    silently (`rankm & (e >= 0)`); that can only happen when the
    destination-monotonicity invariant is violated upstream. Callers /
    tests can verify the invariant explicitly with
    `check_route_invariants` (host-level, no production cost)."""
    src_rows = vals.shape[0]
    nwin = out_rows * 128
    h = _flat_cumsum_excl((~live).astype(jnp.int32))
    (v_r, d_r), rankm = _compact_left([vals, dest], h, live,
                                      src_rows * 128 - 1)
    if out_rows > src_rows:
        z = jnp.zeros((out_rows - src_rows, 128), jnp.int32)
        v_r = jnp.concatenate([v_r, z], axis=0)
        d_r = jnp.concatenate([d_r, z], axis=0)
        rankm = jnp.concatenate([rankm, z.astype(jnp.bool_)], axis=0)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (out_rows, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (out_rows, 128), 1))
    e = d_r - flat
    (v_w,), placed = _expand_right([v_r], e, rankm & (e >= 0), nwin - 1)
    return jnp.where(placed, v_w, 0)


def check_route_invariants(flags, pw, nbytes, *, q, sig_words, block,
                           flag_bits):
    """Verify the pack kernel's routing preconditions on the host: per
    (stream, group), token destinations must be strictly increasing
    over live tokens and non-negative relative to the group base, and
    signature destinations must interleave consistently. Returns True
    when every element the kernel would route arrives (nothing would
    be silently dropped by `_monotone_place`); use in tests / debug
    runs -- the production kernel does not pay for this.
    """
    import numpy as np
    S, N = pw.shape
    nb = N // q
    n_groups = N // GQ
    nbg = GQ // q
    pwn = np.asarray(pw)
    nbn = np.asarray(nbytes)
    pwb = pwn.reshape(S, nb, q)
    blk_pay = pwb.sum(axis=2)
    nbr = (nbn + block - 1) // block
    bidx = np.arange(nb)[None, :]
    real_blk = bidx < nbr[:, None]
    blk_words = np.where(real_blk, blk_pay + sig_words, 0)
    blk_off = np.cumsum(blk_words, axis=1) - blk_words
    intra = np.cumsum(pwb, axis=2) - pwb
    dest = (blk_off[:, :, None] + sig_words + intra).reshape(S, N)
    gbase = blk_off[:, ::nbg]
    dest = dest - np.repeat(gbase, GQ, axis=1)
    live = pwn >= 1
    ok = True
    for s in range(S):
        for g in range(n_groups):
            d = dest[s, g * GQ:(g + 1) * GQ][live[s, g * GQ:(g + 1) * GQ]]
            if d.size and (np.any(np.diff(d) <= 0) or d[0] < 0):
                ok = False
    return ok


def _make_kernel(q, sig_words):
    nbg, span, wrows, srows, brows = _geom(q, sig_words)

    def kernel(gw_ref, pw_ref, w0_ref, w1_ref, dest_ref, sig_ref,
               sigdest_ref, out_ref, base_ref):
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            base_ref[0] = 0
            out_ref[0] = jnp.zeros((out_ref.shape[1], 128), jnp.uint32)

        pw = pw_ref[0]
        w0 = w0_ref[0]
        w1 = w1_ref[0]
        dest = dest_ref[0]

        win = _monotone_place(w0, dest, pw >= 1, wrows)
        win = win | _monotone_place(w1, dest + 1, pw == 2, wrows)

        win = win | _monotone_place(sig_ref[0], sigdest_ref[0],
                                    sigdest_ref[0] >= 0, wrows)

        # OR the group window into the output at the running word base
        base = base_ref[0]
        lane = base % 128
        row0 = base // 128
        # dynamic lane shift: 7 conditional power-of-two flat shifts
        sh = win
        for k in range(7):
            s = 1 << k
            sh = jnp.where((lane & s) != 0, _fshift(sh, s, jnp.int32(0)),
                           sh)
        cur = out_ref[0, pl.ds(row0, wrows), :]
        out_ref[0, pl.ds(row0, wrows), :] = cur | sh.astype(jnp.uint32)
        base_ref[0] = base + gw_ref[pl.program_id(0), g]

    return kernel


@functools.partial(jax.jit, static_argnames=("q", "sig_words", "block",
                                             "flag_bits", "interpret"))
def pack(flags, pw, w0, w1, nbytes, *, q, sig_words, block, flag_bits,
         interpret=False):
    """Drop-in for kernels/pack.pack (same signature/contract), with
    sig packing + destination prefix sums in XLA and placement in the
    routing kernel. N must be a multiple of GQ (16384)."""
    import importlib
    S, N = flags.shape
    assert N % GQ == 0, N
    n_groups = N // GQ
    nb = N // q
    nbg, span, wrows, srows, brows = _geom(q, sig_words)

    # per-codec signature words (block-major), dense XLA bit math
    name = {1: "chameleon", 2: "cheetah", 3: "lion"}[flag_bits]
    mod = importlib.import_module(f"density_tpu.codecs.{name}")
    sig3 = jax.vmap(lambda f: mod.sig_pack(f.reshape(nb, q)))(
        flags).astype(jnp.int32)                       # (S, nb, sigw)

    # block word offsets (global, exclusive) and token destinations;
    # padding blocks (beyond the real block count) contribute nothing
    pwb = pw.reshape(S, nb, q)
    blk_pay = pwb.sum(axis=2)                          # payload words
    nbr = ((nbytes + block - 1) // block).astype(jnp.int32)
    bidx = jnp.arange(nb, dtype=jnp.int32)[None, :]
    real_blk = bidx < nbr[:, None]
    blk_words = jnp.where(real_blk, blk_pay + sig_words, 0)
    blk_off = (jnp.cumsum(blk_words, axis=1) - blk_words).astype(
        jnp.int32)                                     # (S, nb)
    intra = (jnp.cumsum(pwb, axis=2) - pwb).astype(jnp.int32)
    dest = (blk_off[:, :, None] + sig_words + intra).reshape(S, N)
    # rebase every destination to its group's first-block offset
    gbase = blk_off[:, ::nbg]                          # (S, n_groups)
    dest = dest - jnp.repeat(gbase, GQ, axis=1)
    gw = (jnp.sum(blk_words.reshape(S, n_groups, nbg), axis=2)
          .astype(jnp.int32))                          # words per group

    # signature lattice + destinations, block-major, srows rows/group
    sig_flat = sig3.reshape(S, n_groups, nbg * sig_words)
    sdest = (blk_off.reshape(S, n_groups, nbg)[:, :, :, None]
             - gbase[:, :, None, None]
             + jnp.arange(sig_words, dtype=jnp.int32)
             ).reshape(S, n_groups, nbg * sig_words)
    # padding blocks share blk_off with the stream end: mask them out
    # or their zero sigs would overwrite the ragged tail words
    real_sig = jnp.repeat(real_blk.reshape(S, n_groups, nbg),
                          sig_words, axis=2).reshape(
        S, n_groups, nbg * sig_words)
    sdest = jnp.where(real_sig, sdest, -1)
    spad = srows * 128 - nbg * sig_words
    sig_lat = jnp.pad(sig_flat, ((0, 0), (0, 0), (0, spad))).reshape(
        S, n_groups * srows, 128)
    sdest_lat = jnp.pad(sdest, ((0, 0), (0, 0), (0, spad)),
                        constant_values=-1).reshape(
        S, n_groups * srows, 128)

    wout = 2 * N + nb * sig_words
    orows = (wout + 127) // 128 + wrows

    out3 = pl.pallas_call(
        _make_kernel(q, sig_words),
        grid=(S, n_groups),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                # gw
            pl.BlockSpec((1, QROWS, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, QROWS, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, QROWS, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, QROWS, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, srows, 128), lambda s, g: (s, g, 0)),
            pl.BlockSpec((1, srows, 128), lambda s, g: (s, g, 0)),
        ],
        out_specs=pl.BlockSpec((1, orows, 128), lambda s, g: (s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((S, orows, 128), jnp.uint32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gw,
      pw.astype(jnp.int32).reshape(S, N // 128, 128),
      w0.astype(jnp.int32).reshape(S, N // 128, 128),
      w1.astype(jnp.int32).reshape(S, N // 128, 128),
      dest.astype(jnp.int32).reshape(S, N // 128, 128),
      sig_lat, sdest_lat)
    out = out3.reshape(S, orows * 128)
    # ragged tail: the caller stamped the raw halfwords into w0/w1 at
    # the partial-quad index (pw == 0 there, so the kernel skipped
    # them); place them after the final block's payload
    # (reference: codec.rs:58-62)
    Wtot = (jnp.sum(pw, axis=1) + nbr * sig_words).astype(jnp.int32)
    ragged = nbytes % 4
    fq = jnp.minimum(nbytes // 4, N - 1)
    rows = jnp.arange(S)
    w0q = w0[rows, fq].astype(jnp.uint32)
    w1q = w1[rows, fq].astype(jnp.uint32)
    r0 = jnp.clip(Wtot, 0, orows * 128 - 1)
    out = out.at[rows, r0].set(
        jnp.where(ragged > 0, w0q, out[rows, r0]))
    r1 = jnp.clip(Wtot + 1, 0, orows * 128 - 1)
    out = out.at[rows, r1].set(
        jnp.where(ragged > 2, w1q, out[rows, r1]))
    return out
