"""Sharded container compression/decompression.

Streams (leading axis) are sharded over the mesh's `streams` axis via
NamedSharding; the jitted vmapped codec cores then run SPMD -- XLA
keeps every per-stream computation local to the device owning it, so
the encode hot loop has zero collectives (SURVEY.md §2b). Results are
gathered in submission order at container assembly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from density_tpu.constants import SPECS
from density_tpu.container import (
    CODEC_IDS, DEFAULT_STREAM_SIZE, build_header, parse_header,
    split_streams)
from density_tpu.engine import layout
from density_tpu.errors import DecodeError
from density_tpu.parallel.mesh import default_mesh, stream_sharding


def _codec_mod(codec: str):
    import importlib
    return importlib.import_module(f"density_tpu.codecs.{codec}")


@jax.jit
def _widen(w16):
    """u16 halfwords -> u32, on device. Staging is a u16 host view
    (half the tunnel traffic of u32 staging); the widening is a pure
    convert -- a u8-interleaved staging would need a strided
    de-interleave, which is a ~25 ms relayout on v5e for 10 MB."""
    return w16.astype(jnp.uint32)


def _put(x, sharding):
    """device_put that also works multi-process: when the sharding
    spans non-addressable devices, build the global array from local
    shards of the (host-replicated) numpy value."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    xn = np.asarray(x)
    return jax.make_array_from_callback(xn.shape, sharding,
                                        lambda idx: xn[idx])


def _host_gather(x) -> np.ndarray:
    """Fetch a (possibly multi-process sharded) device array to every
    host, in global (stream) order. Single-process: plain transfer.
    Multi-process: the ordered variable-length gather rides
    multihost_utils.process_allgather (ICI/DCN allgather of the padded
    shards + concatenation in global shard order; SURVEY.md §5
    'distributed communication backend')."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def _stage_streams_u8(buf: np.ndarray, n: int, s_pad: int, cap_bytes: int,
                      stream_size: int) -> np.ndarray:
    """Vectorized host staging: (s_pad, cap_bytes) u8, zero-padded.
    Full streams land via one bulk reshape; only the ragged final
    stream is copied separately."""
    padded = np.zeros((s_pad, cap_bytes), dtype=np.uint8)
    full = n // stream_size
    if full:
        padded[:full, :stream_size] = buf[:full * stream_size].reshape(
            full, stream_size)
    rem = n - full * stream_size
    if rem:
        padded[full, :rem] = buf[full * stream_size:]
    return padded


def _encode_batch_to_parts(codec, buf, offset, n, s_real, s_pad,
                           cap_bytes, stream_size, mesh):
    """Encode s_real streams of `buf[offset:offset+n]` (each stream_size
    bytes, the last possibly short) staged at cap_bytes; returns the
    list of per-stream compressed byte strings."""
    padded = _stage_streams_u8(buf[offset:offset + n], n, s_pad,
                               cap_bytes, stream_size)
    nbytes = np.clip(n - np.arange(s_pad, dtype=np.int64) * stream_size,
                     0, stream_size).astype(np.int32)
    sh = stream_sharding(mesh)
    # stage little-endian u32 quads: a zero-copy host view, same bytes
    # on the wire as u8, and no strided de-interleave on device
    jquads = _put(jnp.asarray(padded.view("<u4")), sh)
    jn = _put(jnp.asarray(nbytes), sh)
    pipe = _codec_mod(codec).PIPELINE
    out_words, totals, converged = layout.run_encode(pipe, jquads, jn)

    totals = _host_gather(totals)
    # ordered gather: one device->host transfer of u16 words (the
    # padded-capacity tail is trimmed per stream below). The slice
    # width is bucketed so the eager slice/astype kernel compiles a
    # bounded number of times (remote compiles are expensive).
    max_words = (int(totals[:s_real].max()) + 1) // 2 if s_real else 0
    max_words = min(layout.bucket_bytes(max(2 * max_words, 2),
                                        SPECS[codec].block_size) // 2,
                    out_words.shape[1])
    out_np = _host_gather(out_words[:, :max_words].astype(jnp.uint16))
    parts = []
    for s in range(s_real):
        if converged:
            t = int(totals[s])
            parts.append(out_np[s, : (t + 1) // 2].tobytes()[:t])
        else:  # pathological stream: exact native fallback
            from density_tpu import native
            lo = offset + s * stream_size
            hi = min(lo + stream_size, offset + n)
            parts.append(native.encode(codec, buf[lo:hi].tobytes()))
    return parts


def compress(data: bytes, codec: str, stream_size: int = DEFAULT_STREAM_SIZE,
             mesh=None) -> bytes:
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    n = buf.size
    if n == 0:
        return build_header(codec, 0, stream_size, [])
    mesh = default_mesh() if mesh is None else mesh
    n_dev = mesh.devices.size
    block = SPECS[codec].block_size

    s_real = split_streams(n, stream_size)
    s_full = n // stream_size
    tail = n - s_full * stream_size

    parts = []
    if s_full:
        s_pad = -(-s_full // n_dev) * n_dev  # even sharding
        cap_bytes = layout.bucket_bytes(stream_size, block)
        parts += _encode_batch_to_parts(codec, buf, 0,
                                        s_full * stream_size, s_full,
                                        s_pad, cap_bytes, stream_size,
                                        mesh)
    if tail:
        # the ragged final stream runs as its own (replicated) dispatch
        # at a capacity bucketed to ITS length -- with large default
        # streams, padding the tail to a full stream would dominate the
        # device work (e.g. 2 MiB of data costing an 8 MiB encode)
        cap_tail = layout.bucket_bytes(tail, block)
        parts += _encode_batch_to_parts(codec, buf, s_full * stream_size,
                                        tail, 1, n_dev, cap_tail,
                                        cap_tail, mesh)
    lengths = [len(p) for p in parts]
    assert len(parts) == s_real
    return build_header(codec, n, stream_size, lengths) + b"".join(parts)


# ---------------------------------------------------------------------------
# Decompression
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("with_copy",))
def _decode_batch_fast_cham(wbytes, in_word_off, is_copy, nb_real,
                            out_len, with_copy=True):
    """Chameleon TPU fast path: Pallas unpack kernel + bigsort map
    resolution (engine/unlayout.py). Exact; always 'ok'."""
    from density_tpu.engine import unlayout
    words = _widen(wbytes)
    out = unlayout.decode_chameleon_batch(
        words, in_word_off, is_copy, nb_real, out_len,
        use_kernel=True, with_copy=with_copy)
    return out, jnp.ones(wbytes.shape[0], bool)


def pick_decode_fn(codec, device_args, any_copy: bool):
    """Host-level dispatch of the batched decode implementation.

    The Pallas fast path needs a single TPU device and a power-of-two
    quad capacity that is a multiple of the unpack group; everything
    else (CPU meshes, multi-device shards, other codecs) takes the XLA
    path. Ragged output tails are not a dispatch criterion: both paths
    rely on `decompress` stamping the final ragged bytes host-side.
    Returns a callable (args...) -> (out_words, ok)."""
    wbytes, woff = device_args[0], device_args[1]
    n_q = woff.shape[1] * SPECS[codec].quads_per_block
    pow2 = n_q >= 16384 and (n_q & (n_q - 1)) == 0
    try:
        devs = wbytes.devices()
        plat = next(iter(devs)).platform
    except Exception:  # noqa: BLE001
        devs, plat = (), ""
    if (codec == "chameleon" and pow2 and n_q % 16384 == 0
            and len(devs) == 1 and plat in ("tpu", "axon")):
        return functools.partial(_decode_batch_fast_cham,
                                 with_copy=any_copy)
    if (codec != "chameleon" and pow2 and len(devs) == 1
            and plat in ("tpu", "axon")):
        # bigsort fixpoint resolve (Pallas segment kernels)
        return functools.partial(_decode_batch_big, codec=codec)
    return functools.partial(_decode_batch, codec=codec)


@functools.partial(jax.jit, static_argnames=("codec",))
def _decode_batch(wbytes, in_word_off, is_copy, nb_real, out_len, codec):
    """Batched parallel decode. Returns (out_words, ok): ok[s] False
    marks a stream whose context fixpoint did not converge (see
    cheetah/lion._resolve_parallel); the caller redecodes those few
    streams with the sequential scanner."""
    words = _widen(wbytes)
    mod = _codec_mod(codec)
    S = wbytes.shape[0]
    if codec == "chameleon":
        out = jax.vmap(mod._decode_core.__wrapped__)(
            words, in_word_off, is_copy, nb_real, out_len)
        return out, jnp.ones(S, bool)

    def one(w, o, c, nbr, ol):
        flags, w0, w1, valid = mod._extract_tokens.__wrapped__(
            w, o, c, nbr, ol)
        quads, ok = mod._resolve_parallel.__wrapped__(flags, w0, w1, valid)
        return mod._assemble.__wrapped__(quads, valid, w, o, c, nbr,
                                         ol), ok

    return jax.vmap(one)(words, in_word_off, is_copy, nb_real, out_len)


@functools.partial(jax.jit, static_argnames=("codec",))
def _decode_batch_big(wbytes, in_word_off, is_copy, nb_real, out_len,
                      codec):
    """Cheetah/lion batched decode with the bigsort resolve: identical
    semantics to _decode_batch, with the fixpoint's lax.sorts replaced
    by Pallas segment-sorter networks (TPU only; the dispatcher
    requires a power-of-two quad capacity)."""
    words = _widen(wbytes)
    mod = _codec_mod(codec)
    flags, w0, w1, valid = jax.vmap(mod._extract_tokens.__wrapped__)(
        words, in_word_off, is_copy, nb_real, out_len)
    quads, ok = mod._resolve_parallel_batched.__wrapped__(
        flags, w0, w1, valid)
    out = jax.vmap(mod._assemble.__wrapped__)(
        quads, valid, words, in_word_off, is_copy, nb_real, out_len)
    return out, ok


def decode_prep(data: bytes, mesh=None):
    """Host-side decode preparation: header parse, native stream scan,
    staging of device inputs. Returns (codec, device_args, streams,
    host_meta) where device_args feed _decode_batch."""
    codec, original_len, stream_size, lengths, off = parse_header(data)
    from density_tpu import native
    mesh = default_mesh() if mesh is None else mesh
    n_dev = mesh.devices.size
    spec = SPECS[codec]
    BLOCK = spec.block_size

    s_real = len(lengths)
    if int(lengths.sum()) != len(data) - off:
        raise DecodeError("stream table does not match payload size")
    s_pad = -(-s_real // n_dev) * n_dev

    # compressed streams can exceed stream_size (copy blocks + sigs)
    cap_bytes = layout.bucket_bytes(
        spec.safe_encode_buffer_size(stream_size) + 2, BLOCK)
    cap_words = cap_bytes // 2
    nb_cap = layout.bucket_bytes(
        -(-stream_size // BLOCK) * BLOCK, BLOCK) // BLOCK

    wbytes = np.zeros((s_pad, cap_words * 2), dtype=np.uint8)
    w16view = wbytes.view("<u2")
    woff = np.zeros((s_pad, nb_cap), dtype=np.int32)
    copyf = np.zeros((s_pad, nb_cap), dtype=bool)
    nb_real = np.zeros(s_pad, dtype=np.int32)
    out_lens = np.clip(
        original_len - np.arange(s_pad, dtype=np.int64) * stream_size,
        0, stream_size).astype(np.int32)

    offsets = off + np.concatenate([[0], np.cumsum(lengths)])
    streams = [data[offsets[s]:offsets[s + 1]] for s in range(s_real)]
    live = [s for s in range(s_real) if streams[s]]
    pred_frac = 0.0
    if live:
        bio, _, bcp, nbs, pred, tot = native.scan_many(
            codec, [streams[s] for s in live], nb_cap)
        for j, s in enumerate(live):
            nb = int(nbs[j])
            nb_real[s] = nb
            woff[s, :nb] = bio[j, :nb] // 2
            copyf[s, :nb] = bcp[j, :nb].astype(bool)
            wbytes[s, :len(streams[s])] = np.frombuffer(
                streams[s], dtype=np.uint8)
        pred_frac = float(pred.sum()) / max(1, int(tot.sum()))

    sh = stream_sharding(mesh)
    device_args = (
        _put(jnp.asarray(w16view), sh),
        _put(jnp.asarray(woff), sh),
        _put(jnp.asarray(copyf), sh),
        _put(jnp.asarray(nb_real), sh),
        _put(jnp.asarray(out_lens), sh))
    host_meta = (original_len, out_lens, copyf, nb_real, s_real,
                 pred_frac)
    return codec, device_args, streams, host_meta


# Above this predicted-token fraction the cheetah/lion context
# fixpoint provably needs more rounds than its cap on typical data
# (it converges ~one position per round through predicted runs, see
# codecs/cheetah._resolve_parallel).  Measured on v5e (r4, 9 x 1 MiB
# streams): the fixpoint CONVERGES up to ~4% (cheetah) / ~1.3% (lion)
# predicted at 0.02-0.04 GB/s and diverges at ~10%, while the host
# C++ pool decodes the same data at 1.5-1.9 GB/s -- so when the
# native runtime is present the pool wins at EVERY fraction and this
# cutoff is moot; it gates the device attempt only when the pool is
# unavailable (no C++ toolchain -- the alternative there is the
# pure-Python scalar oracle at ~1e-3 GB/s, which the device fixpoint
# beats by ~30x wherever it converges).
PREDICTED_DEVICE_CUTOFF = 0.02


def _decode_host_parallel(codec, streams, out_lens, s_real):
    """Exact decode of all streams on the host runtime's thread pool
    (streams are independent; reference decode semantics per stream)."""
    from density_tpu import native
    idx = [s for s in range(s_real) if int(out_lens[s]) > 0]
    parts = native.decode_many(codec, [streams[s] for s in idx],
                               [int(out_lens[s]) for s in idx])
    return b"".join(parts)


def decompress(data: bytes, mesh=None) -> bytes:
    codec, original_len, stream_size, lengths, off = parse_header(data)
    if original_len == 0:
        return b""
    from density_tpu import native
    if (mesh is None and jax.process_count() == 1
            and native.is_available()):
        # Container bytes arrive HOST-side: when the native runtime is
        # present and no explicit mesh was requested, the stream-
        # parallel host pool is the fastest end-to-end decompress for
        # every codec on every measured topology (it skips the
        # host->device->host round trip entirely; on this rig that
        # transfer alone caps e2e at the tunnel bandwidth). The device
        # decode paths remain the story for device-resident pipelines
        # (bench phase D measures them directly), multi-process
        # meshes, and hosts without a C++ toolchain.
        s_real_h = len(lengths)
        if int(lengths.sum()) != len(data) - off:
            raise DecodeError("stream table does not match payload size")
        offsets = off + np.concatenate([[0], np.cumsum(lengths)])
        streams_h = [data[offsets[s]:offsets[s + 1]]
                     for s in range(s_real_h)]
        out_lens_h = np.clip(
            original_len
            - np.arange(s_real_h, dtype=np.int64) * stream_size,
            0, stream_size)
        out = _decode_host_parallel(codec, streams_h, out_lens_h,
                                    s_real_h)
        if len(out) != original_len:
            raise DecodeError(
                f"decoded {len(out)} bytes, expected {original_len}")
        return out
    codec, device_args, streams, host_meta = decode_prep(data, mesh)
    original_len, out_lens, copyf, nb_real, s_real, pred_frac = host_meta
    if (codec != "chameleon" and jax.process_count() == 1
            and native.is_available()
            and pred_frac > PREDICTED_DEVICE_CUTOFF):
        # The host C++ pool decodes compressible prediction-codec data
        # 40-70x faster than the device fixpoint at every measured
        # predicted fraction (docs/PLAN.md r4 cliff table); below the
        # cutoff the device fixpoint converges in a couple of rounds
        # and keeps the data on-chip, so it stays the device path.
        out = _decode_host_parallel(codec, streams, out_lens, s_real)
        if len(out) != original_len:
            raise DecodeError(
                f"decoded {len(out)} bytes, expected {original_len}")
        return out
    fn = pick_decode_fn(codec, device_args, bool(copyf.any()))
    out_words, ok = fn(*device_args)
    ok = _host_gather(ok)
    out_np = _host_gather(out_words.astype(jnp.uint16))
    redo = set(np.nonzero(~ok[:s_real])[0].tolist())

    parts = []
    for s in range(s_real):
        ol = int(out_lens[s])
        if ol == 0:
            continue
        if s in redo:
            # stream whose context fixpoint did not converge (deep
            # prediction chains): exact native redecode (~GB/s host)
            from density_tpu import native
            parts.append(native.decode(codec, streams[s],
                                       decoded_size_hint=ol))
            continue
        chunk = bytearray(out_np[s, : (ol + 1) // 2].tobytes()[:ol])
        ragged = ol % 4
        if ragged and not copyf[s, nb_real[s] - 1]:
            chunk[-ragged:] = streams[s][-ragged:]
        parts.append(bytes(chunk))
    out = b"".join(parts)
    if len(out) != original_len:
        raise DecodeError(
            f"decoded {len(out)} bytes, expected {original_len}")
    return out
