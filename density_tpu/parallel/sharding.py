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


def compress(data: bytes, codec: str, stream_size: int = DEFAULT_STREAM_SIZE,
             mesh=None) -> bytes:
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    n = buf.size
    if n == 0:
        return build_header(codec, 0, stream_size, [])
    mesh = default_mesh() if mesh is None else mesh
    n_dev = mesh.devices.size

    s_real = split_streams(n, stream_size)
    s_pad = -(-s_real // n_dev) * n_dev  # even sharding
    cap_bytes = layout.bucket_bytes(stream_size, SPECS[codec].block_size)
    cap_words = cap_bytes // 2

    padded = np.zeros(s_pad * cap_bytes, dtype=np.uint8)
    view = padded.reshape(s_pad, cap_bytes)
    for s in range(s_real):
        chunk = buf[s * stream_size:(s + 1) * stream_size]
        view[s, :chunk.size] = chunk
    words = view.view("<u2").astype(np.uint32).reshape(s_pad, cap_words)
    nbytes = np.clip(n - np.arange(s_pad, dtype=np.int64) * stream_size,
                     0, stream_size).astype(np.int32)

    sh = stream_sharding(mesh)
    jwords = jax.device_put(jnp.asarray(words), sh)
    jn = jax.device_put(jnp.asarray(nbytes), sh)
    pipe = _codec_mod(codec).PIPELINE
    out_words, totals, converged = layout.run_encode(pipe, jwords, jn)

    totals = np.asarray(totals)
    # ordered gather: one device->host transfer of u16 words (the
    # padded-capacity tail is trimmed per stream below)
    max_words = (int(totals[:s_real].max()) + 1) // 2 if s_real else 0
    out_np = np.asarray(out_words[:, :max_words].astype(jnp.uint16))
    parts = []
    lengths = []
    for s in range(s_real):
        if converged:
            t = int(totals[s])
            raw = out_np[s, : (t + 1) // 2].tobytes()[:t]
        else:  # pathological stream: exact native fallback
            from density_tpu import native
            raw = native.encode(
                codec, buf[s * stream_size:(s + 1) * stream_size].tobytes())
        parts.append(raw)
        lengths.append(len(raw))
    return build_header(codec, n, stream_size, lengths) + b"".join(parts)


# ---------------------------------------------------------------------------
# Decompression
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("codec",))
def _decode_batch(words, in_word_off, is_copy, nb_real, out_len, codec):
    mod = _codec_mod(codec)
    if codec == "chameleon":
        return jax.vmap(mod._decode_core.__wrapped__)(
            words, in_word_off, is_copy, nb_real, out_len)

    def one(w, o, c, nbr, ol):
        flags, w0, w1, valid = mod._extract_tokens.__wrapped__(
            w, o, c, nbr, ol)
        quads = mod._resolve_scan.__wrapped__(flags, w0, w1, valid)
        return mod._assemble.__wrapped__(quads, valid, w, o, c, nbr, ol)

    return jax.vmap(one)(words, in_word_off, is_copy, nb_real, out_len)


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

    words = np.zeros((s_pad, cap_words), dtype=np.uint32)
    woff = np.zeros((s_pad, nb_cap), dtype=np.int32)
    copyf = np.zeros((s_pad, nb_cap), dtype=bool)
    nb_real = np.zeros(s_pad, dtype=np.int32)
    out_lens = np.clip(
        original_len - np.arange(s_pad, dtype=np.int64) * stream_size,
        0, stream_size).astype(np.int32)

    offsets = off + np.concatenate([[0], np.cumsum(lengths)])
    streams = [data[offsets[s]:offsets[s + 1]] for s in range(s_real)]
    for s, raw in enumerate(streams):
        if not raw:
            continue
        in_off, _, is_copy = native.scan(codec, raw)
        nb = len(in_off)
        nb_real[s] = nb
        woff[s, :nb] = in_off // 2
        copyf[s, :nb] = is_copy.astype(bool)
        w16 = np.frombuffer(raw + (b"\x00" if len(raw) % 2 else b""),
                            dtype="<u2")
        words[s, :w16.size] = w16

    sh = stream_sharding(mesh)
    device_args = (
        jax.device_put(jnp.asarray(words), sh),
        jax.device_put(jnp.asarray(woff), sh),
        jax.device_put(jnp.asarray(copyf), sh),
        jax.device_put(jnp.asarray(nb_real), sh),
        jax.device_put(jnp.asarray(out_lens), sh))
    host_meta = (original_len, out_lens, copyf, nb_real, s_real)
    return codec, device_args, streams, host_meta


def decompress(data: bytes, mesh=None) -> bytes:
    codec, original_len, stream_size, lengths, off = parse_header(data)
    if original_len == 0:
        return b""
    codec, device_args, streams, host_meta = decode_prep(data, mesh)
    original_len, out_lens, copyf, nb_real, s_real = host_meta
    out_words = _decode_batch(*device_args, codec)
    out_np = np.asarray(out_words.astype(jnp.uint16))

    parts = []
    for s in range(s_real):
        ol = int(out_lens[s])
        if ol == 0:
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
