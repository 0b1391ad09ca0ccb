"""ctypes bindings to the native host runtime (libdensity.so).

Exposes the density-compatible C ABI (reference: chameleon.rs:70-84,
cheetah.rs:105-118, lion.rs:193-206) plus the stream scanners used by
the parallel decode path. Falls back gracefully (is_available() ->
False) if no C++ toolchain is present: every entry point below then
routes to the pure-Python twin (native/fallback.py), so decode --
which needs the block scanner -- works with zero native dependencies,
matching the reference's pure-library posture.  Set
DENSITY_TPU_NO_NATIVE=1 to force the fallback (used by tests).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_lib = None
_load_error: Exception | None = None


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    if os.environ.get("DENSITY_TPU_NO_NATIVE") == "1":
        _load_error = RuntimeError("disabled via DENSITY_TPU_NO_NATIVE")
        return None
    try:
        from density_tpu.native.build import build
        so = build()
        lib = ctypes.CDLL(so)
        for codec in ("chameleon", "cheetah", "lion"):
            for op in ("encode", "decode"):
                fn = getattr(lib, f"{codec}_{op}")
                fn.restype = ctypes.c_size_t
                fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.c_void_p, ctypes.c_size_t]
            fn = getattr(lib, f"{codec}_safe_encode_buffer_size")
            fn.restype = ctypes.c_size_t
            fn.argtypes = [ctypes.c_size_t]
            fn = getattr(lib, f"{codec}_scan")
            fn.restype = ctypes.c_size_t
            fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                           ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                           ctypes.c_size_t]
        lib.dtpu_stream_new.restype = ctypes.c_void_p
        lib.dtpu_stream_new.argtypes = [ctypes.c_int]
        lib.dtpu_stream_free.restype = None
        lib.dtpu_stream_free.argtypes = [ctypes.c_void_p]
        lib.dtpu_stream_reset.restype = None
        lib.dtpu_stream_reset.argtypes = [ctypes.c_void_p]
        for op in ("encode", "decode"):
            fn = getattr(lib, f"dtpu_stream_{op}")
            fn.restype = ctypes.c_size_t
            fn.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                           ctypes.c_size_t, ctypes.c_void_p,
                           ctypes.c_size_t, ctypes.c_int]
        lib.dtpu_stream_held.restype = ctypes.c_size_t
        lib.dtpu_stream_held.argtypes = [ctypes.c_void_p, ctypes.c_int]
        i64p = ctypes.c_void_p
        for op in ("decode_many", "encode_many"):
            fn = getattr(lib, f"dtpu_{op}")
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_int, ctypes.c_char_p, i64p, i64p,
                           ctypes.c_void_p, i64p, i64p, i64p,
                           ctypes.c_int64, ctypes.c_int]
        lib.dtpu_scan_many.restype = ctypes.c_int64
        lib.dtpu_scan_many.argtypes = [
            ctypes.c_int, ctypes.c_char_p, i64p, i64p, i64p, i64p,
            ctypes.c_void_p, i64p, i64p, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int]
        for op in ("compress", "decompress"):
            fn = getattr(lib, f"dtpu_lz4_{op}")
            fn.restype = ctypes.c_size_t
            fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                           ctypes.c_void_p, ctypes.c_size_t]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        _load_error = e
    return _lib


def is_available() -> bool:
    return _load() is not None


def safe_encode_buffer_size(codec: str, size: int) -> int:
    lib = _load()
    if lib is None:
        from density_tpu.native import fallback
        return fallback.safe_encode_buffer_size(codec, size)
    return getattr(lib, f"{codec}_safe_encode_buffer_size")(size)


def encode(codec: str, data: bytes) -> bytes:
    """One-shot native encode (fresh state), density-compatible bytes."""
    lib = _load()
    if lib is None:
        from density_tpu.native import fallback
        return fallback.encode(codec, data)
    cap = safe_encode_buffer_size(codec, len(data)) + 16
    out = ctypes.create_string_buffer(cap)
    n = getattr(lib, f"{codec}_encode")(data, len(data), out, cap)
    return out.raw[:n]


def decode(codec: str, data: bytes, decoded_size_hint: int | None = None) -> bytes:
    """One-shot native decode (fresh state)."""
    lib = _load()
    if lib is None:
        from density_tpu.native import fallback
        return fallback.decode(codec, data, decoded_size_hint)
    # Worst case expansion: every token predicted (0 bytes -> 4 bytes out).
    cap = decoded_size_hint if decoded_size_hint is not None else max(
        64, len(data) * 64)
    out = ctypes.create_string_buffer(cap + 16)
    n = getattr(lib, f"{codec}_decode")(data, len(data), out, cap)
    return out.raw[:n]


_CODEC_IDS = {"chameleon": 0, "cheetah": 1, "lion": 2}
N_THREADS = os.cpu_count() or 1


def _i64(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def decode_many(codec: str, streams, out_caps) -> list:
    """Decode independent streams in parallel worker threads (the
    host-side mirror of the device's streams-axis sharding).  Returns
    the list of decoded bytes; raises on any malformed stream."""
    lib = _load()
    if lib is None:
        from density_tpu.native import fallback
        return fallback.decode_many(codec, streams, out_caps)
    n = len(streams)
    if n == 0:
        return []
    in_len = np.array([len(s) for s in streams], np.int64)
    in_off = np.concatenate([[0], np.cumsum(in_len)[:-1]])
    blob = b"".join(streams)
    out_cap = np.asarray(out_caps, np.int64)
    out_off = np.concatenate([[0], np.cumsum(out_cap)[:-1]])
    out = np.empty(int(out_cap.sum()) + 16, np.uint8)
    out_len = np.zeros(n, np.int64)
    fails = lib.dtpu_decode_many(
        _CODEC_IDS[codec], blob, _i64(in_off), _i64(in_len),
        out.ctypes.data_as(ctypes.c_void_p), _i64(out_off),
        _i64(out_cap), _i64(out_len), n, N_THREADS)
    if fails:
        from density_tpu.errors import DecodeError
        raise DecodeError(f"{fails} stream(s) failed to decode")
    return [out[out_off[i]:out_off[i] + out_len[i]].tobytes()
            for i in range(n)]


def encode_many(codec: str, chunks) -> list:
    """Encode independent chunks in parallel worker threads."""
    lib = _load()
    if lib is None:
        from density_tpu.native import fallback
        return fallback.encode_many(codec, chunks)
    n = len(chunks)
    if n == 0:
        return []
    in_len = np.array([len(s) for s in chunks], np.int64)
    in_off = np.concatenate([[0], np.cumsum(in_len)[:-1]])
    blob = b"".join(chunks)
    out_cap = np.array([safe_encode_buffer_size(codec, len(s)) + 16
                        for s in chunks], np.int64)
    out_off = np.concatenate([[0], np.cumsum(out_cap)[:-1]])
    out = np.empty(int(out_cap.sum()) + 16, np.uint8)
    out_len = np.zeros(n, np.int64)
    fails = lib.dtpu_encode_many(
        _CODEC_IDS[codec], blob, _i64(in_off), _i64(in_len),
        out.ctypes.data_as(ctypes.c_void_p), _i64(out_off),
        _i64(out_cap), _i64(out_len), n, N_THREADS)
    if fails:
        from density_tpu.errors import EncodeError
        raise EncodeError(f"{fails} chunk(s) failed to encode")
    return [out[out_off[i]:out_off[i] + out_len[i]].tobytes()
            for i in range(n)]


def scan_many(codec: str, streams, max_blocks: int):
    """Scan independent streams in parallel.  Returns (blk_in_off,
    blk_out_off, blk_copy, n_blocks, pred_tokens, total_tokens) with
    per-block rows flattened at stride max_blocks."""
    lib = _load()
    if lib is None:
        from density_tpu.native import fallback
        return fallback.scan_many(codec, streams, max_blocks)
    n = len(streams)
    in_len = np.array([len(s) for s in streams], np.int64)
    in_off = np.concatenate([[0], np.cumsum(in_len)[:-1]]) if n else \
        np.zeros(0, np.int64)
    blob = b"".join(streams)
    bio = np.zeros((n, max_blocks), np.int64)
    boo = np.zeros((n, max_blocks), np.int64)
    bcp = np.zeros((n, max_blocks), np.uint8)
    nb = np.zeros(n, np.int64)
    pred = np.zeros(n, np.int64)
    tot = np.zeros(n, np.int64)
    fails = lib.dtpu_scan_many(
        _CODEC_IDS[codec], blob, _i64(in_off), _i64(in_len),
        _i64(bio), _i64(boo), bcp.ctypes.data_as(ctypes.c_void_p),
        _i64(nb), _i64(pred), _i64(tot), n, max_blocks, N_THREADS)
    if fails:
        from density_tpu.errors import DecodeError
        raise DecodeError(f"{fails} malformed stream(s)")
    return bio, boo, bcp, nb, pred, tot


def scan(codec: str, data: bytes):
    """Scan a compressed stream into per-block metadata.

    Returns (in_offsets, out_offsets, is_copy) numpy arrays of length
    n_blocks, or raises DecodeError on malformed input.
    """
    lib = _load()
    if lib is None:
        from density_tpu.native import fallback
        return fallback.scan(codec, data)
    block = {"chameleon": 256, "cheetah": 128, "lion": 64}[codec]
    # Upper bound on block count: every block consumes >= sig bytes...
    # a predicted-only cheetah/lion block consumes just the signature
    # (6 or 8 bytes), so bound by len/sig + 2.
    sig = 6 if codec == "lion" else 8
    max_blocks = len(data) // sig + 2
    in_off = np.zeros(max_blocks, dtype=np.int64)
    out_off = np.zeros(max_blocks, dtype=np.int64)
    is_copy = np.zeros(max_blocks, dtype=np.uint8)
    n = getattr(lib, f"{codec}_scan")(
        data, len(data),
        in_off.ctypes.data_as(ctypes.c_void_p),
        out_off.ctypes.data_as(ctypes.c_void_p),
        is_copy.ctypes.data_as(ctypes.c_void_p),
        max_blocks)
    if n == ctypes.c_size_t(-1).value:
        from density_tpu.errors import DecodeError
        raise DecodeError(f"malformed {codec} stream")
    return in_off[:n], out_off[:n], is_copy[:n]


def lz4_compress(data: bytes) -> bytes:
    """Vendored LZ4-block compress (bench pareto point only -- not part
    of the density format surface). Raises if native is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    cap = len(data) + len(data) // 128 + 64
    out = ctypes.create_string_buffer(cap)
    n = lib.dtpu_lz4_compress(data, len(data), out, cap)
    if n == 0 and len(data):
        raise RuntimeError("lz4 compress overflow")
    return out.raw[:n]


def lz4_decompress(data: bytes, decoded_size: int) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    out = ctypes.create_string_buffer(decoded_size + 16)
    n = lib.dtpu_lz4_decompress(data, len(data), out, decoded_size + 16)
    if n == ctypes.c_size_t(-1).value:
        raise RuntimeError("malformed lz4 block")
    return out.raw[:n]
