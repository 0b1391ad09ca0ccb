"""ctypes bindings to the native host runtime (libdensity.so).

Exposes the density-compatible C ABI (reference: chameleon.rs:70-84,
cheetah.rs:105-118, lion.rs:193-206) plus the stream scanners used by
the parallel decode path. Falls back gracefully (is_available() ->
False) if no C++ toolchain is present; pure-Python/numpy paths then
take over.
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
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        _load_error = e
    return _lib


def is_available() -> bool:
    return _load() is not None


def safe_encode_buffer_size(codec: str, size: int) -> int:
    lib = _load()
    return getattr(lib, f"{codec}_safe_encode_buffer_size")(size)


def encode(codec: str, data: bytes) -> bytes:
    """One-shot native encode (fresh state), density-compatible bytes."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    cap = safe_encode_buffer_size(codec, len(data)) + 16
    out = ctypes.create_string_buffer(cap)
    n = getattr(lib, f"{codec}_encode")(data, len(data), out, cap)
    return out.raw[:n]


def decode(codec: str, data: bytes, decoded_size_hint: int | None = None) -> bytes:
    """One-shot native decode (fresh state)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    # Worst case expansion: every token predicted (0 bytes -> 4 bytes out).
    cap = decoded_size_hint if decoded_size_hint is not None else max(
        64, len(data) * 64)
    out = ctypes.create_string_buffer(cap + 16)
    n = getattr(lib, f"{codec}_decode")(data, len(data), out, cap)
    return out.raw[:n]


def scan(codec: str, data: bytes):
    """Scan a compressed stream into per-block metadata.

    Returns (in_offsets, out_offsets, is_copy) numpy arrays of length
    n_blocks, or raises DecodeError on malformed input.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
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
