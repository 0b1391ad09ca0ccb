"""Streaming / stateful codec sessions.

The reference exposes reusable codec instances whose dictionary state
persists across calls, resettable with `clear_state()` (reference:
src/codec/codec.rs:16, src/algorithms/chameleon/chameleon.rs:148-150).
This module is that capability as a chunked streaming API: feeding a
file in N arbitrary chunks produces EXACTLY the bytes of a one-shot
encode of the whole file (partial blocks are buffered internally; the
dictionary and the blowup-protection FSM carry across chunks).

The chunk loop is host-side byte work, so it runs in the native C++
runtime (density_tpu/native/libdensity.cpp: DtpuStream) -- the TPU
path stays one-shot/batch (container.compress), which is where the
throughput is.

    enc = StreamEncoder("cheetah")
    out = enc.update(chunk1) + enc.update(chunk2) + enc.finish()
    assert out == density_tpu.encode_raw(chunk1 + chunk2, "cheetah")
"""

from __future__ import annotations

import ctypes

from density_tpu import native
from density_tpu.constants import SPECS
from density_tpu.errors import DecodeError, EncodeError

_CODEC_IDS = {"chameleon": 0, "cheetah": 1, "lion": 2}


class _Session:
    def __init__(self, codec: str):
        if codec not in _CODEC_IDS:
            raise EncodeError(f"unknown codec {codec!r}")
        lib = native._load()
        if lib is None:
            raise RuntimeError(
                f"native runtime unavailable: {native._load_error}")
        self._lib = lib
        self.codec = codec
        self.spec = SPECS[codec]
        self._st = lib.dtpu_stream_new(_CODEC_IDS[codec])
        self._held = 0       # bytes buffered inside the native session
        self._finished = False

    def reset(self):
        """Reference clear_state(): zero the dictionaries and FSM."""
        self._lib.dtpu_stream_reset(self._st)
        self._held = 0
        self._finished = False

    def close(self):
        if self._st:
            self._lib.dtpu_stream_free(self._st)
            self._st = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


class StreamEncoder(_Session):
    """Chunked density encoder with carried dictionary state."""

    def _call(self, data: bytes, final: bool) -> bytes:
        if self._finished:
            raise EncodeError("stream already finished; call reset()")
        total = self._held + len(data)
        cap = self.spec.safe_encode_buffer_size(total) + 16
        out = ctypes.create_string_buffer(cap)
        w = self._lib.dtpu_stream_encode(self._st, bytes(data), len(data),
                                         out, cap, int(final))
        if w == ctypes.c_size_t(-1).value:
            raise EncodeError("output buffer too small (internal)")
        if final:
            self._held = 0
            self._finished = True
        else:
            # exact retained-byte count from the native session: the
            # encoder's cap-limited partial-take path may consume fewer
            # bytes than avail // block * block, so deriving the count
            # arithmetically can desync from the native hold
            self._held = int(self._lib.dtpu_stream_held(self._st, 0))
        return out.raw[:w]

    def update(self, data: bytes) -> bytes:
        """Feed bytes; returns encoded bytes for completed blocks."""
        return self._call(data, final=False)

    def finish(self) -> bytes:
        """Flush the buffered partial block; ends the stream."""
        return self._call(b"", final=True)


class StreamDecoder(_Session):
    """Chunked density decoder with carried dictionary state."""

    def _call(self, data: bytes, final: bool) -> bytes:
        if self._finished:
            raise DecodeError("stream already finished; call reset()")
        total = self._held + len(data)
        spec = self.spec
        # each block consumes >= sig_bytes and emits <= block_size
        cap = (total // (2 * spec.sig_words) + 2) * spec.block_size + 16
        out = ctypes.create_string_buffer(cap)
        w = self._lib.dtpu_stream_decode(self._st, bytes(data), len(data),
                                         out, cap, int(final))
        if w == ctypes.c_size_t(-1).value:
            raise DecodeError(
                "stream decode failed (output overflow or malformed "
                "input); session is poisoned until reset()")
        if final:
            self._held = 0
            self._finished = True
        else:
            # exact retained-byte count from the native session (the
            # decoder holds back bytes not yet provably complete)
            self._held = int(self._lib.dtpu_stream_held(self._st, 1))
        return out.raw[:w]

    def update(self, data: bytes) -> bytes:
        return self._call(data, final=False)

    def finish(self, data: bytes = b"") -> bytes:
        return self._call(data, final=True)
