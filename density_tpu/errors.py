"""Error types.

The reference's EncodeError/DecodeError are empty markers that are
never actually raised (reference: src/errors/encode_error.rs:4-13,
src/errors/decode_error.rs:4-13; encode always returns Ok,
codec.rs:79). This framework improves on that: these exceptions carry
messages and are raised on invalid codec names, malformed containers,
and undersized buffers, while the hot paths stay branch-free.
"""


class DensityError(Exception):
    """Base class for density-tpu errors."""


class EncodeError(DensityError):
    """Raised on encode-side misuse (unknown codec, bad buffer)."""


class DecodeError(DensityError):
    """Raised on malformed or truncated compressed input."""
