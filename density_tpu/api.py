"""Public API: one-shot raw-stream encode/decode per codec.

`encode_raw`/`decode_raw` produce/consume *bare density streams* --
byte-identical to the reference implementation's output for the same
input (reference: chameleon.rs:45-53, cheetah.rs:57-65, lion.rs:74-82).
The framed multi-stream container lives in density_tpu.container.
"""

from __future__ import annotations

from density_tpu.constants import SPECS
from density_tpu.errors import DecodeError, EncodeError


def safe_encode_buffer_size(codec: str, size: int) -> int:
    """Worst-case encoded size (reference: codec.rs:18-21)."""
    return SPECS[codec].safe_encode_buffer_size(size)


def encode_raw(data: bytes, codec: str = "chameleon",
               backend: str = "jax") -> bytes:
    """Encode `data` into a bare density stream."""
    if codec not in SPECS:
        raise EncodeError(f"unknown codec {codec!r}")
    if backend == "native":
        from density_tpu import native
        return native.encode(codec, data)
    if backend == "scalar":
        from density_tpu.codecs.scalar import SCALAR_CODECS
        return SCALAR_CODECS[codec]().encode(data)
    if backend != "jax":
        raise EncodeError(f"unknown backend {backend!r}")
    if codec == "chameleon":
        from density_tpu.codecs import chameleon
        return chameleon.encode(data)
    if codec == "cheetah":
        from density_tpu.codecs import cheetah
        return cheetah.encode(data)
    from density_tpu.codecs import lion
    return lion.encode(data)


def decode_raw(data: bytes, codec: str = "chameleon",
               decoded_size_hint: int | None = None,
               backend: str = "jax") -> bytes:
    """Decode a bare density stream."""
    if codec not in SPECS:
        raise DecodeError(f"unknown codec {codec!r}")
    if backend == "native":
        from density_tpu import native
        return native.decode(codec, data, decoded_size_hint)
    if backend == "scalar":
        from density_tpu.codecs.scalar import SCALAR_CODECS
        return SCALAR_CODECS[codec]().decode(data)
    if backend != "jax":
        raise DecodeError(f"unknown backend {backend!r}")
    if codec == "chameleon":
        from density_tpu.codecs import chameleon
        return chameleon.decode(data, decoded_size_hint)
    if codec == "cheetah":
        from density_tpu.codecs import cheetah
        return cheetah.decode(data, decoded_size_hint)
    from density_tpu.codecs import lion
    return lion.decode(data, decoded_size_hint)
