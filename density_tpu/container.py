"""Framed multi-stream container (the "TPU tier").

The reference is a bare stream with no framing (SURVEY.md §7): one
call, one dictionary, strictly sequential. To shard across TPU cores
and hosts, this container chops the input into S independent streams;
each stream is compressed *exactly* as a bare density stream with
fresh state (tier-1 bit-compatibility per stream), and a small header
records the geometry:

    magic    "DTPU"            4 bytes
    version  u8 = 1
    codec_id u8 (0 chameleon / 1 cheetah / 2 lion)
    reserved u16
    original_len u64 LE
    stream_size  u32 LE        (bytes per stream; last may be short)
    n_streams    u32 LE
    lengths      u32 LE * n_streams (compressed bytes per stream)
    payload: concatenated bare streams, in order

Every stream is independently decodable and restartable, which is what
makes multi-chip encode embarrassingly parallel and decode
block-parallel (SURVEY.md §5 "checkpoint/resume" and §2b).
"""

from __future__ import annotations

import struct

import numpy as np

from density_tpu.constants import SPECS
from density_tpu.errors import DecodeError, EncodeError

MAGIC = b"DTPU"
VERSION = 1
CODEC_IDS = {"chameleon": 0, "cheetah": 1, "lion": 2}
CODEC_NAMES = {v: k for k, v in CODEC_IDS.items()}
# Default stream size trades compression ratio against parallel grain:
# streams reset dictionary state (tier-1 compatibility), so bigger
# streams compress better.  Ratio-vs-grain on the bench corpus (10 MB):
# chameleon holds >= 0.99x the reference's single-stream ratio from
# 8 MiB streams up (0.994x at 8 MiB, 1.000x at 32 MiB); the prediction
# codecs thread context through every quad (cheetah.rs:148,
# lion.rs:269), so dictionary resets cost them more -- cheetah is
# 0.987x at 8 MiB and crosses 0.99x only around 32 MiB.  Defaults are
# chosen for the LIBRARY USER (reference-parity ratio: per-stream
# bytes are bit-exact vs the reference, so at the 32 MiB grain the
# whole-container ratio reads 1.000x on any input <= 32 MiB);
# throughput-oriented pod deployments should pass
# stream_size ~= total_bytes / (4 * n_devices) instead, floored at a
# few MiB.
DEFAULT_STREAM_SIZE = 8 << 20  # 8 MiB
DEFAULT_STREAM_SIZES = {
    "chameleon": 32 << 20,  # reference-parity ratio (see above)
    "cheetah": 32 << 20,    # prediction codecs need coarser streams
    "lion": 32 << 20,       # for >= 0.99x ratio
}


def default_stream_size(codec: str) -> int:
    return DEFAULT_STREAM_SIZES.get(codec, DEFAULT_STREAM_SIZE)

_HDR = struct.Struct("<4sBBHQII")


def build_header(codec: str, original_len: int, stream_size: int,
                 lengths: list[int]) -> bytes:
    head = _HDR.pack(MAGIC, VERSION, CODEC_IDS[codec], 0,
                     original_len, stream_size, len(lengths))
    return head + np.asarray(lengths, dtype="<u4").tobytes()


def parse_header(data: bytes):
    """Returns (codec, original_len, stream_size, lengths, payload_off)."""
    if len(data) < _HDR.size:
        raise DecodeError("container too short")
    magic, version, codec_id, _, original_len, stream_size, n_streams = (
        _HDR.unpack_from(data, 0))
    if magic != MAGIC:
        raise DecodeError("bad magic")
    if version != VERSION:
        raise DecodeError(f"unsupported container version {version}")
    if codec_id not in CODEC_NAMES:
        raise DecodeError(f"unknown codec id {codec_id}")
    off = _HDR.size
    end = off + 4 * n_streams
    if len(data) < end:
        raise DecodeError("truncated stream table")
    lengths = np.frombuffer(data[off:end], dtype="<u4").astype(np.int64)
    return CODEC_NAMES[codec_id], original_len, stream_size, lengths, end


def split_streams(n: int, stream_size: int) -> int:
    if stream_size <= 0:
        raise EncodeError("stream_size must be positive")
    return max(1, -(-n // stream_size))


def compress(data: bytes, codec: str = "chameleon",
             stream_size: int | None = None, mesh=None) -> bytes:
    """Compress into a framed container, sharding streams over the
    current device set (or an explicit jax Mesh)."""
    if codec not in SPECS:
        raise EncodeError(f"unknown codec {codec!r}")
    if stream_size is None:
        stream_size = default_stream_size(codec)
    from density_tpu.parallel import sharding
    return sharding.compress(data, codec, stream_size, mesh)


def decompress(data: bytes, mesh=None) -> bytes:
    """Decompress a framed container."""
    from density_tpu.parallel import sharding
    return sharding.decompress(data, mesh)
