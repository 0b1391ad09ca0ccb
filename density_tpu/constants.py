"""Normative format constants for the three density codecs.

These constants define the wire format and must match the reference
implementation bit-for-bit (see /root/reference citations below).

Hash (identical for all three codecs):
    h = (quad *u32 0x9D6EF916) >> 16            -> u16
(reference: chameleon.rs:14-15, cheetah.rs:14-15, lion.rs:14-15)

All multi-byte values are little-endian (reference: codec.rs:45,
chameleon.rs:93).

Signature bit order: flags are packed LSB-first -- quad i of a block
occupies bits [i*w, (i+1)*w) of the signature word
(reference: write_signature.rs:14-17, read_signature.rs:12-16).

Signature placement: the signature slot is reserved at the block's
start, payload bytes stream after it, and the finished word is
backpatched once the block is done (reference: codec.rs:41,67).
"""

from __future__ import annotations

import dataclasses

HASH_MULTIPLIER = 0x9D6EF916
HASH_BITS = 16

PLAIN_FLAG = 0x0  # shared by all codecs (reference: algorithms.rs:5)

# Chameleon (reference: chameleon.rs:17-22, 138-146)
CHAMELEON_FLAG_BITS = 1
CHAMELEON_MAP_FLAG = 0x1
CHAMELEON_SIG_BYTES = 8
CHAMELEON_BLOCK_SIZE = 256  # bytes; 64 quads/block
CHAMELEON_DECODE_UNIT = 8  # bytes out per decode unit (2 quads)

# Cheetah (reference: cheetah.rs:18-24, 188-196)
CHEETAH_FLAG_BITS = 2
CHEETAH_MAP_A_FLAG = 0x1
CHEETAH_MAP_B_FLAG = 0x2
CHEETAH_PREDICTED_FLAG = 0x3
CHEETAH_SIG_BYTES = 8
CHEETAH_BLOCK_SIZE = 128  # bytes; 32 quads/block
CHEETAH_DECODE_UNIT = 4

# Lion (reference: lion.rs:18-28, 317-325)
LION_FLAG_BITS = 3
LION_PREDICTED_A_FLAG = 0x1
LION_PREDICTED_B_FLAG = 0x2
LION_PREDICTED_C_FLAG = 0x3
LION_PREDICTED_D_FLAG = 0x4
LION_PREDICTED_E_FLAG = 0x5
LION_MAP_A_FLAG = 0x6
LION_MAP_B_FLAG = 0x7
LION_SIG_BYTES = 6  # only 6 of 8 signature bytes are written
LION_BLOCK_SIZE = 64  # bytes; 16 quads/block
LION_DECODE_UNIT = 4


@dataclasses.dataclass(frozen=True)
class CodecSpec:
    """Static geometry of one codec's wire format."""

    name: str
    flag_bits: int
    sig_bytes: int
    block_size: int
    decode_unit: int

    @property
    def quads_per_block(self) -> int:
        return self.block_size // 4

    @property
    def sig_words(self) -> int:
        """Signature size in u16 words (always integral: 8 or 6 bytes)."""
        return self.sig_bytes // 2

    def safe_encode_buffer_size(self, size: int) -> int:
        """Worst-case encoded size (reference: codec.rs:18-21)."""
        blocks = size // self.block_size
        extra = self.sig_bytes if size % self.block_size else 0
        return size + blocks * self.sig_bytes + extra


CHAMELEON = CodecSpec("chameleon", CHAMELEON_FLAG_BITS, CHAMELEON_SIG_BYTES,
                      CHAMELEON_BLOCK_SIZE, CHAMELEON_DECODE_UNIT)
CHEETAH = CodecSpec("cheetah", CHEETAH_FLAG_BITS, CHEETAH_SIG_BYTES,
                    CHEETAH_BLOCK_SIZE, CHEETAH_DECODE_UNIT)
LION = CodecSpec("lion", LION_FLAG_BITS, LION_SIG_BYTES,
                 LION_BLOCK_SIZE, LION_DECODE_UNIT)

SPECS = {"chameleon": CHAMELEON, "cheetah": CHEETAH, "lion": LION}


def hash_u16(quad: int) -> int:
    """Scalar hash helper (python ints)."""
    return ((quad * HASH_MULTIPLIER) & 0xFFFFFFFF) >> (32 - HASH_BITS)
