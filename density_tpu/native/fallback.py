"""Pure-Python fallback for the native host runtime.

When no C++ toolchain is present (``native.is_available() -> False``),
every ``density_tpu.native`` entry point routes here instead of
raising, so the full decode path (which needs the block scanner) and
the oracle encode/decode keep working -- at interpreted speed.  This
mirrors the reference's zero-dependency posture: decode never requires
anything beyond the library itself (reference: src/codec/codec.rs:82
is plain Rust with no native extensions either).

The scanner is a line-for-semantics twin of ``scan_stream`` in
libdensity.cpp (itself the host-side mirror of the reference decode
driver's block walk, codec.rs:82-126).  The one-shot encode/decode
oracles delegate to the scalar reference twin (codecs/scalar.py).
"""

from __future__ import annotations

import numpy as np

from density_tpu.errors import DecodeError

# (block_size, sig_bytes, flag_bits, payload_bytes_by_flag)
_TRAITS = {
    "chameleon": (256, 8, 1, lambda f: 2 if f else 4),
    "cheetah": (128, 8, 2, lambda f: 4 if f == 0 else (0 if f == 3 else 2)),
    "lion": (64, 6, 3, lambda f: 4 if f == 0 else (2 if f >= 6 else 0)),
}


class _Protection:
    """Blowup FSM (reference: protection_state.rs:9-47)."""

    __slots__ = ("copy_penalty", "copy_penalty_start",
                 "previous_incompressible", "counter")

    def __init__(self):
        self.copy_penalty = 0
        self.copy_penalty_start = 1
        self.previous_incompressible = False
        self.counter = 0

    def revert_to_copy(self):
        if (self.counter & 0xF) == 0 and self.copy_penalty_start > 1:
            self.copy_penalty_start >>= 1
        self.counter += 1
        return self.copy_penalty > 0

    def decay(self):
        self.copy_penalty -= 1
        if self.copy_penalty == 0:
            self.copy_penalty_start += 1

    def update(self, incompressible: bool):
        if incompressible:
            if self.previous_incompressible:
                self.copy_penalty = self.copy_penalty_start
            self.previous_incompressible = True
        else:
            self.previous_incompressible = False


def scan_with_counts(codec: str, data: bytes):
    """Walk the block-boundary chain of a compressed stream.

    Returns (in_offsets, out_offsets, is_copy, n_pred, n_tok) --
    the exact outputs of libdensity.cpp::scan_stream."""
    block, sig_bytes, flag_bits, payload = _TRAITS[codec]
    quads = block // 4
    flag_mask = (1 << flag_bits) - 1
    prot = _Protection()
    n = len(data)
    ip = op = 0
    in_offs: list[int] = []
    out_offs: list[int] = []
    copies: list[int] = []
    n_pred = n_tok = 0
    while n - ip > 0:
        in_offs.append(ip)
        out_offs.append(op)
        if prot.revert_to_copy():
            copies.append(1)
            rem = n - ip
            if rem > block:
                ip += block
                op += block
                prot.decay()
                continue
            ip += rem
            op += rem
            break
        copies.append(0)
        mark = ip
        if n - ip < sig_bytes:
            raise DecodeError(f"malformed {codec} stream (truncated sig)")
        if sig_bytes == 6:
            # lion: 6 significant bytes; the <=7-remaining path reads
            # exactly 6 and zero-pads (reference: lion.rs:339-351)
            sig = int.from_bytes(data[ip:ip + 6], "little")
            ip += 6
        else:
            sig = int.from_bytes(data[ip:ip + 8], "little")
            ip += 8
        ended = False
        for _ in range(quads):
            flag = sig & flag_mask
            sig >>= flag_bits
            tok = payload(flag)
            n_tok += 1
            if tok == 0:
                n_pred += 1
            if tok == 4:  # plain: ragged-tail semantics (codec.rs:58-62)
                rem = n - ip
                if rem == 0:
                    ended = True
                    break
                if rem <= 3:
                    ip += rem
                    op += rem
                    ended = True
                    break
            elif tok == 2:
                if n - ip < 2:
                    raise DecodeError(
                        f"malformed {codec} stream (truncated payload)")
            ip += tok
            op += 4
            if ip > n:
                raise DecodeError(
                    f"malformed {codec} stream (overran input)")
        if ended:
            break
        prot.update(ip - mark >= block)
    return (np.asarray(in_offs, np.int64), np.asarray(out_offs, np.int64),
            np.asarray(copies, np.uint8), n_pred, n_tok)


def scan(codec: str, data: bytes):
    in_off, out_off, is_copy, _, _ = scan_with_counts(codec, data)
    return in_off, out_off, is_copy


def scan_many(codec: str, streams, max_blocks: int):
    n = len(streams)
    bio = np.zeros((n, max_blocks), np.int64)
    boo = np.zeros((n, max_blocks), np.int64)
    bcp = np.zeros((n, max_blocks), np.uint8)
    nb = np.zeros(n, np.int64)
    pred = np.zeros(n, np.int64)
    tot = np.zeros(n, np.int64)
    for i, s in enumerate(streams):
        io, oo, cp, p, t = scan_with_counts(codec, s)
        k = len(io)
        if k > max_blocks:
            raise DecodeError("stream exceeds block capacity")
        bio[i, :k] = io
        boo[i, :k] = oo
        bcp[i, :k] = cp
        nb[i] = k
        pred[i] = p
        tot[i] = t
    return bio, boo, bcp, nb, pred, tot


def _scalar(codec: str):
    from density_tpu.codecs.scalar import SCALAR_CODECS
    return SCALAR_CODECS[codec]()


def encode(codec: str, data: bytes) -> bytes:
    return _scalar(codec).encode(bytes(data))


def decode(codec: str, data: bytes,
           decoded_size_hint: int | None = None) -> bytes:
    return _scalar(codec).decode(bytes(data))


def encode_many(codec: str, chunks) -> list:
    return [encode(codec, c) for c in chunks]


def decode_many(codec: str, streams, out_caps) -> list:
    outs = []
    for s, cap in zip(streams, out_caps):
        o = decode(codec, s)
        if len(o) > cap:
            raise DecodeError("decoded stream exceeds declared capacity")
        outs.append(o)
    return outs


def safe_encode_buffer_size(codec: str, size: int) -> int:
    block, sig_bytes, _, _ = _TRAITS[codec]
    blocks = size // block
    return size + blocks * sig_bytes + (sig_bytes if size % block else 0)
