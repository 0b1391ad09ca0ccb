"""Bit-exact scalar (pure Python) implementation of the three codecs.

This is the trusted *oracle* used by the test-suite to validate the
vectorized TPU paths, and the ultimate fallback for pathological inputs.
It is deliberately simple and slow; the production paths are the JAX
array programs in chameleon.py / cheetah.py / lion.py and the C++
native library.

Format semantics follow the normative spec extracted from the reference
(SURVEY.md §2a; reference: src/codec/codec.rs:34-126,
src/codec/protection_state.rs:9-47, src/algorithms/*/).
"""

from __future__ import annotations

from density_tpu.constants import (
    CHAMELEON, CHEETAH, LION, CodecSpec, HASH_MULTIPLIER, HASH_BITS,
    PLAIN_FLAG, CHAMELEON_MAP_FLAG,
    CHEETAH_MAP_A_FLAG, CHEETAH_MAP_B_FLAG, CHEETAH_PREDICTED_FLAG,
    LION_PREDICTED_A_FLAG, LION_PREDICTED_B_FLAG, LION_PREDICTED_C_FLAG,
    LION_PREDICTED_D_FLAG, LION_PREDICTED_E_FLAG,
    LION_MAP_A_FLAG, LION_MAP_B_FLAG,
)

_U32 = 0xFFFFFFFF


def _hash(quad: int) -> int:
    return ((quad * HASH_MULTIPLIER) & _U32) >> (32 - HASH_BITS)


class _ProtectionState:
    """Blowup-protection FSM, run in lockstep on encode and decode
    (reference: protection_state.rs:9-47)."""

    def __init__(self) -> None:
        self.copy_penalty = 0
        self.copy_penalty_start = 1
        self.previous_incompressible = False
        self.counter = 0

    def revert_to_copy(self) -> bool:
        if self.counter & 0xF == 0:
            if self.copy_penalty_start > 1:
                self.copy_penalty_start >>= 1
        self.counter += 1
        return self.copy_penalty > 0

    def decay(self) -> None:
        self.copy_penalty -= 1
        if self.copy_penalty == 0:
            self.copy_penalty_start += 1

    def update(self, incompressible: bool) -> None:
        if incompressible:
            if self.previous_incompressible:
                self.copy_penalty = self.copy_penalty_start
            self.previous_incompressible = True
        else:
            self.previous_incompressible = False


class _Sig:
    """Write-side signature accumulator (reference: write_signature.rs)."""

    def __init__(self) -> None:
        self.pos = 0
        self.value = 0
        self.shift = 0

    def init(self, pos: int) -> None:
        self.pos = pos
        self.value = 0
        self.shift = 0

    def push(self, flag: int, nbits: int) -> None:
        self.value |= flag << self.shift
        self.shift += nbits


class _ScalarCodec:
    """Shared block driver (reference: codec.rs:34-126)."""

    spec: CodecSpec

    # -- per-codec hooks -------------------------------------------------
    def clear_state(self) -> None:
        raise NotImplementedError

    def encode_quad(self, quad: int, out: bytearray, sig: _Sig) -> None:
        raise NotImplementedError

    def decode_quad_by_flag(self, flag: int, inp: bytes, pos: int) -> tuple[int, int]:
        """Return (quad, new_pos) and update state."""
        raise NotImplementedError

    def write_signature(self, out: bytearray, sig: _Sig) -> None:
        out[sig.pos:sig.pos + 8] = sig.value.to_bytes(8, "little")

    def read_signature(self, inp: bytes, pos: int) -> tuple[int, int]:
        value = int.from_bytes(inp[pos:pos + 8], "little")
        return value, pos + 8

    # -- drivers ---------------------------------------------------------
    def encode(self, data: bytes) -> bytes:
        spec = self.spec
        out = bytearray()
        sig = _Sig()
        prot = _ProtectionState()
        for start in range(0, len(data), spec.block_size):
            block = data[start:start + spec.block_size]
            if prot.revert_to_copy():
                out.extend(block)
                prot.decay()
                continue
            mark = len(out)
            sig.init(len(out))
            out.extend(b"\x00" * spec.sig_bytes)
            full = len(block) // 4
            for q in range(full):
                quad = int.from_bytes(block[4 * q:4 * q + 4], "little")
                self.encode_quad(quad, out, sig)
            rem = len(block) - 4 * full
            if rem:
                # Ragged tail: raw bytes with an implicit plain flag of 0
                # (no signature bits pushed) -- reference codec.rs:58-62.
                out.extend(block[4 * full:])
            self.write_signature(out, sig)
            prot.update(len(out) - mark >= spec.block_size)
        return bytes(out)

    def decode(self, data: bytes) -> bytes:
        spec = self.spec
        out = bytearray()
        prot = _ProtectionState()
        pos = 0
        n = len(data)
        iterations = spec.block_size // spec.decode_unit
        quads_per_unit = spec.decode_unit // 4

        # Fast loop (reference: codec.rs:88-100)
        while n - pos >= spec.sig_bytes + spec.block_size:
            if prot.revert_to_copy():
                out.extend(data[pos:pos + spec.block_size])
                pos += spec.block_size
                prot.decay()
            else:
                mark = pos
                sigval, pos = self.read_signature(data, pos)
                sig = [sigval]
                for _ in range(iterations):
                    for _ in range(quads_per_unit):
                        flag = sig[0] & ((1 << spec.flag_bits) - 1)
                        sig[0] >>= spec.flag_bits
                        quad, pos = self.decode_quad_by_flag(flag, data, pos)
                        out.extend(quad.to_bytes(4, "little"))
                prot.update(pos - mark >= spec.block_size)

        # Tail loop (reference: codec.rs:102-123)
        while n - pos > 0:
            if prot.revert_to_copy():
                if n - pos > spec.block_size:
                    out.extend(data[pos:pos + spec.block_size])
                    pos += spec.block_size
                else:
                    out.extend(data[pos:])
                    pos = n
                    return bytes(out)
                prot.decay()
            else:
                mark = pos
                sigval, pos = self.read_signature(data, pos)
                sig = [sigval]
                for _ in range(iterations):
                    if n - pos >= spec.decode_unit:
                        for _ in range(quads_per_unit):
                            flag = sig[0] & ((1 << spec.flag_bits) - 1)
                            sig[0] >>= spec.flag_bits
                            quad, pos = self.decode_quad_by_flag(flag, data, pos)
                            out.extend(quad.to_bytes(4, "little"))
                    else:
                        done = False
                        # decode_partial_unit: quad-by-quad with ragged-tail
                        # termination (reference: chameleon.rs:117-135 etc.)
                        for _ in range(quads_per_unit):
                            flag = sig[0] & ((1 << spec.flag_bits) - 1)
                            sig[0] >>= spec.flag_bits
                            if flag == PLAIN_FLAG:
                                rem = n - pos
                                if rem == 0:
                                    done = True
                                    break
                                if rem <= 3:
                                    out.extend(data[pos:])
                                    pos = n
                                    done = True
                                    break
                            quad, pos = self.decode_quad_by_flag(flag, data, pos)
                            out.extend(quad.to_bytes(4, "little"))
                        if done:
                            return bytes(out)
                prot.update(pos - mark >= spec.block_size)
        return bytes(out)


class ScalarChameleon(_ScalarCodec):
    """Chameleon: single 2^16-entry dictionary, 1-bit flags
    (reference: chameleon.rs:34-151)."""

    spec = CHAMELEON

    def __init__(self) -> None:
        self.clear_state()

    def clear_state(self) -> None:
        self.chunk_map = [0] * (1 << HASH_BITS)

    def encode_quad(self, quad: int, out: bytearray, sig: _Sig) -> None:
        h = _hash(quad)
        if self.chunk_map[h] != quad:
            sig.push(PLAIN_FLAG, 1)
            out.extend(quad.to_bytes(4, "little"))
            self.chunk_map[h] = quad
        else:
            sig.push(CHAMELEON_MAP_FLAG, 1)
            out.extend(h.to_bytes(2, "little"))

    def decode_quad_by_flag(self, flag: int, inp: bytes, pos: int) -> tuple[int, int]:
        if flag == PLAIN_FLAG:
            quad = int.from_bytes(inp[pos:pos + 4], "little")
            self.chunk_map[_hash(quad)] = quad
            return quad, pos + 4
        h = int.from_bytes(inp[pos:pos + 2], "little")
        return self.chunk_map[h], pos + 2


class ScalarCheetah(_ScalarCodec):
    """Cheetah: MRU-swapped dual dictionary + 1 prediction slot keyed by
    the previous quad's hash (reference: cheetah.rs:42-203)."""

    spec = CHEETAH

    def __init__(self) -> None:
        self.clear_state()

    def clear_state(self) -> None:
        self.last_hash = 0
        self.chunk_a = [0] * (1 << HASH_BITS)
        self.chunk_b = [0] * (1 << HASH_BITS)
        self.prediction = [0] * (1 << HASH_BITS)

    def encode_quad(self, quad: int, out: bytearray, sig: _Sig) -> None:
        h = _hash(quad)
        if self.prediction[self.last_hash] != quad:
            if self.chunk_a[h] != quad:
                if self.chunk_b[h] != quad:
                    sig.push(PLAIN_FLAG, 2)
                    out.extend(quad.to_bytes(4, "little"))
                else:
                    sig.push(CHEETAH_MAP_B_FLAG, 2)
                    out.extend(h.to_bytes(2, "little"))
                self.chunk_b[h] = self.chunk_a[h]
                self.chunk_a[h] = quad
            else:
                sig.push(CHEETAH_MAP_A_FLAG, 2)
                out.extend(h.to_bytes(2, "little"))
            self.prediction[self.last_hash] = quad
        else:
            sig.push(CHEETAH_PREDICTED_FLAG, 2)
        self.last_hash = h

    def decode_quad_by_flag(self, flag: int, inp: bytes, pos: int) -> tuple[int, int]:
        if flag == PLAIN_FLAG:
            quad = int.from_bytes(inp[pos:pos + 4], "little")
            pos += 4
            h = _hash(quad)
            self.chunk_b[h] = self.chunk_a[h]
            self.chunk_a[h] = quad
            self.prediction[self.last_hash] = quad
        elif flag == CHEETAH_MAP_A_FLAG:
            h = int.from_bytes(inp[pos:pos + 2], "little")
            pos += 2
            quad = self.chunk_a[h]
            self.prediction[self.last_hash] = quad
        elif flag == CHEETAH_MAP_B_FLAG:
            h = int.from_bytes(inp[pos:pos + 2], "little")
            pos += 2
            quad = self.chunk_b[h]
            self.chunk_b[h] = self.chunk_a[h]
            self.chunk_a[h] = quad
            self.prediction[self.last_hash] = quad
        else:  # predicted
            quad = self.prediction[self.last_hash]
            h = _hash(quad)
        self.last_hash = h
        return quad, pos


class ScalarLion(_ScalarCodec):
    """Lion: dual dictionary + 5-deep prediction queue, 3-bit flags,
    6-byte signatures (reference: lion.rs:59-352)."""

    spec = LION

    def __init__(self) -> None:
        self.clear_state()

    def clear_state(self) -> None:
        self.last_hash = 0
        self.chunk_a = [0] * (1 << HASH_BITS)
        self.chunk_b = [0] * (1 << HASH_BITS)
        # prediction queue: pred[h] = [next_a..next_e]
        self.pred = [[0, 0, 0, 0, 0] for _ in range(1 << HASH_BITS)]

    def write_signature(self, out: bytearray, sig: _Sig) -> None:
        # Only 6 of 8 bytes are written (reference: lion.rs:334-336)
        out[sig.pos:sig.pos + 6] = sig.value.to_bytes(8, "little")[:6]

    def read_signature(self, inp: bytes, pos: int) -> tuple[int, int]:
        # reference: lion.rs:339-351 -- if <=7 bytes remain read exactly 6
        # and zero-pad, else read 8, rewind 2, mask to 48 bits.
        if len(inp) - pos <= 7:
            value = int.from_bytes(inp[pos:pos + 6], "little")
            return value, pos + 6
        value = int.from_bytes(inp[pos:pos + 8], "little") & 0x0000FFFFFFFFFFFF
        return value, pos + 6

    def _promote(self, h_ctx: int, depth: int, quad: int) -> None:
        """Hit at `depth` promotes to front, shifting 0..depth-1 down;
        miss (depth=5) shifts the whole queue (reference: lion.rs:50-57,
        229-263)."""
        q = self.pred[h_ctx]
        for k in range(min(depth, 4), 0, -1):
            q[k] = q[k - 1]
        q[0] = quad

    def encode_quad(self, quad: int, out: bytearray, sig: _Sig) -> None:
        h = _hash(quad)
        q = self.pred[self.last_hash]
        if q[0] == quad:
            sig.push(LION_PREDICTED_A_FLAG, 3)
        elif q[1] == quad:
            sig.push(LION_PREDICTED_B_FLAG, 3)
            self._promote(self.last_hash, 1, quad)
        elif q[2] == quad:
            sig.push(LION_PREDICTED_C_FLAG, 3)
            self._promote(self.last_hash, 2, quad)
        elif q[3] == quad:
            sig.push(LION_PREDICTED_D_FLAG, 3)
            self._promote(self.last_hash, 3, quad)
        elif q[4] == quad:
            sig.push(LION_PREDICTED_E_FLAG, 3)
            self._promote(self.last_hash, 4, quad)
        elif self.chunk_a[h] == quad:
            sig.push(LION_MAP_A_FLAG, 3)
            out.extend(h.to_bytes(2, "little"))
            self._promote(self.last_hash, 5, quad)
        elif self.chunk_b[h] == quad:
            sig.push(LION_MAP_B_FLAG, 3)
            out.extend(h.to_bytes(2, "little"))
            self.chunk_b[h] = self.chunk_a[h]
            self.chunk_a[h] = quad
            self._promote(self.last_hash, 5, quad)
        else:
            sig.push(PLAIN_FLAG, 3)
            out.extend(quad.to_bytes(4, "little"))
            self.chunk_b[h] = self.chunk_a[h]
            self.chunk_a[h] = quad
            self._promote(self.last_hash, 5, quad)
        self.last_hash = h

    def decode_quad_by_flag(self, flag: int, inp: bytes, pos: int) -> tuple[int, int]:
        ctx = self.last_hash
        if flag == PLAIN_FLAG:
            quad = int.from_bytes(inp[pos:pos + 4], "little")
            pos += 4
            h = _hash(quad)
            self.chunk_b[h] = self.chunk_a[h]
            self.chunk_a[h] = quad
            self._promote(ctx, 5, quad)
        elif flag == LION_MAP_A_FLAG:
            h = int.from_bytes(inp[pos:pos + 2], "little")
            pos += 2
            quad = self.chunk_a[h]
            self._promote(ctx, 5, quad)
        elif flag == LION_MAP_B_FLAG:
            h = int.from_bytes(inp[pos:pos + 2], "little")
            pos += 2
            quad = self.chunk_b[h]
            self.chunk_b[h] = self.chunk_a[h]
            self.chunk_a[h] = quad
            self._promote(ctx, 5, quad)
        else:
            depth = flag - LION_PREDICTED_A_FLAG  # 0..4
            quad = self.pred[ctx][depth]
            h = _hash(quad)
            if depth > 0:
                self._promote(ctx, depth, quad)
        self.last_hash = h
        return quad, pos


SCALAR_CODECS = {
    "chameleon": ScalarChameleon,
    "cheetah": ScalarCheetah,
    "lion": ScalarLion,
}
