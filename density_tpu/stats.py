"""Observability: per-stream/per-block compression statistics.

The reference has no observability beyond a bench-side ratio print
(reference: benches/density.rs:26). This framework computes structured
stats as device arrays (flag histogram, per-block sizes, copy-block
count) during or after encode and exposes them host-side
(SURVEY.md §5 'metrics / logging / observability').
"""

from __future__ import annotations

import dataclasses

import numpy as np

from density_tpu.constants import SPECS


@dataclasses.dataclass
class StreamStats:
    codec: str
    original_bytes: int
    compressed_bytes: int
    n_blocks: int
    copy_blocks: int
    flag_histogram: dict[str, int]

    @property
    def ratio(self) -> float:
        return (self.original_bytes / self.compressed_bytes
                if self.compressed_bytes else 0.0)


_FLAG_NAMES = {
    "chameleon": {0: "plain", 1: "map"},
    "cheetah": {0: "plain", 1: "map_a", 2: "map_b", 3: "predicted"},
    "lion": {0: "plain", 1: "pred_a", 2: "pred_b", 3: "pred_c",
             4: "pred_d", 5: "pred_e", 6: "map_a", 7: "map_b"},
}


def stream_stats(codec: str, data: bytes, compressed: bytes) -> StreamStats:
    """Analyze a compressed bare stream via the native scanner + token
    walk (host-side; used for reporting, not on the hot path)."""
    from density_tpu import native
    spec = SPECS[codec]
    in_off, out_off, is_copy = native.scan(codec, compressed)
    flag_bits = spec.flag_bits
    hist = {name: 0 for name in _FLAG_NAMES[codec].values()}
    mask = (1 << flag_bits) - 1
    sig_bytes = spec.sig_bytes
    for b, off in enumerate(in_off):
        if is_copy[b]:
            continue
        sig = int.from_bytes(
            compressed[off:off + sig_bytes].ljust(8, b"\x00"), "little")
        end_out = out_off[b + 1] if b + 1 < len(out_off) else len(data)
        n_tokens = min(spec.quads_per_block,
                       max(0, (end_out - out_off[b]) // 4))
        for q in range(n_tokens):
            hist[_FLAG_NAMES[codec][sig & mask]] += 1
            sig >>= flag_bits
    return StreamStats(
        codec=codec,
        original_bytes=len(data),
        compressed_bytes=len(compressed),
        n_blocks=len(in_off),
        copy_blocks=int(np.asarray(is_copy).sum()),
        flag_histogram=hist,
    )
