"""Competitor baselines on the same corpus.

The reference benches lz4 and snappy for pareto context (reference:
benches/lz4.rs:37-41, benches/snappy.rs).  lz4 runs via the vendored
clean-room LZ4-block codec in the native runtime (libdensity.cpp --
greedy matcher, same block format as lz4_flex), so the actual
speed/ratio point appears beside the three codecs; the stdlib codecs
(zlib at low level, lzma, bz2) fill out the pareto context.  snappy
has no library in this image and no vendored stand-in (its format is
close enough to lz4 that the lz4 point anchors the same region).  Run:

    python -m benches.competitors
"""

from __future__ import annotations

import bz2
import lzma
import sys
import time
import zlib


def bench_one(name, comp, decomp, data):
    t0 = time.perf_counter()
    blob = comp(data)
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = decomp(blob)
    t_d = time.perf_counter() - t0
    assert out == data
    gb = len(data) / 1e9
    print(f"[competitor] {name}: ratio {len(data)/len(blob):.3f}, "
          f"compress {gb/t_c:.3f} GB/s, decompress {gb/t_d:.3f} GB/s",
          file=sys.stderr)
    return {"name": name, "ratio": len(data) / len(blob),
            "compress_gbps": gb / t_c, "decompress_gbps": gb / t_d}


def run(data: bytes):
    results = []
    from density_tpu import native
    if native.is_available():
        results.append(bench_one(
            "lz4-block", native.lz4_compress,
            lambda b: native.lz4_decompress(b, len(data)), data))
    results.append(bench_one(
        "zlib-1", lambda d: zlib.compress(d, 1), zlib.decompress, data))
    results.append(bench_one(
        "zlib-6", lambda d: zlib.compress(d, 6), zlib.decompress, data))
    results.append(bench_one(
        "bz2-1", lambda d: bz2.compress(d, 1), bz2.decompress, data))
    results.append(bench_one(
        "lzma-0", lambda d: lzma.compress(d, preset=0), lzma.decompress,
        data))
    return results


if __name__ == "__main__":
    from benches.corpus import corpus_bytes
    run(corpus_bytes())
