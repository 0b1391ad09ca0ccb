"""Benchmark harness (driver entry): prints ONE JSON line on stdout.

Mirrors the reference bench methodology (reference: benches/density.rs
-- throughput over a ~10 MB text corpus, ratio print, full round-trip
equality assert before timing decode) on TPU. Detailed per-codec
results go to stderr; stdout carries the headline metric:

    chameleon end-to-end encode GB/s vs the reference's published
    single-core 2.156 GB/s (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _time_best(fn, repeats=5):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from benches.corpus import corpus_bytes
    from density_tpu import container, native

    data = corpus_bytes()
    n = len(data)
    gb = n / 1e9

    baselines = {  # reference single-core numbers, BASELINE.md
        "chameleon": {"enc": 2.156, "dec": 2.952, "ratio": 1.749},
        "cheetah": {"enc": 1.191, "dec": 1.732, "ratio": 1.860},
        "lion": {"enc": 0.7004, "dec": 1.076, "ratio": 1.966},
    }

    results = {}
    stream_size = 1 << 20
    for codec in ["chameleon", "cheetah", "lion"]:
        # warmup (compile)
        blob = container.compress(data, codec, stream_size=stream_size)
        dec = container.decompress(blob)
        assert dec == data, f"{codec} round-trip failed"
        ratio = n / len(blob)

        t_enc, blob = _time_best(
            lambda: container.compress(data, codec, stream_size=stream_size),
            repeats=3)
        t_dec, dec = _time_best(
            lambda: container.decompress(blob), repeats=3)
        assert dec == data

        b = baselines[codec]
        results[codec] = {
            "encode_gbps": gb / t_enc,
            "decode_gbps": gb / t_dec,
            "ratio": ratio,
            "enc_vs_ref": (gb / t_enc) / b["enc"],
            "dec_vs_ref": (gb / t_dec) / b["dec"],
            "ratio_vs_ref": ratio / b["ratio"],
        }
        print(f"[bench] {codec}: encode {gb / t_enc:.3f} GB/s "
              f"({results[codec]['enc_vs_ref']:.2f}x ref), "
              f"decode {gb / t_dec:.3f} GB/s "
              f"({results[codec]['dec_vs_ref']:.2f}x ref), "
              f"ratio {ratio:.3f} ({results[codec]['ratio_vs_ref']:.2f}x ref)",
              file=sys.stderr)

    # native host codec as a sanity line
    t0 = time.perf_counter()
    nb = native.encode("chameleon", data)
    t_native = time.perf_counter() - t0
    print(f"[bench] native chameleon encode {gb / t_native:.3f} GB/s, "
          f"ratio {n / len(nb):.3f}", file=sys.stderr)

    headline = results["chameleon"]["encode_gbps"]
    print(json.dumps({
        "metric": "chameleon_encode_throughput",
        "value": round(headline, 4),
        "unit": "GB/s",
        "vs_baseline": round(results["chameleon"]["enc_vs_ref"], 4),
        "detail": {k: {m: round(v, 4) for m, v in r.items()}
                   for k, r in results.items()},
    }))


if __name__ == "__main__":
    main()
