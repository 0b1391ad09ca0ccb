"""Benchmark harness (driver entry): prints ONE JSON line on stdout.

Mirrors the reference bench methodology (reference: benches/density.rs
-- throughput over a ~10 MB text corpus, ratio print, full round-trip
equality assert before timing decode) on TPU.

Reported per codec:
  * end-to-end GB/s: bytes-in to bytes-out including host<->device
    transfers and container assembly;
  * device GB/s: compute-resident throughput (input already in HBM,
    output left in HBM), the per-chip number that scales across a pod;
  * ratio, compared against the *reference codec on the same corpus*
    (single stream, via the native oracle), not against the published
    dickens ratio -- corpora differ.

Headline (stdout JSON): chameleon device encode GB/s vs the
reference's published single-core 2.156 GB/s.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _sync(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[-1]
    return np.asarray(leaf[(0,) * leaf.ndim])


def _time_best(fn, repeats=3):
    best = float("inf")
    out = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def _stage_words(codec, data, stream_size):
    from density_tpu.engine import layout
    from density_tpu.constants import SPECS
    import jax.numpy as jnp
    spec = SPECS[codec]
    n = len(data)
    S = -(-n // stream_size)
    cap = layout.bucket_bytes(stream_size, spec.block_size)
    padded = np.zeros(S * cap, np.uint8)
    v = padded.reshape(S, cap)
    buf = np.frombuffer(data, np.uint8)
    for s in range(S):
        c = buf[s * stream_size:(s + 1) * stream_size]
        v[s, :c.size] = c
    words = jnp.asarray(v.view("<u2").astype(np.uint32).reshape(S, cap // 2))
    nbytes = jnp.asarray(np.clip(
        n - np.arange(S) * stream_size, 0, stream_size).astype(np.int32))
    return words, nbytes


def _device_encode_time(codec, data, stream_size, repeats=3, chain=8):
    """Device-resident encode throughput: input pre-staged in HBM,
    output left in HBM.

    The attached TPU sits behind a tunnel with a ~26 ms dispatch+sync
    round trip, so a single timed dispatch measures the tunnel, not the
    chip. Chain `chain` dependent encodes inside one jit (separated by
    optimization barriers so XLA cannot hoist or fold them) and divide;
    this is the per-chip number that scales across a pod.
    """
    import jax
    import jax.numpy as jnp
    import importlib
    mod = importlib.import_module(f"density_tpu.codecs.{codec}")
    words, nbytes = _stage_words(codec, data, stream_size)
    # pick the variant the dispatcher would pick (jit traces can't):
    # Pallas only where the whole plan is Pallas (see layout.
    # fused_dispatch -- the XLA-plan+Pallas-pack combo stalls the
    # remote AOT compiler for cheetah/lion)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    pallas = mod.PIPELINE.encode_fused_pallas
    full_pallas_plan = getattr(mod, "plan_fast_pallas", None) is not None
    n_q = words.shape[1] // 2
    if on_tpu and pallas is not None and full_pallas_plan \
            and n_q % 4096 == 0:
        fused = pallas
    else:
        fused = mod.PIPELINE.encode_fused_xla

    @jax.jit
    def chained(words, nbytes):
        def step(_, carry):
            w, acc = jax.lax.optimization_barrier(carry)
            out, totals, ok = fused(w, nbytes)
            dep = (jnp.sum(totals) + jnp.sum(out[0, :8]).astype(jnp.int32)
                   + jnp.sum(ok).astype(jnp.int32))
            return (w, acc ^ dep)
        return jax.lax.fori_loop(0, chain, step, (words, jnp.int32(0)))[1]

    _sync(chained(words, nbytes))  # warm/compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(chained(words, nbytes))
        best = min(best, time.perf_counter() - t0)
    return best / chain


def _device_decode_time(blob, repeats=3, chain=8):
    """Device-resident decode throughput (host scan/prep excluded),
    chained like _device_encode_time."""
    import jax
    import jax.numpy as jnp
    from density_tpu.parallel import sharding
    codec, device_args, _, _ = sharding.decode_prep(blob)
    words, woff, copyf, nb_real, out_lens = device_args

    @jax.jit
    def chained(words, woff, copyf, nb_real, out_lens):
        def step(_, carry):
            w, acc = jax.lax.optimization_barrier(carry)
            out = sharding._decode_batch(w, woff, copyf, nb_real,
                                         out_lens, codec)
            return (w, acc ^ jnp.sum(out[0, :8]).astype(jnp.int32))
        return jax.lax.fori_loop(0, chain, step, (words, jnp.int32(0)))[1]

    _sync(chained(words, woff, copyf, nb_real, out_lens))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(chained(words, woff, copyf, nb_real, out_lens))
        best = min(best, time.perf_counter() - t0)
    return best / chain


def main():
    from benches.corpus import corpus_bytes
    from density_tpu import container, native

    data = corpus_bytes()
    n = len(data)
    gb = n / 1e9

    # reference single-core throughputs (BASELINE.md) and the reference
    # codec's ratio on THIS corpus (native oracle, single stream)
    ref_tp = {"chameleon": (2.156, 2.952), "cheetah": (1.191, 1.732),
              "lion": (0.7004, 1.076)}

    results = {}
    stream_size = 1 << 20
    # Soft budget: cheetah/lion decode compiles are minutes-long on a
    # cold cache behind the tunnel; the headline (chameleon, first) must
    # always reach the JSON line even if the driver's clock runs short.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1200"))
    t_start = time.perf_counter()
    for codec in ["chameleon", "cheetah", "lion"]:
        if codec != "chameleon" and (
                time.perf_counter() - t_start > budget_s):
            print(f"[bench] skipping {codec}: over {budget_s:.0f}s budget",
                  file=sys.stderr)
            continue
        ref_ratio = n / len(native.encode(codec, data))

        try:
            blob = container.compress(data, codec, stream_size=stream_size)
            dec = container.decompress(blob)
        except Exception as e:  # noqa: BLE001 -- keep the headline alive
            if codec == "chameleon":
                raise
            print(f"[bench] {codec} failed: {e!r}", file=sys.stderr)
            continue
        assert dec == data, f"{codec} round-trip failed"
        ratio = n / len(blob)

        t_enc, blob = _time_best(
            lambda: container.compress(data, codec, stream_size=stream_size))
        t_dec, dec = _time_best(lambda: container.decompress(blob))
        assert dec == data
        t_dev = _device_encode_time(codec, data, stream_size)
        t_ddec = _device_decode_time(blob)

        enc_ref, dec_ref = ref_tp[codec]
        results[codec] = {
            "encode_gbps": gb / t_enc,
            "decode_gbps": gb / t_dec,
            "device_encode_gbps": gb / t_dev,
            "device_decode_gbps": gb / t_ddec,
            "ratio": ratio,
            "ref_ratio_same_corpus": ref_ratio,
            "enc_vs_ref": (gb / t_enc) / enc_ref,
            "dev_enc_vs_ref": (gb / t_dev) / enc_ref,
            "dec_vs_ref": (gb / t_dec) / dec_ref,
            "dev_dec_vs_ref": (gb / t_ddec) / dec_ref,
            "ratio_vs_ref": ratio / ref_ratio,
        }
        r = results[codec]
        print(f"[bench] {codec}: encode {r['encode_gbps']:.3f} GB/s e2e / "
              f"{r['device_encode_gbps']:.3f} GB/s device "
              f"({r['dev_enc_vs_ref']:.2f}x ref), "
              f"decode {r['decode_gbps']:.3f} GB/s e2e / "
              f"{r['device_decode_gbps']:.3f} GB/s device "
              f"({r['dev_dec_vs_ref']:.2f}x ref), "
              f"ratio {ratio:.3f} ({r['ratio_vs_ref']:.3f}x ref same-corpus)",
              file=sys.stderr)

    t0 = time.perf_counter()
    nb = native.encode("chameleon", data)
    t_native = time.perf_counter() - t0
    print(f"[bench] native chameleon encode {gb / t_native:.3f} GB/s, "
          f"ratio {n / len(nb):.3f}", file=sys.stderr)

    headline = results["chameleon"]["device_encode_gbps"]
    print(json.dumps({
        "metric": "chameleon_device_encode_throughput",
        "value": round(headline, 4),
        "unit": "GB/s",
        "vs_baseline": round(results["chameleon"]["dev_enc_vs_ref"], 4),
        "detail": {k: {m: round(v, 4) for m, v in r.items()}
                   for k, r in results.items()},
    }))


if __name__ == "__main__":
    main()
