"""Benchmark harness (driver entry): prints JSON headline lines on stdout.

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

Resilience contract (the driver may kill this process at any time):
the headline JSON is printed (and flushed) as soon as the first codec
finishes, then RE-printed, extended, after every additional codec; the
last JSON line on stdout is always the most complete result. Every
phase runs under a deadline so one slow cold compile cannot starve the
artifact. `--profile` captures a jax.profiler trace of one device
encode+decode to ./profile_trace/.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

DEADLINE = None  # set in main()


def _emit(results, n):
    """Print the (current) headline JSON line on stdout, flushed."""
    if "chameleon" not in results:
        return
    headline = results["chameleon"].get("device_encode_gbps", 0.0)
    print(json.dumps({
        "metric": "chameleon_device_encode_throughput",
        "value": round(headline, 4),
        "unit": "GB/s",
        "vs_baseline": round(
            results["chameleon"].get("dev_enc_vs_ref", 0.0), 4),
        "detail": {k: {m: round(v, 4) for m, v in r.items()}
                   for k, r in results.items()},
    }), flush=True)


def _left():
    return DEADLINE - time.perf_counter()


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
        if _left() < 60:
            break
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
    quads = jnp.asarray(v.view("<u4").reshape(S, cap // 4))
    nbytes = jnp.asarray(np.clip(
        n - np.arange(S) * stream_size, 0, stream_size).astype(np.int32))
    return quads, nbytes


def _pick_encode_fn(codec, quads):
    """The fused-encode variant the dispatcher would pick (jit traces
    can't dispatch on env/host state)."""
    import jax
    import importlib
    mod = importlib.import_module(f"density_tpu.codecs.{codec}")
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    pallas = mod.PIPELINE.encode_fused_pallas
    full_pallas_plan = getattr(mod, "plan_fast_pallas", None) is not None
    n_q = quads.shape[1]
    if on_tpu and pallas is not None and full_pallas_plan \
            and n_q % 4096 == 0:
        return pallas
    return mod.PIPELINE.encode_fused_xla


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
    words, nbytes = _stage_words(codec, data, stream_size)
    fused = _pick_encode_fn(codec, words)

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
    codec, device_args, _, host_meta = sharding.decode_prep(blob)
    words, woff, copyf, nb_real, out_lens = device_args
    fn = sharding.pick_decode_fn(codec, device_args,
                                 bool(host_meta[2].any()))

    @jax.jit
    def chained(words, woff, copyf, nb_real, out_lens):
        def step(_, carry):
            w, acc = jax.lax.optimization_barrier(carry)
            out, _ = fn(w, woff, copyf, nb_real, out_lens)
            return (w, acc ^ jnp.sum(out[0, :8]).astype(jnp.int32))
        return jax.lax.fori_loop(0, chain, step, (words, jnp.int32(0)))[1]

    _sync(chained(words, woff, copyf, nb_real, out_lens))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(chained(words, woff, copyf, nb_real, out_lens))
        best = min(best, time.perf_counter() - t0)
    return best / chain


def _pool_decode_time(codec, blob, repeats=3):
    """Host thread-pool decode throughput (cheetah/lion production
    decode path -- per-stream serial chains, stream-parallel)."""
    from density_tpu import container, native
    codec_h, original_len, stream_size, lengths, off = \
        container.parse_header(blob)
    offsets = off + np.concatenate([[0], np.cumsum(lengths)])
    streams = [blob[offsets[s]:offsets[s + 1]]
               for s in range(len(lengths))]
    out_lens = np.clip(
        original_len - np.arange(len(lengths), dtype=np.int64)
        * stream_size, 0, stream_size)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        native.decode_many(codec, streams,
                           [int(x) for x in out_lens])
        best = min(best, time.perf_counter() - t0)
    return best


def _profile(codec, data, stream_size, blob):
    """Capture one jax.profiler trace of a device encode + decode."""
    import jax
    from density_tpu.parallel import sharding
    words, nbytes = _stage_words(codec, data, stream_size)
    fused = _pick_encode_fn(codec, words)
    _sync(fused(words, nbytes))  # compile outside the trace
    dcodec, device_args, _, host_meta = sharding.decode_prep(blob)
    dfn = sharding.pick_decode_fn(dcodec, device_args,
                                  bool(host_meta[2].any()))
    _sync(dfn(*device_args))
    tdir = os.path.join(os.path.dirname(__file__) or ".", "profile_trace")
    with jax.profiler.trace(tdir):
        _sync(fused(words, nbytes))
        _sync(dfn(*device_args))
    print(f"[bench] profiler trace written to {tdir}", file=sys.stderr)


def main():
    global DEADLINE
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    DEADLINE = time.perf_counter() + budget_s

    import jax
    # Persistent compile cache: cold remote compiles behind the tunnel
    # cost minutes; the cache makes every rerun (and the driver's run)
    # start warm.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # noqa: BLE001
        print(f"[bench] compile cache unavailable: {e!r}", file=sys.stderr)

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
    # device metrics: 1 MiB streams (padding-free parallel grain, all
    # kernels cached); e2e + ratio: the container default (8 MiB,
    # ratio-oriented -- see container.DEFAULT_STREAM_SIZE)
    stream_size = int(os.environ.get("BENCH_STREAM_SIZE", str(1 << 20)))
    env_e2e = os.environ.get("BENCH_E2E_STREAM_SIZE")

    def e2e_stream_for(codec):
        return int(env_e2e) if env_e2e else \
            container.default_stream_size(codec)
    profile = "--profile" in sys.argv
    first_blob = None
    blobs = {}
    codecs = ["chameleon", "cheetah", "lion"]

    # Phase A (every codec gets a floor before any decode timing runs):
    # ratio + e2e round-trip + device encode. Phase B: device decode.
    # Per-codec soft slices stop one slow cold compile from starving
    # the later codecs (round-2 postmortem: lion never got a number).
    for i, codec in enumerate(codecs):
        slice_end = time.perf_counter() + max(
            60.0, _left() * 0.55 / (len(codecs) - i))
        try:
            ref_ratio = n / len(native.encode(codec, data))
            blob = container.compress(data, codec,
                                      stream_size=e2e_stream_for(codec))
            dec = container.decompress(blob)
            assert dec == data, f"{codec} round-trip failed"
            ratio = n / len(blob)
            blobs[codec] = blob
            if first_blob is None:
                first_blob = blob
            enc_ref, dec_ref = ref_tp[codec]
            results[codec] = {
                "ratio": ratio,
                "ref_ratio_same_corpus": ref_ratio,
                "ratio_vs_ref": ratio / ref_ratio,
            }
            t_enc, blob = _time_best(lambda: container.compress(
                data, codec, stream_size=e2e_stream_for(codec)),
                repeats=1)
            t_dec, dec = _time_best(
                lambda: container.decompress(blob), repeats=1)
            assert dec == data
            results[codec]["encode_gbps"] = gb / t_enc
            results[codec]["decode_gbps"] = gb / t_dec
            results[codec]["enc_vs_ref"] = (gb / t_enc) / enc_ref
            results[codec]["dec_vs_ref"] = (gb / t_dec) / dec_ref
            _emit(results, n)
            if time.perf_counter() > slice_end and i + 1 < len(codecs):
                print(f"[bench] {codec}: deferring device encode "
                      f"(slice used)", file=sys.stderr)
                continue
            t_dev = _device_encode_time(codec, data, stream_size)
            results[codec]["device_encode_gbps"] = gb / t_dev
            results[codec]["dev_enc_vs_ref"] = (gb / t_dev) / enc_ref
            _emit(results, n)
        except Exception as e:  # noqa: BLE001 -- keep the headline alive
            if codec == "chameleon" and not results.get("chameleon"):
                raise
            print(f"[bench] {codec} phase A failed: {e!r}",
                  file=sys.stderr)
            continue

    # Phase A': any deferred device-encode numbers
    for codec in codecs:
        if codec in results and "device_encode_gbps" not in results[codec] \
                and _left() > 120:
            try:
                t_dev = _device_encode_time(codec, data, stream_size)
                results[codec]["device_encode_gbps"] = gb / t_dev
                results[codec]["dev_enc_vs_ref"] = (
                    gb / t_dev) / ref_tp[codec][0]
                _emit(results, n)
            except Exception as e:  # noqa: BLE001
                print(f"[bench] {codec} device encode failed: {e!r}",
                      file=sys.stderr)

    # Phase B: device decode. Chameleon: the Pallas unpack + sorter
    # path. Cheetah/lion: the device fixpoint only converges on
    # low-prediction data (the per-quad context chain is serial by
    # format design), so on compressible corpora their production
    # decode is the stream-parallel host pool -- measured here as
    # decode_pool_gbps (compressed bytes already host-resident).
    for codec in codecs:
        if codec not in results or codec not in blobs or _left() < 90:
            continue
        try:
            if codec == "chameleon":
                t_ddec = _device_decode_time(blobs[codec])
                results[codec]["device_decode_gbps"] = gb / t_ddec
                results[codec]["dev_dec_vs_ref"] = (
                    gb / t_ddec) / ref_tp[codec][1]
            else:
                t_pool = _pool_decode_time(codec, blobs[codec])
                results[codec]["decode_pool_gbps"] = gb / t_pool
                results[codec]["pool_dec_vs_ref"] = (
                    gb / t_pool) / ref_tp[codec][1]
            _emit(results, n)
        except Exception as e:  # noqa: BLE001
            print(f"[bench] {codec} decode timing failed: {e!r}",
                  file=sys.stderr)

    for codec in codecs:
        r = results.get(codec)
        if not r:
            continue
        print(f"[bench] {codec}: encode "
              f"{r.get('encode_gbps', 0):.3f} GB/s e2e / "
              f"{r.get('device_encode_gbps', 0):.3f} GB/s device "
              f"({r.get('dev_enc_vs_ref', 0):.2f}x ref), "
              f"decode {r.get('decode_gbps', 0):.3f} GB/s e2e / "
              f"{r.get('device_decode_gbps', 0):.3f} GB/s device "
              f"({r.get('dev_dec_vs_ref', 0):.2f}x ref), "
              f"ratio {r.get('ratio', 0):.3f} "
              f"({r.get('ratio_vs_ref', 0):.3f}x ref same-corpus)",
              file=sys.stderr)
    _emit(results, n)

    if _left() > 30:
        t0 = time.perf_counter()
        nb = native.encode("chameleon", data)
        t_native = time.perf_counter() - t0
        print(f"[bench] native chameleon encode {gb / t_native:.3f} GB/s, "
              f"ratio {n / len(nb):.3f}", file=sys.stderr)

    if profile and first_blob is not None and _left() > 60:
        _profile("chameleon", data, stream_size, first_blob)

    _emit(results, n)


if __name__ == "__main__":
    main()
