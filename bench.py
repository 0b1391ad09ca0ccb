"""Benchmark harness (driver entry): prints JSON headline lines on stdout.

Mirrors the reference bench methodology (reference: benches/density.rs
-- throughput over a ~10 MB text corpus, ratio print, full round-trip
equality assert before timing decode) on TPU.

Reported per codec:
  * device GB/s: compute-resident throughput (input already in HBM,
    output left in HBM), the per-chip number that scales across a pod;
  * decode: chameleon decodes on device (Pallas unpack + bigsort);
    cheetah/lion production decode of compressible data is the
    stream-parallel host C++ pool (decode_pool_gbps) -- the per-quad
    context chain (reference cheetah.rs:148) is serial by format
    design (docs/PLAN.md);
  * end-to-end GB/s: bytes-in to bytes-out including host<->device
    transfers and container assembly (tunnel-bound on this rig);
  * ratio, compared against the *reference codec on the same corpus*
    (single stream, via the native oracle), not against the published
    dickens ratio -- corpora differ.

Headline (stdout JSON): chameleon device encode GB/s vs the
reference's published single-core 2.156 GB/s.

Schedule (round-3 postmortem: two of three round artifacts timed out
with no lion numbers at all): the never-measured codec runs FIRST and
device metrics run before any e2e timing, so the codecs x metrics
matrix fills in strictly increasing order of historical availability:

  Phase D   device encode + device/pool decode, lion -> cheetah ->
            chameleon (1 MiB streams: the padding-free parallel grain)
  Phase E   ratio + e2e round-trip at library defaults, same order
  Phase F   native single-core baseline, optional --profile trace

Resilience contract (the driver may kill this process at any time):
the headline JSON is printed (and flushed) after EVERY new number; the
last JSON line on stdout is always the most complete result.  A
watchdog thread hard-exits 0 just before the budget (BENCH_BUDGET_S,
default 1200 s) expires, emitting the final artifact first -- a cold
compile can overshoot a soft deadline check, but it cannot outrun
os._exit.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

DEADLINE = None  # set in main()
RESULTS: dict = {}
_EMIT_LOCK = threading.Lock()
_N = 0

# reference single-core (encode, decode) GB/s -- BASELINE.md
REF_TP = {"chameleon": (2.156, 2.952), "cheetah": (1.191, 1.732),
          "lion": (0.7004, 1.076)}

# Device-phase stream grain per codec (throughput/ratio knob, measured
# r5 sweep -- docs/PLAN.md): 2^16-quad (256 KiB) streams keep every
# sort single-segment with packed 1-key networks (1.3x encode over the
# r4 1 MiB grain at a 5% device-grain ratio cost). The grain's own
# ratio is reported as `device_ratio`; the library-default ratios
# (1.000x the reference) are the phase-E `ratio` numbers.
# BENCH_STREAM_SIZE overrides all three.
DEVICE_STREAM_SIZES = {"chameleon": 1 << 18, "cheetah": 1 << 18,
                       "lion": 1 << 18}


def _emit():
    """Print the (current) headline JSON line on stdout, flushed."""
    with _EMIT_LOCK:
        ch = RESULTS.get("chameleon", {})
        print(json.dumps({
            "metric": "chameleon_device_encode_throughput",
            "value": round(ch.get("device_encode_gbps", 0.0), 4),
            "unit": "GB/s",
            "vs_baseline": round(ch.get("dev_enc_vs_ref", 0.0), 4),
            "detail": {k: {m: round(v, 4) for m, v in r.items()}
                       for k, r in RESULTS.items()},
        }), flush=True)


def _watchdog(deadline):
    while True:
        left = deadline - time.perf_counter()
        if left <= 0:
            break
        time.sleep(min(left, 5.0))
    print("[bench] watchdog: budget exhausted, emitting final artifact",
          file=sys.stderr)
    _emit()
    os._exit(0)


def _left():
    return DEADLINE - time.perf_counter()


def _sync(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[-1]
    return np.asarray(leaf[(0,) * leaf.ndim])


def _stage_words(codec, data, stream_size):
    """Stage data exactly as the production path does -- same shapes
    AND same NamedSharding, so the compile here is byte-for-byte the
    program container.compress dispatches (sharding is part of the jit
    cache key: unsharded staging caused a second multi-minute compile
    of the identical pipeline in the r4 shakedown runs)."""
    from density_tpu.engine import layout
    from density_tpu.constants import SPECS
    from density_tpu.parallel import sharding
    from density_tpu.parallel.mesh import default_mesh, stream_sharding
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
    sh = stream_sharding(default_mesh())
    quads = sharding._put(jnp.asarray(v.view("<u4").reshape(S, cap // 4)),
                          sh)
    nbytes = sharding._put(jnp.asarray(np.clip(
        n - np.arange(S) * stream_size, 0,
        stream_size).astype(np.int32)), sh)
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


def _time_dispatches(fn_call, k, repeats):
    """Time `k` ASYNC dispatches of fn_call with one final sync.

    The attached TPU sits behind a tunnel with a ~27 ms dispatch+sync
    round trip, but async dispatches pipeline: measured overhead is
    ~1 ms/dispatch at depth 64.  Timing the production jit callable
    directly (instead of a separate barrier-chained jit) avoids a
    SECOND multi-minute XLA compile of the same pipeline per codec --
    the round-3 artifact starved on exactly those duplicate compiles.
    Executions on one device serialize in order, so syncing the last
    dispatch waits for all k.
    """
    _sync(fn_call())  # warm/compile (shares the jit cache with the
    #                   production path: same callable, same shapes)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn_call()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / k)
        if _left() < 30:
            break
    return best


def _device_encode_time(codec, data, stream_size, repeats=2, k=8):
    """Device-resident encode throughput: input pre-staged in HBM,
    output left in HBM; the per-chip number that scales across a pod."""
    words, nbytes = _stage_words(codec, data, stream_size)
    fused = _pick_encode_fn(codec, words)
    return _time_dispatches(lambda: fused(words, nbytes), k, repeats)


def _device_decode_time(blob, repeats=2, k=8):
    """Device-resident decode throughput (host scan/prep excluded)."""
    from density_tpu.parallel import sharding
    codec, device_args, _, host_meta = sharding.decode_prep(blob)
    fn = sharding.pick_decode_fn(codec, device_args,
                                 bool(host_meta[2].any()))
    return _time_dispatches(lambda: fn(*device_args), k, repeats)


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
    global DEADLINE, _N
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1200"))
    DEADLINE = time.perf_counter() + budget_s
    threading.Thread(target=_watchdog, args=(DEADLINE - 15.0,),
                     daemon=True).start()

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
    _N = n
    gb = n / 1e9

    # device metrics: per-codec grain (DEVICE_STREAM_SIZES); e2e +
    # ratio: the per-codec library default (ratio-oriented -- see
    # container.DEFAULT_STREAM_SIZES)
    env_ss = os.environ.get("BENCH_STREAM_SIZE")

    def stream_size_for(codec):
        return int(env_ss) if env_ss else DEVICE_STREAM_SIZES[codec]

    env_e2e = os.environ.get("BENCH_E2E_STREAM_SIZE")

    def e2e_stream_for(codec):
        return int(env_e2e) if env_e2e else \
            container.default_stream_size(codec)

    profile = "--profile" in sys.argv
    # lion first: the codec the round-2/3 artifacts never measured.
    codecs = ["lion", "cheetah", "chameleon"]
    dev_blobs = {}

    # --- Phase D: device numbers for every codec before any e2e ------
    # Device phase uses whole streams only: the ragged final stream
    # would dispatch at its own bucketed capacity, costing one MORE
    # multi-minute compile per codec for a number the full streams
    # already give.
    for codec in codecs:
        if _left() < 45:
            print(f"[bench] {codec}: phase D skipped (budget)",
                  file=sys.stderr)
            continue
        stream_size = stream_size_for(codec)
        n_dev_bytes = max(stream_size, n // stream_size * stream_size)
        data_dev = data[:n_dev_bytes]
        gb_dev = len(data_dev) / 1e9
        r = RESULTS.setdefault(codec, {})
        r["device_stream_kib"] = stream_size >> 10
        enc_ref, dec_ref = REF_TP[codec]
        try:
            t_dev = _device_encode_time(codec, data_dev, stream_size)
            r["device_encode_gbps"] = gb_dev / t_dev
            r["dev_enc_vs_ref"] = (gb_dev / t_dev) / enc_ref
            _emit()
        except Exception as e:  # noqa: BLE001 -- keep the artifact alive
            print(f"[bench] {codec} device encode failed: {e!r}",
                  file=sys.stderr)
        if _left() < 45:
            continue
        try:
            blob = container.compress(data_dev, codec,
                                      stream_size=stream_size)
            dec = container.decompress(blob)
            assert dec == data_dev, f"{codec} device-grain round-trip failed"
            r["device_ratio"] = len(data_dev) / len(blob)
            dev_blobs[codec] = blob
            if codec == "chameleon":
                t_ddec = _device_decode_time(blob)
                r["device_decode_gbps"] = gb_dev / t_ddec
                r["dev_dec_vs_ref"] = (gb_dev / t_ddec) / dec_ref
            else:
                # production decode of compressible data: the
                # stream-parallel host C++ pool (docs/PLAN.md)
                t_pool = _pool_decode_time(codec, blob)
                r["decode_pool_gbps"] = gb_dev / t_pool
                r["pool_dec_vs_ref"] = (gb_dev / t_pool) / dec_ref
            _emit()
        except Exception as e:  # noqa: BLE001
            print(f"[bench] {codec} decode timing failed: {e!r}",
                  file=sys.stderr)

    # --- Phase E: ratio + e2e at library defaults --------------------
    for codec in codecs:
        if _left() < 45:
            print(f"[bench] {codec}: phase E skipped (budget)",
                  file=sys.stderr)
            continue
        r = RESULTS.setdefault(codec, {})
        enc_ref, dec_ref = REF_TP[codec]
        try:
            ref_ratio = n / len(native.encode(codec, data))
            # warm pass: compiles + the round-trip assert + ratio
            # (reference discipline: assert equality BEFORE timing,
            # benches/density.rs:41-45)
            blob = container.compress(data, codec,
                                      stream_size=e2e_stream_for(codec))
            dec = container.decompress(blob)
            assert dec == data, f"{codec} round-trip failed"
            r["ratio"] = n / len(blob)
            r["ref_ratio_same_corpus"] = ref_ratio
            r["ratio_vs_ref"] = r["ratio"] / ref_ratio
            _emit()
            # timed pass, warm
            t_enc = time.perf_counter()
            blob = container.compress(data, codec,
                                      stream_size=e2e_stream_for(codec))
            t_enc = time.perf_counter() - t_enc
            t_dec = time.perf_counter()
            container.decompress(blob)
            t_dec = time.perf_counter() - t_dec
            r["encode_gbps"] = gb / t_enc
            r["decode_gbps"] = gb / t_dec
            r["enc_vs_ref"] = (gb / t_enc) / enc_ref
            r["dec_vs_ref"] = (gb / t_dec) / dec_ref
            _emit()
        except Exception as e:  # noqa: BLE001
            print(f"[bench] {codec} phase E failed: {e!r}",
                  file=sys.stderr)

    for codec in codecs:
        r = RESULTS.get(codec)
        if not r:
            continue
        dev_dec = r.get("device_decode_gbps") or r.get("decode_pool_gbps", 0)
        dd_vs = r.get("dev_dec_vs_ref") or r.get("pool_dec_vs_ref", 0)
        print(f"[bench] {codec}: device encode "
              f"{r.get('device_encode_gbps', 0):.3f} GB/s "
              f"({r.get('dev_enc_vs_ref', 0):.2f}x ref), "
              f"decode {dev_dec:.3f} GB/s ({dd_vs:.2f}x ref), "
              f"e2e {r.get('encode_gbps', 0):.3f}/"
              f"{r.get('decode_gbps', 0):.3f} GB/s, "
              f"ratio {r.get('ratio', 0):.3f} "
              f"({r.get('ratio_vs_ref', 0):.3f}x ref same-corpus)",
              file=sys.stderr)
    _emit()

    # --- Phase F: native single-core baseline + optional profile -----
    if _left() > 30:
        t0 = time.perf_counter()
        nb = native.encode("chameleon", data)
        t_native = time.perf_counter() - t0
        print(f"[bench] native chameleon encode {gb / t_native:.3f} GB/s, "
              f"ratio {n / len(nb):.3f}", file=sys.stderr)

    if profile and "chameleon" in dev_blobs and _left() > 60:
        _profile("chameleon", data, stream_size_for("chameleon"),
                 dev_blobs["chameleon"])

    _emit()


if __name__ == "__main__":
    main()
