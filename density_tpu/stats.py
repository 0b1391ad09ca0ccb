"""Observability: per-stream/per-block compression statistics.

The reference has no observability beyond a bench-side ratio print
(reference: benches/density.rs:26). This framework computes structured
stats as device arrays (flag histogram, per-block sizes, copy-block
count) during or after encode and exposes them host-side
(SURVEY.md §5 'metrics / logging / observability').
"""

from __future__ import annotations

import dataclasses

import jax
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


def encode_stats(codec: str, data: bytes) -> StreamStats:
    """Device-computed encode-side statistics (SURVEY.md §5): run the
    device planner once and reduce the flag histogram, per-block
    encoded sizes, and copy-block count as device arrays -- only the
    final handful of scalars crosses to the host.  Matches
    stream_stats(codec, data, encode(data)) on the token counts."""
    import jax.numpy as jnp
    import importlib
    from density_tpu.engine import layout

    mod = importlib.import_module(f"density_tpu.codecs.{codec}")
    pipe = mod.PIPELINE
    spec = SPECS[codec]
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    n = buf.size
    if n == 0:
        return StreamStats(codec, 0, 0, 0, 0,
                           {v: 0 for v in _FLAG_NAMES[codec].values()})
    cap = layout.bucket_bytes(n, spec.block_size)
    padded = np.zeros(cap, np.uint8)
    padded[:n] = buf
    quads = jnp.asarray(padded.view("<u4")[None, :])
    nbytes = jnp.asarray(np.array([n], np.int32))

    # mirror run_encode's copy fixpoint (the plan is the stats source)
    S, n_q = quads.shape
    nb = n_q // pipe.Q
    copy = jnp.zeros((S, nb), bool)
    converged = False
    for it in range(layout.MAX_FIXED_POINT_ITERS):
        if it == 0 and pipe.plan_fast is not None:
            flags, pw, w0, w1, valid, bits = pipe.plan_fast(quads, nbytes)
        else:
            flags, pw, w0, w1, valid, bits = pipe.plan(quads, nbytes,
                                                       copy)
        new_copy = pipe.step_fsm(bits, nbytes)
        if not bool(jnp.any(new_copy != copy)):
            converged = True
            break
        copy = new_copy
    if not converged:
        # pathological stream: the plan in hand was made under a stale
        # copy hypothesis. encode() falls back to the native encoder
        # here (layout.run_encode surfaces `converged`); report stats
        # for the bytes that encode would actually produce.
        from density_tpu import native
        return stream_stats(codec, data, native.encode(codec, data))

    n_flags = 1 << spec.flag_bits
    copy_q = jnp.repeat(copy, pipe.Q, axis=1)
    live = valid & ~copy_q

    def _reduce(flags, live, pw, copy):
        hist = jnp.stack([jnp.sum(live & (flags == k))
                          for k in range(n_flags)])
        return hist, jnp.sum(copy), 2 * jnp.sum(jnp.where(live, pw, 0))

    hist, n_copy, pay_bytes = jax.jit(_reduce)(flags, live, pw, copy)
    hist = np.asarray(hist)
    n_blocks_real = -(-n // spec.block_size)
    n_copy = int(n_copy)
    copy_np = np.asarray(copy[0])
    # the ragged tail is a separate raw emission only when the final
    # block is encoded; a final COPY block already contains its bytes
    last_is_copy = bool(copy_np[n_blocks_real - 1]) if n_blocks_real \
        else False
    comp = (int(pay_bytes) + (n_blocks_real - n_copy) * spec.sig_bytes
            + sum(min(spec.block_size, n - b * spec.block_size)
                  for b in np.nonzero(copy_np)[0])
            + (0 if last_is_copy else n % 4))
    return StreamStats(
        codec=codec,
        original_bytes=n,
        compressed_bytes=comp,
        n_blocks=n_blocks_real,
        copy_blocks=n_copy,
        flag_histogram={_FLAG_NAMES[codec][k]: int(hist[k])
                        for k in range(n_flags)
                        if k in _FLAG_NAMES[codec]},
    )
