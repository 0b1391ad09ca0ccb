"""Measure the serial scalar-table-access rate inside a Pallas TPU
kernel -- the feasibility probe for an exact on-device cheetah/lion
decode (VERDICT r3 item 4).

The exact decode of a prediction codec is a per-quad serial chain
through 2^16-entry tables (reference: cheetah.rs:68-103,
lion.rs:126-186): per token ~2 table reads + ~3 writes at computed
16-bit indices, plus the hash multiply. On TPU the only candidate
venue is a Pallas kernel with the tables resident in on-chip scratch
driven by the scalar core. This bench measures that primitive: a
fori_loop of dependent (read table[h]; write table[h]; h' = f(value))
steps against an SMEM-resident table.

The resulting ns/step bounds the whole design:
  decode GB/s <= 4 bytes / (steps_per_quad * ns_per_step)
with steps_per_quad ~= 5. E.g. 10 ns/step -> 0.08 GB/s; 2 ns/step ->
0.4 GB/s. Compare decode_pool_gbps (host C++ pool) in BENCH_r04.

Run: python -m benches.micro_serial [table_log2] [n_steps]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("n_steps", "tbits"))
def serial_chain(seed, n_steps: int, tbits: int):
    tsize = 1 << tbits
    mask = tsize - 1

    def kernel(seed_ref, out_ref, tbl_ref):
        def body(i, h):
            v = tbl_ref[h]                       # dependent read
            nv = (v * jnp.int32(-1653671657) + i) & jnp.int32(0x7FFFFFFF)
            tbl_ref[h] = nv                      # write back
            return (nv >> 7) & mask              # next index depends on v

        h0 = seed_ref[0] & mask
        # no table init: scratch garbage is fine for a timing probe
        # (the index is masked into range regardless of read values)
        out_ref[0] = jax.lax.fori_loop(0, n_steps, body, h0)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((tsize,), jnp.int32)],
    )(seed)


def main():
    tbits = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    seed = jnp.asarray([12345], jnp.int32)
    out = serial_chain(seed, n_steps, tbits)
    np.asarray(out)  # compile + run once
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = serial_chain(seed, n_steps, tbits)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    ns = best / n_steps * 1e9
    eff_gbps = 4.0 / (5 * ns)  # ~5 such steps per decoded quad
    print(f"[micro_serial] table 2^{tbits} i32 in SMEM, {n_steps} steps: "
          f"{ns:.2f} ns/step -> exact serial decode bound "
          f"~{eff_gbps:.3f} GB/s/stream")


if __name__ == "__main__":
    main()
