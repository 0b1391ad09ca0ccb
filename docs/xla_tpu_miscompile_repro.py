"""Standalone repro for the XLA:TPU vmapped masked-assembly miscompile.

Observed (round 4, jax 0.9.0 + libtpu on TPU v5e): the jitted, vmapped
masked (with-copy) encode assembly -- a chain of four `.at[idx].set(
mode="drop")` scatters per stream -- returns ALL-ZERO output rows for
lion (SIG_WORDS=3) at stream batches S in {9, 10, 11, 12}, while the
IDENTICAL jitted program is bit-exact on CPU at every S, and on TPU at
S <= 8 and S = 16. Reproduced with and without the persistent compile
cache. The engine works around it by chunking the copy-path assembly
to <= 8 streams on TPU (density_tpu/engine/layout.py::_assemble_masked);
regression pins live in tests/test_tpu_smoke.py (TPU) and
tests/test_fuzz.py::test_masked_assemble_suspect_batches_cpu (CPU
semantics).

Run this on a TPU host to check whether the underlying bug still
exists; when every S prints OK, the chunking workaround (and this
file) can be deleted:

    python docs/xla_tpu_miscompile_repro.py

It calls the UNCHUNKED assembly directly (pipe.assemble, bypassing the
workaround) and compares device bytes against the CPU backend.
"""

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from density_tpu.codecs import lion
    from density_tpu.engine import layout

    pipe = lion.PIPELINE
    rng = np.random.default_rng(4)
    block = pipe.BLOCK
    ss = 16 * block  # small streams, incompressible -> copy blocks
    cpu = jax.devices("cpu")[0]

    bad = []
    for S in range(8, 17):
        data = rng.integers(0, 256, S * ss, dtype=np.uint8)
        quads = data.reshape(S, ss).view("<u4")
        nbytes = np.full(S, ss, np.int32)
        args = []
        for dev in (jax.devices()[0], cpu):
            q = jax.device_put(jnp.asarray(quads), dev)
            nb = jax.device_put(jnp.asarray(nbytes), dev)
            flags, pw, w0, w1, valid, bits = pipe.plan(
                q, nb, jnp.zeros((S, ss // block), bool))
            copy = pipe.step_fsm(bits, nb)
            # UNCHUNKED masked assembly -- the suspect program
            out, tot = pipe.assemble(q, nb, copy, flags, pw, w0, w1,
                                     valid)
            args.append((np.asarray(out), np.asarray(tot)))
        (out_t, tot_t), (out_c, tot_c) = args
        ok = np.array_equal(tot_t, tot_c) and np.array_equal(out_t, out_c)
        zero_rows = int((~out_t.any(axis=1)).sum())
        print(f"S={S:2d}: {'OK' if ok else 'MISMATCH'}"
              f" (all-zero device rows: {zero_rows})")
        if not ok:
            bad.append(S)
    if bad:
        print(f"miscompile still present at S={bad}; keep "
              f"layout._assemble_masked chunking")
    else:
        print("all batches exact: the workaround can be removed")


if __name__ == "__main__":
    main()
