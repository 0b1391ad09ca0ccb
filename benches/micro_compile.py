"""Calibrate remote TPU compile times: trivial jit, small pallas,
the segmented bigsort at increasing N."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def t(label, fn, *args):
    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    r = time.perf_counter() - t0
    print(f"{label}: compile+run {c:.1f}s, rerun {r*1e3:.1f}ms", flush=True)


def main():
    x = jnp.ones((1024, 1024), jnp.float32)
    t("trivial jit", jax.jit(lambda x: x * 2 + 1), x)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(i_ref, o_ref):
        o_ref[...] = i_ref[...] * 2

    t("tiny pallas", jax.jit(lambda x: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)), x)

    from density_tpu.kernels import bigsort
    rng = np.random.default_rng(0)
    for N in [1024, 4096, 16384, 65536, 262144]:
        kk = jnp.asarray(rng.integers(0, 2**31, (2, N), dtype=np.int32))
        vv = jnp.asarray(rng.integers(0, 2**31, (2, N), dtype=np.int32))
        t(f"bigsort N={N}",
          lambda a, b: bigsort.sort(a, b, n_keys=1), kk, vv)


if __name__ == "__main__":
    main()
