"""Blowup-protection FSM as a JAX scan.

Bit-exact replay of the reference's adaptive revert-to-copy machine
(reference: src/codec/protection_state.rs:9-47, driven at
codec.rs:35-37,68 and codec.rs:89-98). The FSM is part of the wire
format: encoder and decoder replay it in lockstep with no metadata, so
every transition below must match exactly:

  - revert_to_copy() is consulted for EVERY block (ticking `counter`,
    and halving copy_penalty_start -- floor 1 -- on every 16th tick).
  - If copy_penalty > 0 the block is a verbatim copy and decay() runs
    (penalty -= 1; on reaching 0, copy_penalty_start += 1).
  - Otherwise the block is encoded and update(incompressible) runs:
    two consecutive incompressible blocks arm copy_penalty.

`incompressible` means compressed block size (signature included)
>= block_size (reference: codec.rs:68 on encode, codec.rs:98 on
decode -- the same number, so both sides agree).

The scan is over blocks (not quads), so it is cheap; it is vmapped
across streams by the container layer, which turns the only serial
chain in the encoder into a vectorized one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def replay_fsm(incompressible_bits: jax.Array) -> jax.Array:
    """Given per-block hypothetical incompressible bits (as if each
    block were encoded), return the per-block copy decisions.

    The bit for a block the FSM decides to copy is ignored (update() is
    skipped on the copy path), so callers may pass any value there.
    """
    n = incompressible_bits.shape[0]
    bits = incompressible_bits.astype(jnp.bool_)
    block_idx = jnp.arange(n, dtype=jnp.int32)

    def step(state, xs):
        penalty, start, prev = state
        bit, idx = xs
        # revert_to_copy(): every 16th call halves start (floor 1)
        halve = (idx & 15) == 0
        start = jnp.where(halve & (start > 1), start >> 1, start)
        is_copy = penalty > 0
        # copy path: decay()
        penalty_c = penalty - 1
        start_c = jnp.where(penalty_c == 0, start + 1, start)
        # encode path: update(bit)
        penalty_e = jnp.where(bit & prev, start, penalty)
        prev_e = bit

        penalty = jnp.where(is_copy, penalty_c, penalty_e)
        start = jnp.where(is_copy, start_c, start)
        prev = jnp.where(is_copy, prev, prev_e)
        return (penalty, start, prev), is_copy

    init = (jnp.int32(0), jnp.int32(1), jnp.bool_(False))
    # unroll: the body is a handful of scalar selects -- per-iteration
    # loop overhead dominates otherwise
    _, copies = jax.lax.scan(step, init, (bits, block_idx), unroll=32)
    return copies


def replay_fsm_np(incompressible_bits: np.ndarray) -> np.ndarray:
    """Numpy twin of replay_fsm for host-side paths and tests."""
    penalty, start, prev = 0, 1, False
    out = np.zeros(len(incompressible_bits), dtype=bool)
    for i, bit in enumerate(incompressible_bits):
        if (i & 15) == 0 and start > 1:
            start >>= 1
        if penalty > 0:
            out[i] = True
            penalty -= 1
            if penalty == 0:
                start += 1
        else:
            if bit:
                if prev:
                    penalty = start
                prev = True
            else:
                prev = False
    return out
