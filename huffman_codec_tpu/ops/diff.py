"""Differential model as TPU-native array ops.

Reference behavior (transform.cpp:220-239): in-situ byte-wise difference with
an implicit prev=0 before the first byte, relying on uint8 wraparound; revert
is the running prefix-sum mod 256.

TPU design: the forward model is a pure elementwise-with-shift op; the revert
is an ``associative_scan`` cumulative sum — both O(n) work, O(log n) depth,
and trivially shardable: across chunk boundaries only one carry byte (the
last pre-diff byte of the previous chunk) is exchanged, which the parallel
layer does with a ``ppermute``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def diff_apply(x: jax.Array, carry_in: jax.Array | int = 0) -> jax.Array:
    """``y[i] = x[i] - x[i-1]`` (mod 256), with ``x[-1] := carry_in``.

    ``carry_in`` is 0 for a whole stream (transform.cpp:222) or the previous
    chunk's last original byte when sharded.
    """
    x = x.astype(jnp.uint8)
    prev = jnp.roll(x, 1)
    if x.shape[0] > 0:
        prev = prev.at[0].set(jnp.asarray(carry_in, jnp.uint8))
    return (x - prev).astype(jnp.uint8)


def diff_revert(y: jax.Array, carry_in: jax.Array | int = 0) -> jax.Array:
    """Inverse: running sum mod 256 (transform.cpp:231-239).

    Implemented as an associative scan over int32 lanes (uint8 would wrap
    correctly too, but int32 cumsum hits the fast XLA path) and a final
    mod-256 cast. ``carry_in`` is the previous chunk's last *reconstructed*
    byte when sharded.
    """
    acc = jnp.cumsum(y.astype(jnp.uint32)) + jnp.asarray(carry_in, jnp.uint32)
    return (acc & 0xFF).astype(jnp.uint8)
