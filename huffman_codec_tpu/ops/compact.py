"""Order-preserving stream compaction as a log-depth butterfly — the
zero-scatter/zero-sort/zero-gather primitive the whole encode path leans on.

Problem shape: a padded row where element i is kept iff ``kept[i]`` and must
land at column ``rank[i]`` (its rank among kept elements, strictly
increasing). XLA:TPU executes scatters at ~14 ns/index and per-element
gathers at ~10 ns (measured — micro_rle.py / micro_pack.py), and a bitonic
sort costs n log^2 n; but compaction shifts are MONOTONE (s[i] = i - rank[i]
is nondecreasing), and the classic LSB-first butterfly is collision-free for
monotone shifts:

  at stage k an element moves left by 2^k iff bit k of its remaining shift
  is set. For kept i < j with ranks r_i < r_j, a stage-k collision needs
  (s_j - s_i) = (j - i) - 2^{k+1} t with t >= 1 — impossible since
  0 <= s_j - s_i <= (j - i) - 1 — or a masked difference equal to j - i >=
  2^{k+1}, impossible since it is bounded by 2^{k+1} - 1.

So ceil(log2(n)) rounds of (shift, compare-bit, select) — pure VPU work,
O(n log n) total, fuses well, and no indexed memory ops at all. Elements
that move away leave a DEAD marker (remaining shift 0) that later arrivals
overwrite; every column < n_kept receives exactly its ranked element.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def monotone_compact(
    vals: jax.Array, rank: jax.Array, kept: jax.Array, out_len: int
) -> jax.Array:
    """Compact the trailing axis: kept element i lands at column rank[i].

    ``rank`` must be the element's rank among kept elements (exclusive
    prefix count of ``kept``) — i.e. shifts are monotone. Works over any
    leading batch dims. Returns (..., out_len) with zeros past the kept
    count (and in any column >= the number of kept elements).
    """
    n = vals.shape[-1]
    i = jnp.arange(n, dtype=jnp.int32)
    r = jnp.where(kept, i - rank.astype(jnp.int32), 0)
    v = vals
    total = jnp.sum(kept.astype(jnp.int32), axis=-1, keepdims=True)

    d = 1
    while d < n:
        in_r = jnp.concatenate(
            [r[..., d:], jnp.zeros(r.shape[:-1] + (d,), r.dtype)], axis=-1)
        in_v = jnp.concatenate(
            [v[..., d:], jnp.zeros(v.shape[:-1] + (d,), v.dtype)], axis=-1)
        arrive = (in_r & d) != 0
        moved = (r & d) != 0
        v = jnp.where(arrive, in_v, v)
        r = jnp.where(arrive, in_r - d, jnp.where(moved, 0, r))
        d <<= 1

    out = jnp.where(i < total, v, jnp.zeros((), v.dtype))
    if out_len <= n:
        return out[..., :out_len]
    pad = out_len - n
    return jnp.concatenate(
        [out, jnp.zeros(out.shape[:-1] + (pad,), out.dtype)], axis=-1)
