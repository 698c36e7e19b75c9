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


def butterfly_place(
    vals: jax.Array, tgt: jax.Array, out_len: int,
) -> tuple[jax.Array, jax.Array]:
    """Dense placement: element at column i lands at column ``tgt[i]``
    (strictly increasing, >= i, < out_len) — the right-moving monotone
    butterfly, MSB-first (see monotone_spread's proof). Inputs must
    already be a dense prefix (every column of ``vals`` is an element).
    Returns (out, have): ``out[tgt[i]] == vals[i]``, zeros elsewhere;
    ``have`` marks target columns."""
    n = vals.shape[-1]
    if out_len < n:
        raise ValueError("butterfly_place needs out_len >= n")
    pad = out_len - n
    if pad:
        z = jnp.zeros(vals.shape[:-1] + (pad,), jnp.int32)
        v = jnp.concatenate([vals.astype(jnp.int32), z], axis=-1)
        t = jnp.concatenate([tgt.astype(jnp.int32), z], axis=-1)
    else:
        v, t = vals.astype(jnp.int32), tgt.astype(jnp.int32)
    i = jnp.arange(out_len, dtype=jnp.int32)
    live = i < n
    s = jnp.where(live, t - i, 0)
    have = live

    d = 1 << max(out_len - 1, 1).bit_length() - 1
    while d >= 1:  # MSB-first butterfly (right moves)
        shf = lambda x, fill: jnp.concatenate(
            [jnp.full(x.shape[:-1] + (d,), fill, x.dtype), x[..., :-d]],
            axis=-1) if d < out_len else jnp.full_like(x, fill)
        in_v, in_s, in_h = shf(v, 0), shf(s, 0), shf(have, False)
        arrive = in_h & ((in_s & d) != 0)
        moved = have & ((s & d) != 0)
        v = jnp.where(arrive, in_v, v)
        s = jnp.where(arrive, in_s - d, jnp.where(moved, 0, s))
        have = (have & ~moved) | arrive
        d >>= 1
    return v, have


def monotone_spread(
    vals: jax.Array, tgt: jax.Array, kept: jax.Array, out_len: int,
    max_gap: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Inverse routing direction: kept element i lands at column ``tgt[i]``
    (strictly increasing over kept elements), columns between targets are
    FILLED with the preceding element's value — the RLE-expansion shape
    (each source owns the half-open run [tgt[i], tgt[i+1])).

    Same zero-gather/zero-scatter rationale as ``monotone_compact``, mirrored:
    right-moves with NONDECREASING shifts are collision-free processed
    MSB-first (high bits of a larger shift are >= the smaller's high bits,
    so the partial positions i + high_k(s_i) stay strictly increasing at
    every stage). Inputs need not be dense: a leading compaction makes the
    shift monotonicity hold for any strictly-increasing kept targets. The
    fill is the log-doubling "last filled value to the left" propagation,
    cut to ceil(log2(max_gap)) rounds when the caller knows a run-length
    bound (258 for MNP-5 RLE).

    Returns (out (..., out_len), have (..., out_len) bool) — ``have`` marks
    columns at/after the first target (callers mask the tail themselves).
    """
    n = vals.shape[-1]
    # dense prefix: element of rank r at column r, its target in t[r]
    rank = jnp.cumsum(kept.astype(jnp.int32), axis=-1) - kept.astype(jnp.int32)
    v = monotone_compact(vals.astype(jnp.int32), rank, kept, out_len)
    t = monotone_compact(tgt.astype(jnp.int32), rank, kept, out_len)
    total = jnp.sum(kept.astype(jnp.int32), axis=-1, keepdims=True)
    i = jnp.arange(out_len, dtype=jnp.int32)
    live = i < total
    # shifts s = t - i are >= 0 and nondecreasing over the dense prefix
    s = jnp.where(live, t - i, 0)
    have = live

    d = 1 << max(out_len - 1, 1).bit_length() - 1
    while d >= 1:  # MSB-first butterfly
        pad = lambda x, fill: jnp.concatenate(
            [jnp.full(x.shape[:-1] + (d,), fill, x.dtype), x[..., :-d]],
            axis=-1) if d < out_len else jnp.full_like(x, fill)
        in_v, in_s, in_h = pad(v, 0), pad(s, 0), pad(have, False)
        arrive = in_h & ((in_s & d) != 0)
        moved = have & ((s & d) != 0)
        v = jnp.where(arrive, in_v, v)
        s = jnp.where(arrive, in_s - d, jnp.where(moved, 0, s))
        have = (have & ~moved) | arrive
        d >>= 1

    # fill forward: column j takes the nearest placed value to its left
    gap = out_len if max_gap is None else min(max_gap, out_len)
    d = 1
    while d < gap:
        pad = lambda x, fill: jnp.concatenate(
            [jnp.full(x.shape[:-1] + (d,), fill, x.dtype), x[..., :-d]],
            axis=-1) if d < out_len else jnp.full_like(x, fill)
        in_v, in_h = pad(v, 0), pad(have, False)
        take = ~have & in_h
        v = jnp.where(take, in_v, v)
        have = have | take
        d <<= 1
    return v, have


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
