"""MSB-first bitstream packing/unpacking as parallel array ops.

The v1/v2 wire formats pack Huffman bits MSB-first into bytes
(main.cpp:78-84 pack, main.cpp:107-113 unpack; 0-padded to a byte boundary,
transform.cpp:378-381). Device-side the stream lives as big-endian u32
words: bit p of the stream is bit (31 - p%32) of word p//32.

Packing variable-length codes is the classic GPU-Huffman pattern
(PAPERS.md): an exclusive prefix-sum over code lengths gives every symbol
its bit offset; each code then lands with a scatter-ADD into at most three
u32 words (codes are <= 64 bits, offsets are arbitrary) — bits never overlap
across symbols, so add == or and no atomics are needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from huffman_codec_tpu.ops.compact import monotone_compact


def rev_bits_u32(x: jax.Array) -> jax.Array:
    """Bit-reverse each u32 lane (5 masked swap rounds)."""
    x = x.astype(jnp.uint32)
    x = ((x & 0x55555555) << 1) | ((x >> 1) & 0x55555555)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F)
    x = ((x & 0x00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF)
    x = (x << 16) | (x >> 16)
    return x


def _shl32(x: jax.Array, s: jax.Array) -> jax.Array:
    """u32 << s with s in [0, 32] (s == 32 -> 0, unlike C)."""
    return jnp.where(s >= 32, jnp.uint32(0), x << jnp.minimum(s, 31))


def _shr32(x: jax.Array, s: jax.Array) -> jax.Array:
    return jnp.where(s >= 32, jnp.uint32(0), x >> jnp.minimum(s, 31))


def _code_windows(lo, hi, lens, max_len: int = 64):
    """Per-symbol word-window contributions + target word indices.

    Symbol i's code lands at bit offset off[i]; its bits span at most
    ``1 + ceil((max_len + 31) / 32)`` u32 words starting at ``off >> 5`` —
    2 words when max_len <= 32 (the canonical coder: bit offset within a
    word <= 31 plus <= 32 code bits never crosses a third word), 3 words
    for the FGK coder's 64-bit NYT codes. Returns (win (n, W) u32,
    w0 (n,) i32, total_bits)."""
    n_win = 2 if max_len <= 32 else 3
    lens = lens.astype(jnp.int32)
    off = jnp.cumsum(lens) - lens  # exclusive
    total = off[-1] + lens[-1] if lens.shape[0] else jnp.int32(0)
    w0 = off >> 5
    r = off & 31
    # place v in the (32 * n_win)-bit window starting at word w0:
    # W = v << s, s chosen so the code's MSB lands at in-window bit r.
    # The window register is conceptually [0, hi, lo, 0, ...] (or
    # [0, lo, 0, 0] for 2-word windows); rather than gathering from it
    # (TPU runs dynamic per-element gathers ~100x slower than VPU selects —
    # profiled), select among the possible values arithmetically.
    s = 32 * n_win - r - lens
    big, small = s >> 5, (s & 31).astype(jnp.uint32)
    hi = hi.astype(jnp.uint32)
    lo = lo.astype(jnp.uint32)
    zero = jnp.zeros_like(lo)

    if n_win == 2:
        def reg_at(g):  # register [0, lo, 0, 0]
            return jnp.where(g == 1, lo[:, None], zero[:, None])
    else:
        def reg_at(g):  # register [0, hi, lo, 0, 0, 0]
            return jnp.where(g == 1, hi[:, None],
                             jnp.where(g == 2, lo[:, None], zero[:, None]))

    j = jnp.arange(n_win, dtype=jnp.int32)  # window word index
    g = j[None, :] + big[:, None]  # (n, n_win)
    a = reg_at(g)
    b = reg_at(g + 1)
    sm = small[:, None]
    win = _shl32(a, sm) | jnp.where(sm == 0, jnp.uint32(0), _shr32(b, 32 - sm))
    win = jnp.where(lens[:, None] > 0, win, 0)
    return win, w0, total


def pack_codes_segsum(
    lo: jax.Array, hi: jax.Array, lens: jax.Array, n_words: int,
    max_len: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Assemble codes into a big-endian u32 word stream — scatter-free.

    Each code is a right-aligned value ``(hi << 32) | lo`` of ``lens[i]``
    bits (MSB of the code = bit lens[i]-1). Returns (words u32[n_words],
    total_bits). Zero-length codes must come with zero value words.

    XLA serializes colliding-index scatters on TPU, so instead of
    scatter-OR this uses a sorted segment-sum identity: for each of the 3
    window columns j, the target word indices ``w0 + j`` are nondecreasing
    in symbol order, and all contributions to one output word have DISJOINT
    bits (sum == or, and each word's segment sum fits u32 exactly — modular
    cumsum differences are exact). So words[w] = sum over three columns of
    cumsum-range lookups located with two fused binary searches per word.
    """
    win, w0, total = _code_windows(lo, hi, lens, max_len)
    out = jnp.zeros((n_words,), jnp.uint32)
    w = jnp.arange(n_words, dtype=jnp.int32)
    for j in range(win.shape[1]):
        idx = w0 + j  # nondecreasing
        csum = jnp.cumsum(win[:, j], dtype=jnp.uint32)
        hi_i = jnp.searchsorted(idx, w, side="right").astype(jnp.int32) - 1
        lo_i = jnp.searchsorted(idx, w, side="left").astype(jnp.int32)
        seg_hi = csum[jnp.clip(hi_i, 0, None)]
        seg_lo = jnp.where(lo_i > 0, csum[jnp.clip(lo_i - 1, 0, None)], 0)
        out = out + jnp.where(hi_i >= lo_i, seg_hi - seg_lo, 0)
    return out, total


def pack_codes_scatter_add(
    lo: jax.Array, hi: jax.Array, lens: jax.Array, n_words: int,
    max_len: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Colliding scatter-add formulation (contributions have disjoint bits
    so add == or). XLA serializes colliding scatters on TPU — kept as the
    reference implementation and for non-TPU backends."""
    win, w0, total = _code_windows(lo, hi, lens, max_len)
    lens = lens.astype(jnp.int32)
    words = jnp.zeros((n_words,), jnp.uint32)
    j = jnp.arange(win.shape[1], dtype=jnp.int32)
    idx = w0[:, None] + j[None, :]
    idx = jnp.where(lens[:, None] > 0, idx, n_words)  # drop empty codes
    words = words.at[idx.reshape(-1)].add(win.reshape(-1), mode="drop")
    return words, total


def pack_codes(
    lo: jax.Array, hi: jax.Array, lens: jax.Array, n_words: int,
    max_len: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Assemble codes into a big-endian u32 word stream — the default.

    Each code is a right-aligned value ``(hi << 32) | lo`` of ``lens[i]``
    bits (MSB of the code = bit lens[i]-1); zero-length codes must come
    with zero value words AND form a contiguous tail (true for every
    caller: padding past the valid symbol count). Pass ``max_len=32`` for
    <=32-bit codes (2-word windows instead of 3).

    TPU-shaped design: colliding scatters serialize on TPU, and a generic
    ``associative_scan`` segmented-OR compiles pathologically at odd
    lengths under vmap (minutes at C=256 — measured). Neither is needed:
    per window column the target words are NONdecreasing in symbol order
    and a u32 word can hold at most 33 codes (codes are >= 1 bit), so runs
    of equal targets are <= 33 long. A fixed 7-round shifted OR (distances
    1..64) with endpoint key-equality — exact for monotone keys — combines
    each run into its last element, which then lands with a UNIQUE-index
    scatter the TPU executes vectorized. Zero-length tail symbols get
    ascending out-of-range targets, keeping the key sequence monotone and
    the real runs short."""
    win, w0, total = _code_windows(lo, hi, lens, max_len)
    lens = lens.astype(jnp.int32)
    n = lens.shape[0]
    i32 = jnp.arange(n, dtype=jnp.int32)
    words = jnp.zeros((n_words,), jnp.uint32)
    # codes <= 32 bits guarantee every used word contains a code START, so
    # per window column the run-end targets are the CONSECUTIVE words
    # [j, used+j): placing them is a pure in-order compaction, done with one
    # sort (scatters cost ~14 ns/index on XLA:TPU — measured 3x slower)
    dense = max_len <= 32
    for j in range(win.shape[1]):
        # zero-length (tail) symbols -> ascending OOB keys > any valid word
        idx = jnp.where(lens > 0, w0 + j, n_words + i32)
        acc = win[:, j]
        for d in (1, 2, 4, 8, 16, 32, 64):
            if d >= n:
                break  # a run cannot be longer than the array
            prev = jnp.concatenate([jnp.zeros((d,), acc.dtype), acc[:-d]])
            pidx = jnp.concatenate(
                [jnp.full((d,), -1, idx.dtype), idx[:-d]])
            acc = jnp.where(pidx == idx, acc | prev, acc)
        ends = jnp.concatenate([idx[1:] != idx[:-1], jnp.ones((1,), bool)])
        if dense:
            kept = ends & (idx < n_words)
            # dense targets: the k-th run-end lands at word j+k, so its
            # rank IS its target minus j — butterfly-compact and shift by j
            v = monotone_compact(acc.astype(jnp.int32), idx - j, kept,
                                 min(n_words, n)).astype(jnp.uint32)
            col = jnp.zeros((n_words,), jnp.uint32)
            take = min(n, n_words - j)
            col = jax.lax.dynamic_update_slice(col, v[:take],
                                               (jnp.int32(j),))
        else:  # 3-column FGK windows can skip words -> general scatter
            tgt = jnp.where(ends, idx, n_words + i32)
            col = jnp.zeros((n_words,), jnp.uint32).at[tgt].set(
                acc, mode="drop", unique_indices=True)
        words = words | col
    return words, total


def words_to_bytes(words: jax.Array, n_bytes: int) -> jax.Array:
    """Big-endian u32 words -> the wire byte stream (first n_bytes)."""
    shift = jnp.uint32(24) - 8 * (jnp.arange(n_bytes, dtype=jnp.uint32) & 3)
    w = words[jnp.arange(n_bytes, dtype=jnp.int32) >> 2]
    return ((w >> shift) & 0xFF).astype(jnp.uint8)


def bytes_to_words(data: jax.Array, n_words: int) -> jax.Array:
    """Wire byte stream -> big-endian u32 words (zero padded)."""
    n = data.shape[0]
    padded = jnp.zeros((n_words * 4,), jnp.uint8).at[:n].set(data)
    b = padded.reshape(n_words, 4).astype(jnp.uint32)
    return (b[:, 0] << 24) | (b[:, 1] << 16) | (b[:, 2] << 8) | b[:, 3]


def get_bit(words: jax.Array, pos: jax.Array) -> jax.Array:
    """Bit at stream position pos (MSB-first)."""
    return (words[pos >> 5] >> (31 - (pos & 31).astype(jnp.uint32))) & 1
