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


def pack_codes(
    lo: jax.Array, hi: jax.Array, lens: jax.Array, n_words: int
) -> tuple[jax.Array, jax.Array]:
    """Scatter codes into a big-endian u32 word stream.

    Each code is a right-aligned value ``(hi << 32) | lo`` of ``lens[i]``
    bits (MSB of the code = bit lens[i]-1). Returns (words u32[n_words],
    total_bits). Zero-length codes must come with zero value words.
    """
    lens = lens.astype(jnp.int32)
    off = jnp.cumsum(lens) - lens  # exclusive
    total = off[-1] + lens[-1] if lens.shape[0] else jnp.int32(0)
    w0 = off >> 5
    r = off & 31
    # place v in a 96-bit window starting at word w0: W = v << s
    s = 96 - r - lens
    big, small = s >> 5, (s & 31).astype(jnp.uint32)
    # registers of the window before shifting: [0, hi, lo, 0, 0, 0]
    zero = jnp.zeros_like(lo)
    reg = jnp.stack([zero, hi.astype(jnp.uint32), lo.astype(jnp.uint32),
                     zero, zero, zero], axis=-1)  # (n, 6)
    j = jnp.arange(3, dtype=jnp.int32)  # window word index
    gidx = jnp.clip(j[None, :] + big[:, None], 0, 5)
    a = jnp.take_along_axis(reg, gidx, axis=-1)
    b = jnp.take_along_axis(reg, jnp.clip(gidx + 1, 0, 5), axis=-1)
    sm = small[:, None]
    win = _shl32(a, sm) | jnp.where(sm == 0, jnp.uint32(0), _shr32(b, 32 - sm))
    words = jnp.zeros((n_words,), jnp.uint32)
    idx = w0[:, None] + j[None, :]
    idx = jnp.where(lens[:, None] > 0, idx, n_words)  # drop empty codes
    words = words.at[idx.reshape(-1)].add(win.reshape(-1), mode="drop")
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
