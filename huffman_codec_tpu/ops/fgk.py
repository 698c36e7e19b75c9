"""FGK adaptive Huffman coding as batched JAX array ops.

Behavior model: huffman.cpp (HuffTree: encode/decode/update). State layout:
the array-slot form shared with pyref/fgk.py and the C++ runtime — slot k
holds nodeNum 512-k, the root is slot 0, new nodes append contiguously, and
a swap (huffman.cpp:186-217) exchanges slot *contents* while positions keep
their parents. The reference's recursive successor DFS (huffman.cpp:157-184)
becomes the vectorized "fast rule": the lowest slot in [0..k] whose freq
equals the target (cross-validated against the exact DFS by
tests/test_fgk_fast_rule.py).

TPU design: one symbol step = O(depth) iterations of full-vector masked ops
over the 514-slot state — no recursion, no pointers, static shapes. The
stream dimension is the parallel axis: ``vmap`` batches many independent
chunk streams (the v2 container's unit of parallelism) through one
``lax.scan`` over symbol positions, so the VPU processes every stream's
tree in lockstep. The serial-per-stream FGK chain is thereby hidden behind
chunk parallelism — the framework's answer to the reference's single
0.1-1 MB/s loop (SURVEY.md §3.5).

Encode emits per-symbol (code_lo, code_hi, len) triples; ops/pack.py turns
them into the MSB-first wire stream with a prefix-sum + scatter. Codes fit
64 bits whenever the chunk length is below ~10^12 (leaf depth in a Huffman
tree with total weight W is Fibonacci-bounded), asserted statically.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from huffman_codec_tpu.ops.pack import get_bit, pack_codes

MAX_SYMBOLS = 256  # huffman.hpp:19
MAX_NODES = 2 * MAX_SYMBOLS + 1  # 513 live slots
DUMP = MAX_NODES  # slot 513: scatter target for NIL child links
NIL = jnp.int32(-1)


def max_code_bits(chunk_len: int) -> int:
    """Static bound on one code's bit length for a chunk of given length:
    max leaf depth (Fibonacci bound on sibling-property trees) + 8 raw bits
    for a fresh symbol (huffman.cpp:50-55)."""
    a, b, d = 1, 2, 0
    while b <= chunk_len + 1 and d < 120:
        a, b = b, a + b
        d += 1
    return min(64, d + 2 + 8)


class FGKState(NamedTuple):
    """One FGK tree in slot form (+1 dump slot for NIL scatters)."""

    parent: jax.Array  # i32[514]
    left: jax.Array  # i32[514]
    right: jax.Array  # i32[514]
    freq: jax.Array  # i32[514]
    symbol: jax.Array  # i32[514]
    symslot: jax.Array  # i32[256]
    nyt: jax.Array  # i32 scalar


def fgk_init() -> FGKState:
    """Single NYT node == root (huffman.cpp:23-31)."""
    full = (MAX_NODES + 1,)
    return FGKState(
        parent=jnp.full(full, NIL, jnp.int32),
        left=jnp.full(full, NIL, jnp.int32),
        right=jnp.full(full, NIL, jnp.int32),
        freq=jnp.zeros(full, jnp.int32),
        symbol=jnp.zeros(full, jnp.int32),
        symslot=jnp.full((MAX_SYMBOLS,), NIL, jnp.int32),
        nyt=jnp.int32(0),
    )


def _slots() -> jax.Array:
    return jnp.arange(MAX_NODES + 1, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# update — the shared invariant maintainer (huffman.cpp:95-128)
# ---------------------------------------------------------------------------


def _nyt_split(st: FGKState, sym: jax.Array) -> tuple[FGKState, jax.Array]:
    """First occurrence: split NYT into new-NYT (left, nodeNum-2) + symbol
    leaf (right, nodeNum-1), both freq 0 (huffman.cpp:99-111)."""
    old = st.nyt
    leaf = old + 1
    new_nyt = old + 2
    st = st._replace(
        left=st.left.at[old].set(new_nyt).at[leaf].set(NIL).at[new_nyt].set(NIL),
        right=st.right.at[old].set(leaf).at[leaf].set(NIL).at[new_nyt].set(NIL),
        parent=st.parent.at[leaf].set(old).at[new_nyt].set(old),
        freq=st.freq.at[leaf].set(0).at[new_nyt].set(0),
        symbol=st.symbol.at[leaf].set(sym),
        symslot=st.symslot.at[sym].set(leaf),
        nyt=new_nyt,
    )
    return st, leaf


def _swap_slots(st: FGKState, a: jax.Array, b: jax.Array) -> FGKState:
    """Exchange subtree contents of slots a and b; positions keep their
    parents, children re-point, moved leaves update symslot
    (huffman.cpp:186-217 in slot space)."""
    def sw(arr):
        va, vb = arr[a], arr[b]
        return arr.at[a].set(vb).at[b].set(va)

    left, right = sw(st.left), sw(st.right)
    freq, symbol = sw(st.freq), sw(st.symbol)
    parent = st.parent
    for k in (a, b):
        lc, rc = left[k], right[k]
        parent = parent.at[jnp.where(lc >= 0, lc, DUMP)].set(k)
        parent = parent.at[jnp.where(rc >= 0, rc, DUMP)].set(k)
    symslot = st.symslot
    for k in (a, b):
        is_leaf = left[k] < 0
        tgt = jnp.where(is_leaf, symbol[k], MAX_SYMBOLS - 1)
        symslot = symslot.at[tgt].set(jnp.where(is_leaf, k, symslot[tgt]))
    return st._replace(parent=parent, left=left, right=right, freq=freq,
                       symbol=symbol, symslot=symslot)


def fgk_update(st: FGKState, sym: jax.Array) -> FGKState:
    """encode/decode both replay this after every symbol
    (transform.cpp:370-375, 391-403)."""
    k0 = st.symslot[sym]
    fresh = k0 < 0
    st_split, leaf = _nyt_split(st, sym)
    st = jax.tree_util.tree_map(
        lambda a, b: jnp.where(fresh, a, b), st_split, st
    )
    k = jnp.where(fresh, leaf, k0)

    def cond(carry):
        st, k = carry
        return st.parent[k] >= 0

    def body(carry):
        st, k = carry
        f = st.freq[k]
        # fast successor rule: lowest slot in [0..k] with freq == f
        mask = (st.freq == f) & (_slots() <= k)
        succ = jnp.argmax(mask).astype(jnp.int32)
        found = mask[succ]
        do_swap = found & (succ != k) & (succ != st.parent[k])
        st_swapped = _swap_slots(st, k, succ)
        st = jax.tree_util.tree_map(
            lambda a, b: jnp.where(do_swap, a, b), st_swapped, st
        )
        k = jnp.where(do_swap, succ, k)
        st = st._replace(freq=st.freq.at[k].add(1))
        return st, st.parent[k]

    st, _ = jax.lax.while_loop(cond, body, (st, k))
    return st._replace(freq=st.freq.at[0].add(1))


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _code_of(st: FGKState, start: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Root-path code of a slot as right-aligned (lo, hi, len).

    The climb collects the edge at depth d (counting up from the leaf) into
    bit d — and since code bit j (MSB-first, j=0 at the root) IS the edge at
    depth len-1-j, the collected word is already the right-aligned integer
    value of the code: no reversal needed (huffman.cpp:136-155 builds the
    same code by reversing an explicit vector)."""

    def cond(carry):
        k, lo, hi, d = carry
        return st.parent[k] >= 0

    def body(carry):
        k, lo, hi, d = carry
        p = st.parent[k]
        bit = (st.left[p] != k).astype(jnp.uint32)  # right edge = 1
        du = jnp.minimum(d, 31).astype(jnp.uint32)
        d32 = jnp.minimum(jnp.maximum(d - 32, 0), 31).astype(jnp.uint32)
        lo = jnp.where(d < 32, lo | (bit << du), lo)
        hi = jnp.where(d >= 32, hi | (bit << d32), hi)
        return p, lo, hi, d + 1

    _, lo, hi, length = jax.lax.while_loop(
        cond, body, (start, jnp.uint32(0), jnp.uint32(0), jnp.int32(0))
    )
    return lo, hi, length


def fgk_encode_step(st: FGKState, sym: jax.Array):
    """encode -> update for one symbol (transform.cpp:370-375). Returns
    (new state, (code_lo, code_hi, len))."""
    k0 = st.symslot[sym]
    fresh = k0 < 0
    start = jnp.where(fresh, st.nyt, k0)
    lo, hi, length = _code_of(st, start)
    # unseen symbol: append 8 raw MSB-first bits (huffman.cpp:50-55)
    hi8 = (hi << 8) | (lo >> 24)
    lo8 = (lo << 8) | sym.astype(jnp.uint32)
    lo = jnp.where(fresh, lo8, lo)
    hi = jnp.where(fresh, hi8, hi)
    length = jnp.where(fresh, length + 8, length)
    st = fgk_update(st, sym)
    return st, (lo, hi, length)


@functools.partial(jax.jit, static_argnames=("n_words",))
def fgk_encode_chunk(
    symbols: jax.Array, length: jax.Array, n_words: int
) -> tuple[jax.Array, jax.Array]:
    """Encode one padded chunk (uint8[L], true length) into a packed
    MSB-first u32 word stream. Returns (words u32[n_words], total_bits)."""
    L = symbols.shape[0]
    idx = jnp.arange(L, dtype=jnp.int32)
    valid = idx < length

    def step(st, xs):
        sym, ok = xs
        st2, (lo, hi, ln) = fgk_encode_step(st, sym.astype(jnp.int32))
        st = jax.tree_util.tree_map(lambda a, b: jnp.where(ok, a, b), st2, st)
        z = jnp.uint32(0)
        return st, (jnp.where(ok, lo, z), jnp.where(ok, hi, z),
                    jnp.where(ok, ln, 0))

    _, (los, his, lens) = jax.lax.scan(step, fgk_init(), (symbols, valid))
    return pack_codes(los, his, lens, n_words)


def fgk_encode_batch(symbols: jax.Array, lengths: jax.Array, n_words: int):
    """vmap over chunk streams: (C, L) uint8 + (C,) lengths ->
    (words (C, n_words), bits (C,))."""
    return jax.vmap(lambda s, l: fgk_encode_chunk(s, l, n_words))(
        symbols, lengths
    )


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def fgk_decode_step(st: FGKState, words: jax.Array, pos: jax.Array):
    """Root->leaf walk + NYT raw-byte case + update (huffman.cpp:60-93).
    Returns (state, symbol, new bit position)."""

    def cond(carry):
        k, pos = carry
        return st.left[k] >= 0  # internal node

    def body(carry):
        k, pos = carry
        bit = get_bit(words, pos)
        return jnp.where(bit == 1, st.right[k], st.left[k]), pos + 1

    k, pos = jax.lax.while_loop(cond, body, (jnp.int32(0), pos))
    at_nyt = k == st.nyt

    def read_raw(pos):
        def rb(i, acc_pos):
            acc, pos = acc_pos
            return (acc << 1) | get_bit(words, pos).astype(jnp.int32), pos + 1
        return jax.lax.fori_loop(0, 8, rb, (jnp.int32(0), pos))

    raw_sym, raw_pos = read_raw(pos)
    sym = jnp.where(at_nyt, raw_sym, st.symbol[k])
    pos = jnp.where(at_nyt, raw_pos, pos)
    st = fgk_update(st, sym)
    return st, sym, pos


@functools.partial(jax.jit, static_argnames=("out_len",))
def fgk_decode_chunk(
    words: jax.Array, count: jax.Array, out_len: int = 0
) -> jax.Array:
    """Decode ``count`` symbols from a packed word stream (padded output
    uint8[out_len]; positions >= count are zero)."""
    if out_len <= 0:
        raise ValueError("fgk_decode_chunk needs a static out_len")
    L = out_len

    def step(carry, i):
        st, pos = carry
        ok = i < count
        st2, sym, pos2 = fgk_decode_step(st, words, pos)
        st = jax.tree_util.tree_map(lambda a, b: jnp.where(ok, a, b), st2, st)
        pos = jnp.where(ok, pos2, pos)
        return (st, pos), jnp.where(ok, sym, 0).astype(jnp.uint8)

    (_, _), out = jax.lax.scan(
        step, (fgk_init(), jnp.int32(0)), jnp.arange(L, dtype=jnp.int32)
    )
    return out


def fgk_decode_batch(words: jax.Array, counts: jax.Array, out_len: int):
    """vmap over chunk streams: (C, W) words + (C,) counts -> (C, out_len)."""
    return jax.vmap(lambda w, c: fgk_decode_chunk(w, c, out_len))(words, counts)
