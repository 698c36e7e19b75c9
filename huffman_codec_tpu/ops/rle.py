"""MNP-5 byte RLE as fully parallel TPU array ops.

Reference behavior (transform.cpp:241-292 + 137-159), with its three format
quirks that matter for bit-exactness (SURVEY.md §2.3):

1. a run of N>=3 equal bytes = 3 literals + one count byte ``min(N,258)-3``;
2. count byte 255 (chunk of 258) resets the matcher — longer runs restart;
3. the LAST input byte never extends a run (the ``next(it) != vec.end()``
   guard at transform.cpp:252): it is always emitted as a fresh literal,
   after flushing any pending count byte.

Encoder design (no scan at all)
-------------------------------
Those rules collapse into a closed-form per-position emission formula. Split
the input into maximal equal-byte segments, force a segment break before the
last valid byte (rule 3), and let ``q = (i - segment_start) mod 258``:

* position i emits its literal   iff q < 3
* position i emits a count byte  iff q == 257 (rule 2) or it is the last
  position of its segment with q >= 2; the count value is q - 2 in both cases

Segment starts are a shifted compare, ``q`` comes from a cummax, output
offsets from one exclusive cumsum, and the bytes land with two scatters:
O(n) work, O(log n) depth, perfectly vectorized. The same formula with the
scatters dropped yields the encoded *size* only — that cheap form powers the
adaptive block-RLE search (2 scans x 8 block sizes, SURVEY.md §2.4).

Decoder design (block FSM, no per-byte scan over the stream)
------------------------------------------------------------
The decoder (transform.cpp:137-159) is a 2-field FSM: (match, count<=3);
count==3 turns the next byte into a count byte. The byte stream is cut into
fixed blocks; we run the FSM **vectorized across all blocks at once** from
all 8 abstract entry states (count in 0..3 x whether the inherited match
equals the block byte it will first be compared against — a concrete match
value survives at most one block byte, because every literal overwrites
match). A tiny sequential scan over blocks (n/B steps, one 8-way gather
each) resolves the real entry states; a second vectorized pass classifies
every byte. Expansion is then a searchsorted-gather over output positions.
Work O(n), depth O(B + n/B) instead of O(n).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from huffman_codec_tpu.ops.compact import monotone_compact, monotone_spread

RESET_CHUNK = 258  # 255 (max count byte) + 3 literals, transform.cpp:256-263


def rle_max_encoded_len(n: int) -> int:
    """Worst case: every 3-byte run costs a count byte ("AAAB AAB..." ->
    4 out per 3 in). Static bound for the padded output buffer."""
    return n + n // 3 + 4


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _emissions(x: jax.Array, length: jax.Array):
    """Per-position (emit_literal, emit_count, count_value) per the formula
    above. ``x`` is a padded uint8[N]; only i < length is valid."""
    n = x.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < length
    prev = jnp.roll(x, 1)
    # segment break: first byte, value change, or the forced last-byte break
    seg_start = (idx == 0) | (x != prev) | (idx == length - 1)
    # position of own segment start via cummax of start indices
    start_idx = jax.lax.cummax(jnp.where(seg_start, idx, 0))
    q = (idx - start_idx) % RESET_CHUNK
    nxt_start = jnp.concatenate([seg_start[1:], jnp.ones((1,), dtype=bool)])
    seg_end = nxt_start | (idx == length - 1)
    emit_lit = valid & (q < 3)
    emit_cnt = valid & ((q == RESET_CHUNK - 1) | (seg_end & (q >= 2)))
    return emit_lit, emit_cnt, (q - 2).astype(jnp.uint8)


def rle_encoded_size(x: jax.Array, length: jax.Array) -> jax.Array:
    """Encoded byte count only — the cheap form for the adaptive search."""
    emit_lit, emit_cnt, _ = _emissions(x, jnp.asarray(length, jnp.int32))
    return jnp.sum(emit_lit.astype(jnp.int32) + emit_cnt.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("out_len",))
def rle_encode(
    x: jax.Array, length: jax.Array | int | None = None, out_len: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """Vectorized MNP-5 encode. Returns (padded output uint8[out_len], true
    encoded length). Bit-exact with applyRLE (transform.cpp:241-279).

    Compaction: slot 2i holds position i's literal, slot 2i+1 its count
    byte; the emission offset IS each kept slot's rank, so the butterfly
    ``monotone_compact`` routes everything in log2(2n) shift/select rounds.
    XLA:TPU lowers colliding/unique scatters alike to ~14 ns per index
    (measured: 233 ms for a 16.8 MB grid) and bitonic sort costs 57 ms;
    the butterfly is pure VPU work — no indexed memory op survives."""
    n = x.shape[0]
    length = jnp.asarray(n if length is None else length, jnp.int32)
    if out_len is None:
        out_len = rle_max_encoded_len(n)
    if n == 0:
        return jnp.zeros((out_len,), jnp.uint8), jnp.int32(0)
    emit_lit, emit_cnt, cnt_val = _emissions(x, length)
    eli = emit_lit.astype(jnp.int32)
    per_pos = eli + emit_cnt.astype(jnp.int32)
    off = jnp.cumsum(per_pos) - per_pos  # exclusive prefix sum
    total = off[-1] + per_pos[-1]
    if n >= 1 << 17:
        # whole-file widths: the (n, 2) -> 2n interleave reshape below is
        # an XLA:TPU COMPILE bomb at these shapes (measured 43 s of the
        # 59 s rle_encode compile at n = 262144 — the r4 "adaptive cold
        # compile" hotspot; fusion barriers don't help, the relayout
        # itself is what the compiler chokes on). Route one packed
        # 16-bit pair per POSITION instead (the Pallas kernel's design,
        # pallas_kernels.py:_rle_fused_kernel): position targets are
        # strictly increasing with gaps <= 2, the pair's second byte is
        # recovered from the gap slot's fill value. Compiles in ~10 s.
        emit2 = emit_lit & emit_cnt
        b0 = jnp.where(emit_lit, x.astype(jnp.int32),
                       cnt_val.astype(jnp.int32))
        b1 = jnp.where(emit2, cnt_val.astype(jnp.int32), 0)
        kept = per_pos > 0
        vv, _ = monotone_spread(b0 | (b1 << 8), off, kept, out_len,
                                max_gap=2)
        tt, _ = monotone_spread(off, off, kept, out_len, max_gap=2)
        j = jnp.arange(out_len, dtype=jnp.int32)
        out = jnp.where(tt == j, vv & 255, (vv >> 8) & 255)
        out = jnp.where(j < total, out, 0).astype(jnp.uint8)
        return out, total
    # slot 2i = position i's literal, 2i+1 its count byte: interleave with
    # stack+reshape, NOT x[slot >> 1] indexing — XLA:TPU executes those
    # strided gathers at ~14 ns/element (5 of them cost 35 ms for a
    # 262 KB stream; the reshape form is a layout no-op)
    emit = jnp.stack([emit_lit, emit_cnt], axis=-1).reshape(2 * n)
    tgt = jnp.stack([off, off + eli], axis=-1).reshape(2 * n)
    val = jnp.stack([x.astype(jnp.int32), cnt_val.astype(jnp.int32)],
                    axis=-1).reshape(2 * n)
    out = monotone_compact(val, tgt, emit, out_len).astype(jnp.uint8)
    return out, total


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
#
# Abstract entry state of a block: s in [0, 8)
#   s = count*2 + eq0          for count in {0,1,2}  (match compared vs b[0])
#   s = 6 + eq1                for count == 3        (b[0] is a count byte;
#                               match is next compared vs b[1])
# where eqJ = (inherited match == block[J]). The initial stream state is
# count=0 with an irrelevant match (a first compare against any match value
# yields count=1 either way), abstract state 0.

_N_STATES = 8


def _entry_state(entry: jax.Array, b0: jax.Array, b1: jax.Array):
    """Abstract state index -> concrete (count0, match0) given the block's
    first two bytes. match0 = -1 means "differs from every byte"."""
    count0 = jnp.where(entry < 6, entry // 2, 3).astype(jnp.int32)
    eq = jnp.where(entry < 6, entry % 2, entry - 6)
    cmp_byte = jnp.where(entry < 6, b0, b1).astype(jnp.int32)
    match0 = jnp.where(eq == 1, cmp_byte, -1)
    count0, match0 = jnp.broadcast_arrays(count0, match0)
    return count0, match0


def _fsm_step(state, c):
    """One byte of the reference decoder FSM (transform.cpp:137-159),
    broadcast over any batch dims."""
    match, count = state
    is_cnt = count == 3
    new_match = jnp.where(is_cnt, match, c)
    eq = (match == c) & ~is_cnt
    new_count = jnp.where(is_cnt, 0, jnp.where(eq, count + 1, 1))
    return (new_match, new_count), is_cnt


@functools.partial(jax.jit, static_argnames=("block",))
def rle_classify(data: jax.Array, length: jax.Array,
                 block: int = 512) -> jax.Array:
    """Per-byte count-byte classification of an MNP-5 stream — the three
    FSM passes of the block decoder (see module docstring) without the
    expansion. Returns bool[N]; position i is True iff data[i] is a
    count byte. Split out so the TPU path can run the expansion as a
    fused Pallas kernel (ops/pallas_kernels.rle_expand) on this mask."""
    n = data.shape[0]
    nb = -(-n // block)
    padded = jnp.zeros((nb * block,), jnp.uint8).at[:n].set(data)
    blocks = padded.reshape(nb, block)
    blocks_t = blocks.T.astype(jnp.int32)  # time-major for lax.scan

    # pass 1: evolve all 8 abstract entry states for every block in
    # parallel. State layout is (8, nb) — STATE-major: with the 8-state
    # axis minor, XLA:TPU pads it to 128 vector lanes and every scan
    # step burns 16x the VPU work (measured: the decode tail's largest
    # cost); block-minor arrays pad only nb -> roundup(nb, 128)
    s = jnp.arange(_N_STATES, dtype=jnp.int32)[:, None]  # (8, 1)
    b0 = blocks[:, 0].astype(jnp.int32)[None, :]
    b1 = blocks[:, 1].astype(jnp.int32)[None, :]
    count0, match0 = _entry_state(s, b0, b1)  # (8, nb) each

    def step_all(state, c):  # c: (nb,) -> broadcast over the 8 state rows
        new_state, _ = _fsm_step(state, c[None, :])
        return new_state, None

    (match_f, count_f), _ = jax.lax.scan(step_all, (match0, count0), blocks_t)

    # exit state -> the NEXT block's abstract entry index
    nxt0 = jnp.roll(blocks[:, 0], -1).astype(jnp.int32)[None, :]
    nxt1 = jnp.roll(blocks[:, 1], -1).astype(jnp.int32)[None, :]
    eq0 = (match_f == nxt0).astype(jnp.int32)
    eq1 = (match_f == nxt1).astype(jnp.int32)
    trans = jnp.where(count_f < 3, count_f * 2 + eq0, 6 + eq1).T  # (nb, 8)

    # pass 2: tiny sequential scan resolving real entry states (nb steps)
    def resolve(state_idx, t_row):
        return t_row[state_idx], state_idx

    _, entry = jax.lax.scan(resolve, jnp.int32(0), trans)  # (nb,)

    # pass 3: rerun the FSM from the true entry states, classify every byte
    count0r, match0r = _entry_state(entry, blocks[:, 0].astype(jnp.int32),
                                    blocks[:, 1].astype(jnp.int32))

    def step_real(state, c):
        return _fsm_step(state, c)

    _, is_cnt_t = jax.lax.scan(step_real, (match0r, count0r), blocks_t)
    is_cnt = is_cnt_t.T.reshape(-1)[:n]
    return is_cnt & (jnp.arange(n, dtype=jnp.int32) < length)


@functools.partial(jax.jit, static_argnames=("out_len", "block"))
def rle_decode(
    data: jax.Array,
    length: jax.Array | int | None = None,
    out_len: int = 0,
    block: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Parallel MNP-5 decode. ``data`` is padded uint8[N]; only i < length is
    real. Returns (padded output uint8[out_len], true decoded length).

    ``out_len`` must be a static upper bound on the decoded size — the caller
    always knows one (a v1 stream decodes to a size recoverable from context;
    the v2 manifest stores it exactly).
    """
    if block < 2:
        raise ValueError("block must be >= 2")
    n = data.shape[0]
    length = jnp.asarray(n if length is None else length, jnp.int32)
    if out_len <= 0:
        raise ValueError("rle_decode needs a static out_len bound")
    if n == 0:
        return jnp.zeros((out_len,), jnp.uint8), jnp.int32(0)
    is_cnt = rle_classify(data, length, block)
    # a count byte of value v expands to v copies of match == data[i-1]: the
    # byte before a count byte is always the 3rd literal of its run
    valid = jnp.arange(n, dtype=jnp.int32) < length
    expand = jnp.where(is_cnt, data.astype(jnp.int32), 1)
    expand = jnp.where(valid, expand, 0)
    off = jnp.cumsum(expand) - expand
    total = off[-1] + expand[-1]
    src_val = jnp.where(is_cnt, jnp.roll(data, 1), data)

    # expansion = monotone routing, not search: place each nonzero-width
    # source's value at its output offset (strictly increasing over kept
    # sources) and fill the run body forward. searchsorted here cost 17
    # gather rounds per output element on TPU (the round-2 decode
    # bottleneck); the butterfly spread + <=9 fill rounds are pure VPU.
    kept = (expand > 0)
    out, _ = monotone_spread(src_val, off, kept, out_len,
                             max_gap=RESET_CHUNK)
    out_idx = jnp.arange(out_len, dtype=jnp.int32)
    out = jnp.where(out_idx < total, out, 0).astype(jnp.uint8)
    return out, total
