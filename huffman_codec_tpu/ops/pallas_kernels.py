"""Hand-written Pallas TPU kernels for hot ops.

XLA's fusion already handles most of this codec's pipeline well (the
transforms are elementwise/scan-shaped), so Pallas is reserved for the
spots where XLA's lowering fights the hardware (all numbers measured on
the v5e with micro_rle.py / micro_pack.py, 16.8 MB grid):

- ``histogram256``: per-chunk byte histograms. The natural scatter-add
  formulation serializes on TPU; the XLA-friendly broadcast-compare form
  (ops/canonical.py) relies on fusion to avoid materializing a
  (C, L, 256) compare. This kernel makes the blocking explicit: the chunk
  streams through VMEM in 2048-symbol blocks, each block's one-hot
  compare stays in registers and folds straight into a (256,) VMEM
  accumulator — HBM traffic is the input bytes + 1 KB of counts per
  chunk, the roofline for this op.

- ``lane_pack``: the canonical entropy encode hot path (per-symbol code
  lookup + MSB-first bit packing). XLA's per-element ops are hopeless
  here: a 256-entry ``take_along_axis`` costs ~10.6 ns/element (237 ms for
  the grid) and every scatter ~14 ns/index (233-352 ms). The lookup is a
  256-row one-hot sum-select against the broadcast table (every
  intermediate keeps the lane axis — Mosaic's layout inference rejects
  flatten-style reshapes like (8, 512) -> (4096, 1)), and placement is the
  monotone butterfly network (ops/compact.py proof). Lanes are word-aligned
  in the v3 wire format (<= 31 pad bits per lane) so packing is lane-LOCAL
  — no cross-lane carry, no global merge; the host strips inter-lane
  padding with one boolean mask.

Each kernel takes an ``interpret`` flag for CPU-mode testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_SYM = 256
_LANES = 128  # TPU minor (lane) dimension
_SLAB_ROWS = 8  # sublane rows folded per inner step (8 x 128 = 1024 syms);
# must be a multiple of the i32 sublane tile (8) so the dynamic row slice
# inside the loop is provably aligned for Mosaic


def pick_block(L: int) -> int:
    """Supported inner block size when the chunk length is Pallas-tileable
    (0 otherwise — caller falls back to the XLA formulation). Chunk rows
    are viewed as (L/128, 128) tiles; the inner step folds 4 rows."""
    return _SLAB_ROWS * _LANES if L % (_SLAB_ROWS * _LANES) == 0 else 0


def _hist_kernel(len_ref, sym_ref, out_ref):
    """One grid step = one chunk, viewed as (R, 128) byte rows.

    ``len_ref`` is the scalar-prefetch operand (SMEM) — dynamic scalar
    indexing is only legal there, not on VMEM vectors."""
    R = sym_ref.shape[1]
    length = len_ref[pl.program_id(0)]
    col = jax.lax.broadcasted_iota(jnp.int32, (_SLAB_ROWS, _LANES, 1), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_SLAB_ROWS, _LANES, 1), 0)
    v = jax.lax.broadcasted_iota(
        jnp.int32, (_SLAB_ROWS, _LANES, N_SYM), 2)

    def body(b, acc):
        r0 = b * _SLAB_ROWS
        blk = sym_ref[0, pl.ds(r0, _SLAB_ROWS), :]
        pos = (r0 + row[..., 0]) * _LANES + col[..., 0]
        valid = pos < length
        # (8, 128, 256) one-hot compare folded into the accumulator —
        # ~1 MB of vregs, never leaves the core
        eq = (blk[:, :, None] == v) & valid[:, :, None]
        return acc + jnp.sum(eq.astype(jnp.int32), axis=(0, 1))

    acc = jax.lax.fori_loop(0, R // _SLAB_ROWS, body,
                            jnp.zeros((N_SYM,), jnp.int32))
    out_ref[0, 0, :] = acc


def lane_words_cap(lane: int) -> int:
    """Output words per lane: codes are <= 31 bits, rounded to a 128-lane
    tile multiple."""
    return -(-(lane * 31 // 32 + 1) // 128) * 128


_LB = 8  # lanes (rows) per inner step


def _shift_rows(x, d, fill):
    """x[..., j] <- x[..., j+d] along the last axis, filling the tail."""
    n = x.shape[-1]
    # pltpu.roll wants non-negative shifts: left-by-d == right-by-(n-d)
    rolled = pltpu.roll(x, shift=n - d, axis=len(x.shape) - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    return jnp.where(col >= n - d, fill, rolled)


def _column_place(tgt0, vals, valid, col, shift_by):
    """Merge + place one window column: ``tgt0`` (LB, N) is nondecreasing
    and dense-from-0 over valid entries (codes <= 31 bits => every used
    word contains a code start), so after the bounded-run OR-merge the
    k-th run-end belongs at word k — routed by the monotone butterfly
    (ops/compact.py proof), then the whole row shifts right by
    ``shift_by`` (window column offset)."""
    N = tgt0.shape[1]
    accv = vals
    idx = jnp.where(valid, tgt0, N + col)  # unique OOB for empty tail
    d = 1
    while d <= 64:  # a word holds <= 33 codes; runs are <= 33 long
        pv = pltpu.roll(accv, shift=d, axis=1)
        pi = pltpu.roll(idx, shift=d, axis=1)
        ok = (col >= d) & (pi == idx)
        accv = jnp.where(ok, accv | pv, accv)
        d <<= 1
    nxt = _shift_rows(idx, 1, jnp.int32(-1))
    ends = (idx != nxt) & valid

    r = jnp.where(ends, col - tgt0, 0)
    v = jnp.where(ends, accv, 0)
    d = 1
    while d < N:
        in_r = _shift_rows(r, d, jnp.int32(0))
        in_v = _shift_rows(v, d, jnp.int32(0))
        arrive = (in_r & d) != 0
        moved = (r & d) != 0
        v = jnp.where(arrive, in_v, v)
        r = jnp.where(arrive, in_r - d, jnp.where(moved, 0, r))
        d <<= 1
    # butterfly residue survives past the last routed element — a column
    # whose word has no code START (spill-only final word) must stay 0
    n_ends = jnp.sum(ends.astype(jnp.int32), axis=1, keepdims=True)
    v = jnp.where(col < n_ends, v, 0)
    if shift_by:
        v = pltpu.roll(v, shift=shift_by, axis=1)
        v = jnp.where(col < shift_by, 0, v)
    return v


def _lane_pack_kernel(len_ref, sym_ref, tab_ref, out_ref):
    """One grid step = one chunk: per-symbol (code, len) via a 256-row
    sum-select against the packed table (the same gather-free pattern the
    decode kernel uses — every shape keeps the lane axis, which is what
    Mosaic's layout inference needs; flatten-style reshapes don't lower),
    lane-local offsets via log-shift prefix sums, window construction on
    the VPU, and placement via the monotone butterfly — no
    gather/scatter/sort anywhere; XLA:TPU executes those at ~10-14
    ns/element (measured). Each lane's bit count rides in the buffer's
    spare tail word (column W-1, beyond the 497-word data maximum)."""
    c = pl.program_id(0)
    n_lanes, lane = sym_ref.shape[1], sym_ref.shape[2]
    W = out_ref.shape[2]
    length = len_ref[c]
    tab = tab_ref[0]  # (256, 1) i32 packed code | len << 26
    krow = jax.lax.broadcasted_iota(jnp.int32, (N_SYM, lane), 0)

    def block(b, _):
        sym = sym_ref[0, pl.ds(b * _LB, _LB), :]  # (LB, lane) int32
        row = jax.lax.broadcasted_iota(jnp.int32, (_LB, lane), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (_LB, lane), 1)
        # table lookup, one sublane row at a time: hit (256, lane) one-hot
        # masks the broadcast table column; the sublane-axis sum collapses
        # it to the row's packed values — all 2D, lane axis preserved
        packed = jnp.zeros((_LB, lane), jnp.int32)
        for r in range(_LB):
            hit = krow == sym[r: r + 1, :]
            val = jnp.sum(jnp.where(hit, tab, 0), axis=0, keepdims=True)
            packed = jnp.where(row == r, val, packed)
        # mask symbols past the chunk's true stream length
        pos = (b * _LB + row) * lane + col
        packed = jnp.where(pos < length, packed, 0)
        code = (packed & ((1 << 26) - 1)).astype(jnp.uint32)
        ln = packed >> 26

        # lane-local exclusive bit offsets (log-shift prefix sum)
        acc = ln
        d = 1
        while d < lane:
            rr = pltpu.roll(acc, shift=d, axis=1)
            acc = acc + jnp.where(col < d, 0, rr)
            d <<= 1
        off = acc - ln  # inclusive -> exclusive
        tb = acc[:, lane - 1: lane]  # (LB, 1) lane bit totals, kept 2D

        # 2-word windows, MSB of the code at in-window bit (off & 31)
        w0 = off >> 5
        s = 64 - (off & 31) - ln
        big = s >> 5  # 0: spills into w0+1; 1: fits in w0; 2: empty code
        sm = (s & 31).astype(jnp.uint32)
        zero = jnp.zeros_like(code)
        fit = jnp.where(big == 1, code, zero)
        spill = jnp.where(big == 0, code, zero)
        win0 = (fit << sm) | jnp.where(sm == 0, jnp.uint32(0),
                                       spill >> (jnp.uint32(32) - sm))
        win1 = spill << sm
        valid = ln > 0
        win0 = jnp.where(valid, win0, 0).astype(jnp.int32)
        win1 = jnp.where(valid, win1, 0).astype(jnp.int32)

        out0 = _column_place(w0, win0, valid, col, 0)
        out1 = _column_place(w0, win1, valid, col, 1)
        words = out0 | out1
        used = (tb + 31) >> 5  # (LB, 1)
        words = jnp.where(col < used, words, 0)
        # spare tail word (> 497-word data max) carries the lane bit count
        words = jnp.where(col == W - 1, tb, words)
        out_ref[0, pl.ds(b * _LB, _LB), :] = words[:, :W]
        return 0

    jax.lax.fori_loop(0, n_lanes // _LB, block, 0)


@functools.partial(jax.jit, static_argnames=("lane", "interpret"))
def lane_pack(data: jax.Array, lengths: jax.Array, tables: jax.Array,
              lane: int = 512, interpret: bool = False):
    """Canonical entropy encode of (C, L) rle streams into word-aligned
    lane buffers.

    data: (C, L) uint8 symbols (L = n_lanes * lane, padded); lengths: (C,)
    valid symbol counts; tables: (C, 256) uint32 packed ``code | len << 26``
    (code < 2^26, len <= 31 — guaranteed by the Fibonacci bound for lane
    chunks). Returns (lane_buf (C, n_lanes, W) uint32, lane_bits
    (C, n_lanes) int32). Wire layout: lane k's bitstream occupies
    ceil(lane_bits/32) words starting word-aligned; the host strips the
    inter-lane padding with one boolean mask.
    """
    C, L = data.shape
    if L % lane or lane % 128:
        raise ValueError("L must divide by lane, lane by 128")
    n_lanes = L // lane
    if n_lanes % _LB:
        raise ValueError(f"n_lanes must divide by {_LB}")
    W = lane_words_cap(lane)
    tab = tables.astype(jnp.int32)[:, :, None]  # (C, 256, 1), values < 2^31
    sym = data.reshape(C, n_lanes, lane).astype(jnp.int32)
    out = pl.pallas_call(
        _lane_pack_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, n_lanes, lane), lambda c, lens: (c, 0, 0)),
                pl.BlockSpec((1, 256, 1), lambda c, lens: (c, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, n_lanes, W),
                                   lambda c, lens: (c, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((C, n_lanes, W), jnp.int32),
        interpret=interpret,
    )(lengths.astype(jnp.int32), sym, tab)
    bits = out[:, :, W - 1]
    words = out.at[:, :, W - 1].set(0).astype(jnp.uint32)
    return words, bits


def lane_pack_xla(data: jax.Array, lengths: jax.Array, tables: jax.Array,
                  lane: int = 512):
    """Pure-XLA reference/fallback for lane_pack (CPU tests, odd lanes)."""
    from huffman_codec_tpu.ops.pack import pack_codes

    C, L = data.shape
    n_lanes = L // lane
    W = lane_words_cap(lane)
    sym = data.reshape(C * n_lanes, lane).astype(jnp.int32)
    t = jnp.repeat(tables.astype(jnp.int32), n_lanes, axis=0)
    per = jnp.take_along_axis(t, sym, 1)
    pos = (jnp.arange(C * n_lanes)[:, None] % n_lanes) * lane + jnp.arange(lane)[None, :]
    valid = pos < jnp.repeat(lengths.astype(jnp.int32), n_lanes)[:, None]
    per = jnp.where(valid, per, 0)
    code = (per & ((1 << 26) - 1)).astype(jnp.uint32)
    ln = per >> 26
    words, bits = jax.vmap(
        lambda lo, l: pack_codes(lo, jnp.zeros_like(lo), l, W, max_len=32)
    )(code, ln)
    return (words.reshape(C, n_lanes, W),
            bits.reshape(C, n_lanes).astype(jnp.int32))


def _lane_decode_kernel(len_ref, buf_ref, bound_ref, base_ref, canon_ref,
                        out_ref):
    """One grid step = one chunk: every lane decodes its own word-aligned
    bitstream in parallel (lanes = VPU rows). Per symbol step each lane
    holds a left-justified 64-bit window (hi, lo); the code length is the
    first l in 1..31 with (hi >> (32-l)) < bound[l] (a 31-wide compare,
    same rule as the XLA decoder), the symbol index is base[l] + prefix
    value, and the canonical symbol comes from a 256-wide one-hot select —
    no gather anywhere (XLA:TPU gathers cost ~10 ns/element; a 16.8 MB
    decode was measured at 2.7 MB/s). Refills pull the lane's next word
    with a one-hot select over its padded row. Output is written
    time-major (lane position, n_lanes) — dynamic stores on the sublane
    axis — and transposed outside."""
    c = pl.program_id(0)
    Wl, n_lanes = buf_ref.shape[1], buf_ref.shape[2]
    lane = out_ref.shape[1]
    length = len_ref[c]

    bound = bound_ref[0]  # (31, 1) i32, broadcast over lanes
    base = base_ref[0]
    canon = canon_ref[0]  # (256, 1) i32
    lvec = jax.lax.broadcasted_iota(jnp.int32, (31, 1), 0) + 1

    lrow = jax.lax.broadcasted_iota(jnp.int32, (1, n_lanes), 1)
    ns = jnp.clip(length - lrow * lane, 0, lane)  # symbols per lane
    wrow = jax.lax.broadcasted_iota(jnp.int32, (Wl, n_lanes), 0)
    krow = jax.lax.broadcasted_iota(jnp.int32, (256, n_lanes), 0)

    words = buf_ref[0]  # (Wl, n_lanes) int32 (u32 bit patterns), time-major
    hi = words[0:1, :].astype(jnp.uint32)  # (1, n_lanes)
    lo = words[1:2, :].astype(jnp.uint32)

    def step(k, carry):
        hi, lo, navail, cursor = carry
        active = k < ns  # (1, n_lanes)
        v = hi >> (32 - lvec).astype(jnp.uint32)  # (31, n_lanes)
        sel = v.astype(jnp.int32) < bound
        # sel is monotone in l (once true, stays true), so first-true is
        # sel & ~sel[l-1] — roll down a row instead of cumsum (which has
        # no Mosaic lowering); row 0 keeps plain sel
        prev = pltpu.roll(sel.astype(jnp.int32), shift=1, axis=0)
        ft = sel & ((lvec == 1) | (prev == 0))
        fti = ft.astype(jnp.int32)
        l = jnp.sum(fti * lvec, axis=0, keepdims=True)  # (1, n_lanes)
        idx = jnp.sum(fti * (base + v.astype(jnp.int32)), axis=0,
                      keepdims=True)
        sym = jnp.sum(jnp.where(krow == idx, canon, 0), axis=0,
                      keepdims=True)
        out_ref[0, pl.ds(k, 1), :] = jnp.where(active, sym, 0)
        # consume l bits (l = 0 for masked lanes)
        l = jnp.where(active, l, 0)
        lu = l.astype(jnp.uint32)
        hi = jnp.where(l > 0, (hi << lu) | (lo >> (32 - lu)), hi)
        lo = jnp.where(l > 0, lo << lu, lo)
        navail = navail - l
        # refill: invariant navail >= 32 before each decode; after one
        # consume navail >= 1, one conditional word pull restores it
        need = navail < 32
        nw = jnp.sum(jnp.where(wrow == cursor, words, 0), axis=0,
                     keepdims=True).astype(jnp.uint32)
        na = jnp.clip(navail, 1, 31).astype(jnp.uint32)
        hi = jnp.where(need, hi | (nw >> na), hi)
        lo = jnp.where(need, lo | (nw << (32 - na)), lo)
        cursor = jnp.where(need, cursor + 1, cursor)
        navail = jnp.where(need, navail + 32, navail)
        return hi, lo, navail, cursor

    two = jnp.full((1, n_lanes), 2, jnp.int32)
    na0 = jnp.full((1, n_lanes), 64, jnp.int32)
    jax.lax.fori_loop(0, lane, step, (hi, lo, na0, two))


@functools.partial(jax.jit, static_argnames=("lane", "interpret"))
def lane_decode(buf: jax.Array, lens_tables: jax.Array, lengths: jax.Array,
                lane: int = 512, interpret: bool = False) -> jax.Array:
    """Canonical decode of padded lane buffers -> (C, n_lanes * lane) u8.

    ``buf`` is (C, n_lanes, Wl) with lane k's word-aligned bitstream at
    row k (the fixed-stride layout); ``lens_tables`` the (C, 256) uint8
    code lengths; ``lengths`` the per-chunk symbol counts.
    """
    from huffman_codec_tpu.ops.canonical import MAX_LEN, canonical_tables

    C, n_lanes, Wl = buf.shape
    lens = lens_tables.astype(jnp.int32)
    first_code, start_index, canon_syms = canonical_tables(lens)
    bl_count = jnp.diff(start_index, axis=1)
    bound = (first_code[:, 1: MAX_LEN + 1]
             + bl_count[:, 1: MAX_LEN + 1])  # (C, 31)
    base = (start_index[:, 1: MAX_LEN + 1]
            - first_code[:, 1: MAX_LEN + 1])
    out = pl.pallas_call(
        _lane_decode_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, Wl, n_lanes), lambda c, lens: (c, 0, 0)),
                pl.BlockSpec((1, 31, 1), lambda c, lens: (c, 0, 0)),
                pl.BlockSpec((1, 31, 1), lambda c, lens: (c, 0, 0)),
                pl.BlockSpec((1, 256, 1), lambda c, lens: (c, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, lane, n_lanes),
                                   lambda c, lens: (c, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((C, lane, n_lanes), jnp.int32),
        interpret=interpret,
    )(lengths.astype(jnp.int32),
      jnp.transpose(buf.astype(jnp.int32), (0, 2, 1)),
      bound[:, :, None], base[:, :, None], canon_syms[:, :, None])
    # (C, lane, n_lanes) time-major -> (C, n_lanes * lane) symbol order
    return jnp.transpose(out, (0, 2, 1)).reshape(
        C, n_lanes * lane).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def histogram256(data: jax.Array, lengths: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """counts (C, 256) of the valid prefix of each (C, L) chunk row.

    L must divide by 512 (the codec's lane-aligned chunk lengths do);
    check with ``pick_block`` before calling.
    """
    C, L = data.shape
    if not pick_block(L):
        raise ValueError(f"chunk length must divide by {_SLAB_ROWS * _LANES}")
    R = L // _LANES
    # i32 tiles: the i8 sublane tile is 32, which would force 32-row slabs;
    # widening outside the kernel keeps the slab at 8 rows (~1 MB compare)
    tiles = data.reshape(C, R, _LANES).astype(jnp.int32)
    return pl.pallas_call(
        _hist_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # lengths ride in SMEM
            grid=(C,),
            in_specs=[pl.BlockSpec((1, R, _LANES), lambda c, lens: (c, 0, 0))],
            # (C, 1, 256) so the block's last two dims match the array's
            out_specs=pl.BlockSpec((1, 1, N_SYM), lambda c, lens: (c, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((C, 1, N_SYM), jnp.int32),
        interpret=interpret,
    )(lengths.astype(jnp.int32), tiles)[:, 0, :]
