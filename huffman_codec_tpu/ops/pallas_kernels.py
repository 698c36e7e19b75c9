"""Hand-written Pallas TPU kernels for hot ops.

XLA's fusion already handles most of this codec's pipeline well (the
transforms are elementwise/scan-shaped), so Pallas is reserved for the
spots where XLA's lowering fights the hardware (all numbers measured on
the v5e with micro_rle.py / micro_pack.py, 16.8 MB grid):

- ``histogram256``: per-chunk byte histograms. The natural scatter-add
  formulation serializes on TPU, and the direct 256-wide one-hot
  compare-reduce is VPU-bound at ~770 element-ops/byte. This kernel uses
  the radix-16 MXU formulation instead: per 1024-symbol slab, the hi/lo
  nibble one-hots (two 16-wide compares) outer-product on the MXU
  (bf16 x bf16 -> f32) into a (128, 128) accumulator whose r-diagonal is
  the histogram — measured 8x the one-hot kernel (5.2 -> 0.7 ms per
  16.8 MB step).

- ``lane_pack``: the canonical entropy encode hot path (per-symbol code
  lookup + MSB-first bit packing). XLA's per-element ops are hopeless
  here: a 256-entry ``take_along_axis`` costs ~10.6 ns/element (237 ms for
  the grid) and every scatter ~14 ns/index (233-352 ms). The lookup is a
  256-row one-hot sum-select against the broadcast table (every
  intermediate keeps the lane axis — Mosaic's layout inference rejects
  flatten-style reshapes like (8, 512) -> (4096, 1)), and placement is the
  monotone butterfly network (ops/compact.py proof). NOTE (measured, r5):
  porting the decode kernel's bitplane word-select lookup here — 13
  planes of (len << 8 | canonical rank) + a 32-entry adj[l] select —
  LOST to this one-hot (6.45 vs 5.98 ms per 16.8 MB step on the v5e):
  the one-hot's compare/select/reduce runs on perfectly tiled (256, TL)
  vregs at ~2-3 ops per (symbol, value), while the bitplane path's
  (16, 8, TL) word selects, lane-broadcasts of (16, 1) plane columns and
  per-symbol variable shifts lower at well under half that efficiency;
  the decode kernel only wins with bitplanes because its per-symbol step
  has (G, nl)-shaped operands where a 256-row one-hot cannot fill the
  vregs. Lanes are word-aligned
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


# NOTE: sub-32-bit one-hot histogram formulations were tried and are NOT
# portable to this backend: Mosaic v5e rejects i8 vectors outright, has no
# i8/i16 reductions, and "Target does not support this comparison" for i16
# equality. The radix-16 MXU formulation below sidesteps the issue: the
# one-hots are 16-wide (i32 compares), and the 256-way cross product rides
# the MXU as an outer-product accumulation.
_HIST_UNROLL = 2  # slabs folded per fori_loop iteration (measured 2.5x)


def _hist_kernel(len_ref, sym_ref, out_ref):
    """Radix-16 MXU histogram: one grid step = one chunk as (R, 128) rows.

    hist[v] for v = 16*hi + lo is an outer product of the hi/lo nibble
    one-hots: per 8-row slab, A (128, 128) holds [hi[r, c] == a] at row
    s = 16 r + a (B likewise for lo), and ``acc += A @ B^T`` contracts the
    lane axis on the MXU (bf16 in, f32 accumulate — 0/1 values and counts
    < 2^24 stay exact). Cross-row terms (r != r') land off the r-diagonal
    and are dropped by the caller's einsum. Measured 8x faster than the
    direct 256-wide one-hot compare-reduce this replaced: per byte the
    VPU now builds two 16-wide one-hots (~5 full-width vreg ops per slab)
    instead of a 256-wide compare+select+reduce (~770 element-ops/byte).

    ``len_ref`` is the scalar-prefetch operand (SMEM) — dynamic scalar
    indexing is only legal there, not on VMEM vectors."""
    R = sym_ref.shape[1]
    length = len_ref[pl.program_id(0)]
    col = jax.lax.broadcasted_iota(jnp.int32, (_SLAB_ROWS, _LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_SLAB_ROWS, _LANES), 0)
    a3 = jax.lax.broadcasted_iota(jnp.int32, (_SLAB_ROWS, 16, _LANES), 1)

    def slab(r0, acc):
        blk = sym_ref[0, pl.ds(r0, _SLAB_ROWS), :]
        pos = (r0 + row) * _LANES + col
        valid = pos < length
        hi = blk >> 4
        lo = jnp.where(valid, blk & 15, 16)  # invalid -> no lo bucket
        A = (hi[:, None, :] == a3).astype(jnp.bfloat16).reshape(128, _LANES)
        B = (lo[:, None, :] == a3).astype(jnp.bfloat16).reshape(128, _LANES)
        return acc + jax.lax.dot_general(
            A, B, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def body(b, acc):
        for u in range(_HIST_UNROLL):
            acc = slab((b * _HIST_UNROLL + u) * _SLAB_ROWS, acc)
        return acc

    # dynamic trip bound: slabs past the valid prefix contribute nothing
    # — on compressible data ~35% of the padded buffer is skipped
    slabsz = _SLAB_ROWS * _LANES * _HIST_UNROLL
    nblk = jnp.minimum(jnp.int32(R // (_SLAB_ROWS * _HIST_UNROLL)),
                       (length + slabsz - 1) // slabsz)
    acc = jax.lax.fori_loop(0, nblk, body,
                            jnp.zeros((128, 128), jnp.float32))

    # tail slabs the unroll rounding missed (R need only divide by 8)
    def tail(b, acc):
        return jax.lax.cond(
            (b >= nblk * _HIST_UNROLL) & (b * _SLAB_ROWS * _LANES < length),
            lambda a: slab(b * _SLAB_ROWS, a), lambda a: a, acc)

    acc = jax.lax.fori_loop(0, R // _SLAB_ROWS, tail, acc)
    out_ref[0] = acc


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


_TL = 2048  # table-lookup sub-tile: bounds the one-hot compare at
# (256, _TL) i32 = 2 MB of vregs regardless of the lane size — this is
# what lets lanes up to 32768 (the whole-file profile) ride the kernel


def _lane_pack_kernel(len_ref, sym_ref, tab_ref, out_ref):
    """One grid step = an 8-lane row of one chunk (grid (C, n_lanes/8)):
    per-symbol (code, len) via a 256-row sum-select against the packed
    table (the same gather-free pattern the decode kernel uses — every
    shape keeps the lane axis, which is what Mosaic's layout inference
    needs; flatten-style reshapes don't lower), lane-local offsets via
    log-shift prefix sums, window construction on the VPU, and placement
    via the monotone butterfly — no gather/scatter/sort anywhere; XLA:TPU
    executes those at ~10-14 ns/element (measured). The lookup runs in
    _TL-wide sub-tiles so its one-hot never exceeds 2 MB of vregs — lanes
    scale to 32768. Each lane's bit count rides in the buffer's spare
    tail word (column W-1, beyond the per-lane data word maximum)."""
    c, b = pl.program_id(0), pl.program_id(1)
    lane = sym_ref.shape[2]
    W = out_ref.shape[2]
    length = len_ref[c]
    tab = tab_ref[0]  # (256, 1) i32 packed code | len << 26

    # grid steps entirely past the chunk's valid stream would one-hot
    # over masked zeros — ~35% of the padded buffer on compressible
    # data; skip the whole body and emit zeros instead
    live = b * _LB * lane < length

    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[0, :, :] = jnp.zeros((_LB, W), jnp.int32)

    @pl.when(live)
    def _():
        _lane_pack_body(b, length, sym_ref, tab, out_ref, lane, W)


def _lane_pack_body(b, length, sym_ref, tab, out_ref, lane, W):
    TL = min(lane, _TL)
    krow = jax.lax.broadcasted_iota(jnp.int32, (N_SYM, TL), 0)
    sym = sym_ref[0, :, :]  # (LB, lane) int32
    row = jax.lax.broadcasted_iota(jnp.int32, (_LB, lane), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_LB, lane), 1)
    # table lookup, one sublane row at a time, _TL lane columns at a
    # time: hit (256, TL) one-hot masks the broadcast table column; the
    # sublane-axis sum collapses it to the row's packed values
    packed = jnp.zeros((_LB, lane), jnp.int32)
    for r in range(_LB):
        if TL == lane:
            hit = krow == sym[r: r + 1, :]
            val = jnp.sum(jnp.where(hit, tab, 0), axis=0, keepdims=True)
        else:
            tiles = []
            for t0 in range(0, lane, TL):
                hit = krow == sym[r: r + 1, t0: t0 + TL]
                tiles.append(jnp.sum(jnp.where(hit, tab, 0), axis=0,
                                     keepdims=True))
            val = jnp.concatenate(tiles, axis=1)
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
    # spare tail word (> the data word maximum) carries the lane bit count
    words = jnp.where(col == W - 1, tb, words)
    out_ref[0, :, :] = words[:, :W]


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
            grid=(C, n_lanes // _LB),
            in_specs=[
                pl.BlockSpec((1, _LB, lane), lambda c, b, lens: (c, b, 0)),
                pl.BlockSpec((1, 256, 1), lambda c, b, lens: (c, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, _LB, W),
                                   lambda c, b, lens: (c, b, 0)),
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


_DG = 8  # chunks decoded per grid step (sublane batching)


def _lane_decode_kernel(buf_ref, bound_ref, base_ref, planes_ref, ns_ref,
                        out_ref):
    """One grid step = _DG chunks batched on the SUBLANE axis — the round-2
    kernel put one chunk per step, so every per-lane state op ran on a
    (1, n_lanes) row using 1/8 of each vreg; batching 8 chunks fills the
    sublanes and cuts vreg traffic ~8x for the state/select work.

    Per symbol step each lane holds a left-justified 64-bit window
    (hi, lo); the code length is the first l in 1..Lmax with
    (hi >> (32-l)) < bound[l] (Lmax is the static max-code-length bucket —
    tables rarely need the full 31), the symbol index is base[l] + prefix
    value, and the canonical symbol comes from 8 BITPLANES of the
    canon_syms table (select 1 of 8 u32 words per plane + a per-lane
    variable shift) instead of a 256-row one-hot — ~6x fewer vreg ops.
    Refills pull each lane's next word from a 16-word REGISTER WINDOW
    (one-hot over 16 rows); the window itself reloads from the bucketed
    Wb-word buffer only when some lane crosses an 8-word group boundary
    (a lax.cond per 8-symbol block, ~every 6 blocks at 2.7 bpc) — the
    per-symbol one-hot over all Wb rows this replaces was the kernel's
    dominant cost once real containers pushed Wb to 144+ (any single
    incompressible lane in the container sets the bucket). Output is
    written time-major in aligned 8-sublane blocks and transposed
    outside."""
    Wb, G, nl = buf_ref.shape[1], buf_ref.shape[2], buf_ref.shape[3]
    lane = out_ref.shape[1]
    Lmax = bound_ref.shape[1]
    use_win = Wb >= 24 and Wb % 8 == 0

    words = buf_ref[0]                    # (Wb, G, nl) i32 time-major
    bound = bound_ref[0][:, :, None]      # (Lmax, G, 1)
    base = base_ref[0][:, :, None]
    planes = planes_ref[0]                # (8 planes, 8 words, G)
    ns = ns_ref[0][None]                  # (1, G, nl) symbols per lane

    lvec = jax.lax.broadcasted_iota(jnp.int32, (Lmax, 1, 1), 0) + 1
    sh = (32 - lvec).astype(jnp.uint32)
    wrow = jax.lax.broadcasted_iota(jnp.int32, (Wb, G, nl), 0)
    kbit = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0)
    # bitplane table broadcast once per grid step (loop-invariant)
    pb = jnp.broadcast_to(planes[:, :, :, None], (8, 8, G, nl))
    if use_win:
        WG = Wb // 8
        words_g = words.reshape(WG, 8, G, nl)
        gvec = jax.lax.broadcasted_iota(jnp.int32, (WG, 1, 1, 1), 0)
        w16row = jax.lax.broadcasted_iota(jnp.int32, (16, 1, 1), 0)

        def load_window(cursor):
            gb = cursor >> 3  # (1, G, nl) group of each lane's cursor
            w0 = jnp.sum(jnp.where(gvec == gb[None], words_g, 0), axis=0)
            w1 = jnp.sum(jnp.where(gvec == gb[None] + 1, words_g, 0),
                         axis=0)
            return jnp.concatenate([w0, w1], axis=0), gb * 8

    hi0 = words[0][None].astype(jnp.uint32)   # (1, G, nl)
    lo0 = words[1][None].astype(jnp.uint32)

    def sym_step(k, carry):
        hi, lo, navail, cursor, win, wbase = carry
        active = k < ns
        v = (hi >> sh).astype(jnp.int32)      # (Lmax, G, nl)
        sel = v < bound
        # sel is monotone in l (once true, stays true): first-true is
        # sel & ~sel[l-1] — roll down a row (no Mosaic cumsum)
        prev = pltpu.roll(sel.astype(jnp.int32), shift=1, axis=0)
        ft = (sel & ((lvec == 1) | (prev == 0))).astype(jnp.int32)
        l = jnp.sum(ft * lvec, axis=0, keepdims=True)      # (1, G, nl)
        idx = jnp.sum(ft * (base + v), axis=0, keepdims=True)
        # canonical symbol from bitplanes: word select (8-way) + bit shift
        idxw = idx >> 5
        idxb = (idx & 31).astype(jnp.uint32)
        wsel = jnp.zeros((8, G, nl), jnp.int32)
        for j in range(8):
            wsel = wsel + (idxw == j).astype(jnp.int32) * pb[:, j]
        bits = ((wsel.astype(jnp.uint32) >> idxb) & 1).astype(jnp.int32)
        sym = jnp.sum(bits << kbit, axis=0, keepdims=True)
        sym = jnp.where(active, sym, 0)
        # consume l bits (l = 0 for inactive lanes)
        l = jnp.where(active, l, 0)
        lu = l.astype(jnp.uint32)
        hi = jnp.where(l > 0, (hi << lu) | (lo >> (32 - lu)), hi)
        lo = jnp.where(l > 0, lo << lu, lo)
        navail = navail - l
        # refill: invariant navail >= 32 before each decode; one
        # conditional word pull restores it after a consume
        need = navail < 32
        if use_win:
            nw = jnp.sum(jnp.where(w16row == cursor - wbase, win, 0),
                         axis=0, keepdims=True).astype(jnp.uint32)
        else:
            nw = jnp.sum(jnp.where(wrow == cursor, words, 0), axis=0,
                         keepdims=True).astype(jnp.uint32)
        na = jnp.clip(navail, 1, 31).astype(jnp.uint32)
        hi = jnp.where(need, hi | (nw >> na), hi)
        lo = jnp.where(need, lo | (nw << (32 - na)), lo)
        cursor = jnp.where(need, cursor + 1, cursor)
        navail = jnp.where(need, navail + 32, navail)
        return sym, (hi, lo, navail, cursor, win, wbase)

    def block8(b, carry):
        if use_win:
            # a block consumes <= 8 words/lane, so a 16-word window
            # re-centered at each block start always covers the block.
            # (Re-centering only when some lane crosses a group — a
            # lax.cond — trips Mosaic's relayout inference on the merged
            # carry; the unconditional load is 2 Wb-row selects per 8
            # symbols, already ~5x cheaper than the per-symbol Wb-row
            # one-hot this design replaced.)
            hi, lo, navail, cursor, win, wbase = carry
            win, wbase = load_window(cursor)
            carry = (hi, lo, navail, cursor, win, wbase)
        syms = []
        for i in range(8):
            sym, carry = sym_step(b * 8 + i, carry)
            syms.append(sym)
        # aligned 8-sublane store, time-major
        out_ref[0, pl.ds(b * 8, 8)] = jnp.concatenate(syms, axis=0)
        return carry

    na0 = jnp.full((1, G, nl), 64, jnp.int32)
    cur0 = jnp.full((1, G, nl), 2, jnp.int32)
    if use_win:
        win0 = jnp.concatenate([words_g[0], words_g[1]], axis=0)
        wb0 = jnp.zeros((1, G, nl), jnp.int32)
    else:  # dummies so the carry structure is uniform
        win0 = jnp.zeros((16, G, nl), jnp.int32)
        wb0 = jnp.zeros((1, G, nl), jnp.int32)
    jax.lax.fori_loop(0, lane // 8, block8,
                      (hi0, lo0, na0, cur0, win0, wb0))


@functools.partial(jax.jit,
                   static_argnames=("lane", "max_len", "interpret"))
def lane_decode(buf: jax.Array, lens_tables: jax.Array, lengths: jax.Array,
                lane: int = 512, max_len: int = 31,
                interpret: bool = False) -> jax.Array:
    """Canonical decode of padded lane buffers -> (C, n_lanes * lane) u8.

    ``buf`` is (C, n_lanes, Wb) with lane k's word-aligned bitstream at
    row k (any fixed stride Wb >= the fattest lane — callers pass the
    bucketed container stride); ``lens_tables`` the (C, 256) uint8 code
    lengths; ``lengths`` the per-chunk symbol counts; ``max_len`` a static
    upper bound on the code lengths (host-known from the manifest — a
    smaller bucket shrinks the per-symbol boundary compare).
    """
    from huffman_codec_tpu.ops.canonical import canonical_tables

    C, n_lanes, Wb = buf.shape
    if lane % 8:
        raise ValueError("lane must divide by 8")
    Cp = -(-C // _DG) * _DG
    if Cp != C:  # pad to the sublane batch (padded chunks decode nothing)
        buf = jnp.pad(buf, ((0, Cp - C), (0, 0), (0, 0)))
        lens_tables = jnp.pad(lens_tables, ((0, Cp - C), (0, 0)))
        lengths = jnp.pad(lengths, (0, Cp - C))
    lens = lens_tables.astype(jnp.int32)
    first_code, start_index, canon_syms = canonical_tables(lens)
    bl_count = jnp.diff(start_index, axis=1)
    bound = (first_code[:, 1: max_len + 1]
             + bl_count[:, 1: max_len + 1])  # (Cp, Lmax)
    base = (start_index[:, 1: max_len + 1]
            - first_code[:, 1: max_len + 1])
    # canon_syms -> 8 bitplanes of 8 u32 words: plane k word j bit t is
    # bit k of canon_syms[32 j + t]
    csb = (canon_syms[:, :, None] >> jnp.arange(8)[None, None, :]) & 1
    planes = jnp.sum(
        csb.reshape(Cp, 8, 32, 8).astype(jnp.uint32)
        << jnp.arange(32, dtype=jnp.uint32)[None, None, :, None],
        axis=2).astype(jnp.int32)  # (Cp, 8 words, 8 planes)
    lane_syms = jnp.clip(
        lengths.astype(jnp.int32)[:, None]
        - jnp.arange(n_lanes, dtype=jnp.int32)[None, :] * lane, 0, lane)

    g = Cp // _DG
    out = pl.pallas_call(
        _lane_decode_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, Wb, _DG, n_lanes), lambda c: (c, 0, 0, 0)),
            pl.BlockSpec((1, max_len, _DG), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, max_len, _DG), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, 8, 8, _DG), lambda c: (c, 0, 0, 0)),
            pl.BlockSpec((1, _DG, n_lanes), lambda c: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, lane, _DG, n_lanes),
                               lambda c: (c, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, lane, _DG, n_lanes), jnp.int32),
        interpret=interpret,
    )(jnp.transpose(buf.astype(jnp.int32).reshape(g, _DG, n_lanes, Wb),
                    (0, 3, 1, 2)),
      jnp.transpose(bound.reshape(g, _DG, max_len), (0, 2, 1)),
      jnp.transpose(base.reshape(g, _DG, max_len), (0, 2, 1)),
      jnp.transpose(planes.reshape(g, _DG, 8, 8), (0, 3, 2, 1)),
      lane_syms.reshape(g, _DG, n_lanes))
    # (g, lane, G, nl) time-major -> (C, n_lanes * lane) symbol order
    return jnp.transpose(out, (0, 2, 3, 1)).reshape(
        Cp, n_lanes * lane)[:C].astype(jnp.uint8)


def _lane_decode_kernel_lm(buf_ref, bound_ref, base_ref, planes_ref, ns_ref,
                           out_ref):
    """Lane-major variant of the decode kernel for FEW FAT lanes (the
    whole-file archival profile: <= 16 lanes of up to 16384 symbols after
    the chunk-axis re-batch). The time-major kernel's (lane, G, nl)
    output block pads its minor nl axis to 128 vector lanes — ~4 KB per
    symbol row, VMEM-infeasible past lane 4096. Here the SYMBOL axis is
    minor: buf (G, nl, Wb), out (G, nl, lane); 128 decoded symbols
    accumulate in a (G, nl, 128) register tile and store with one aligned
    write. The per-symbol decode math is identical (first-l boundary
    compare, bitplane symbol lookup, conditional refill)."""
    G, nl, Wb = buf_ref.shape[1], buf_ref.shape[2], buf_ref.shape[3]
    lane = out_ref.shape[3]
    Lmax = bound_ref.shape[1]

    words = buf_ref[0]                    # (G, nl, Wb) i32 lane-major
    bound = bound_ref[0][:, :, None]      # (Lmax, G, 1)
    base = base_ref[0][:, :, None]
    planes = planes_ref[0]                # (8 planes, 8 words, G)
    ns = ns_ref[0][None]                  # (1, G, nl) symbols per lane

    lvec = jax.lax.broadcasted_iota(jnp.int32, (Lmax, 1, 1), 0) + 1
    sh = (32 - lvec).astype(jnp.uint32)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (G, nl, Wb), 2)
    kbit = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0)
    colL = jax.lax.broadcasted_iota(jnp.int32, (G, nl, 128), 2)
    pb = jnp.broadcast_to(planes[:, :, :, None], (8, 8, G, nl))

    hi0 = words[:, :, 0][None].astype(jnp.uint32)   # (1, G, nl)
    lo0 = words[:, :, 1][None].astype(jnp.uint32)

    def sym_step(k, carry):
        hi, lo, navail, cursor = carry
        active = k < ns
        v = (hi >> sh).astype(jnp.int32)      # (Lmax, G, nl)
        sel = v < bound
        prev = pltpu.roll(sel.astype(jnp.int32), shift=1, axis=0)
        ft = (sel & ((lvec == 1) | (prev == 0))).astype(jnp.int32)
        l = jnp.sum(ft * lvec, axis=0, keepdims=True)      # (1, G, nl)
        idx = jnp.sum(ft * (base + v), axis=0, keepdims=True)
        idxw = idx >> 5
        idxb = (idx & 31).astype(jnp.uint32)
        wsel = jnp.zeros((8, G, nl), jnp.int32)
        for j in range(8):
            wsel = wsel + (idxw == j).astype(jnp.int32) * pb[:, j]
        bits = ((wsel.astype(jnp.uint32) >> idxb) & 1).astype(jnp.int32)
        sym = jnp.sum(bits << kbit, axis=0, keepdims=True)
        sym = jnp.where(active, sym, 0)
        l = jnp.where(active, l, 0)
        lu = l.astype(jnp.uint32)
        hi = jnp.where(l > 0, (hi << lu) | (lo >> (32 - lu)), hi)
        lo = jnp.where(l > 0, lo << lu, lo)
        navail = navail - l
        need = navail < 32
        # next word: one-hot select over the lane-MINOR word axis
        nw = jnp.sum(jnp.where(wcol == cursor[0][:, :, None], words, 0),
                     axis=2)[None].astype(jnp.uint32)
        na = jnp.clip(navail, 1, 31).astype(jnp.uint32)
        hi = jnp.where(need, hi | (nw >> na), hi)
        lo = jnp.where(need, lo | (nw << (32 - na)), lo)
        cursor = jnp.where(need, cursor + 1, cursor)
        navail = jnp.where(need, navail + 32, navail)
        return sym, (hi, lo, navail, cursor)

    def block128(b, carry):
        def inner(i, c2):
            acc, st = c2
            sym, st = sym_step(b * 128 + i, st)
            acc = jnp.where(colL == i, sym[0][:, :, None], acc)
            return acc, st
        acc, carry = jax.lax.fori_loop(
            0, 128, inner, (jnp.zeros((G, nl, 128), jnp.int32), carry))
        out_ref[0, :, :, pl.ds(b * 128, 128)] = acc
        return carry

    na0 = jnp.full((1, G, nl), 64, jnp.int32)
    cur0 = jnp.full((1, G, nl), 2, jnp.int32)
    jax.lax.fori_loop(0, lane // 128, block128, (hi0, lo0, na0, cur0))


@functools.partial(jax.jit,
                   static_argnames=("lane", "max_len", "interpret"))
def lane_decode_lanemajor(buf: jax.Array, lens_tables: jax.Array,
                          lengths: jax.Array, lane: int = 8192,
                          max_len: int = 31,
                          interpret: bool = False) -> jax.Array:
    """Canonical decode for few fat lanes — same contract as
    ``lane_decode`` (buf (C, n_lanes, Wb) -> (C, n_lanes * lane) uint8)
    with the kernel's big blocks laid out lane-major; see
    ``_lane_decode_kernel_lm``. Requires lane % 128 == 0."""
    from huffman_codec_tpu.ops.canonical import canonical_tables

    C, n_lanes, Wb = buf.shape
    if lane % 128:
        raise ValueError("lane must divide by 128")
    Cp = -(-C // _DG) * _DG
    if Cp != C:
        buf = jnp.pad(buf, ((0, Cp - C), (0, 0), (0, 0)))
        lens_tables = jnp.pad(lens_tables, ((0, Cp - C), (0, 0)))
        lengths = jnp.pad(lengths, (0, Cp - C))
    lens = lens_tables.astype(jnp.int32)
    first_code, start_index, canon_syms = canonical_tables(lens)
    bl_count = jnp.diff(start_index, axis=1)
    bound = (first_code[:, 1: max_len + 1]
             + bl_count[:, 1: max_len + 1])
    base = (start_index[:, 1: max_len + 1]
            - first_code[:, 1: max_len + 1])
    csb = (canon_syms[:, :, None] >> jnp.arange(8)[None, None, :]) & 1
    planes = jnp.sum(
        csb.reshape(Cp, 8, 32, 8).astype(jnp.uint32)
        << jnp.arange(32, dtype=jnp.uint32)[None, None, :, None],
        axis=2).astype(jnp.int32)  # (Cp, 8 words, 8 planes)
    lane_syms = jnp.clip(
        lengths.astype(jnp.int32)[:, None]
        - jnp.arange(n_lanes, dtype=jnp.int32)[None, :] * lane, 0, lane)

    g = Cp // _DG
    out = pl.pallas_call(
        _lane_decode_kernel_lm,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, _DG, n_lanes, Wb), lambda c: (c, 0, 0, 0)),
            pl.BlockSpec((1, max_len, _DG), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, max_len, _DG), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, 8, 8, _DG), lambda c: (c, 0, 0, 0)),
            pl.BlockSpec((1, _DG, n_lanes), lambda c: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _DG, n_lanes, lane),
                               lambda c: (c, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, _DG, n_lanes, lane), jnp.int32),
        interpret=interpret,
    )(buf.astype(jnp.int32).reshape(g, _DG, n_lanes, Wb),
      jnp.transpose(bound.reshape(g, _DG, max_len), (0, 2, 1)),
      jnp.transpose(base.reshape(g, _DG, max_len), (0, 2, 1)),
      jnp.transpose(planes.reshape(g, _DG, 8, 8), (0, 3, 2, 1)),
      lane_syms.reshape(g, _DG, n_lanes))
    # (g, G, nl, lane) is already symbol order per (chunk, lane)
    return out.reshape(Cp, n_lanes * lane)[:C].astype(jnp.uint8)


# ---------------------------------------------------------------------------
# fused diff + MNP-5 RLE encode
# ---------------------------------------------------------------------------
#
RESET_CHUNK = 258  # mirrors ops/rle.py (transform.cpp:256-263)

# The XLA formulation of the RLE encoder (ops/rle.py) is correct but
# HBM-bound: the cummax/cumsum/butterfly stages each round-trip 2n-wide
# int32 arrays through HBM (measured 38 ms for a 16.8 MB grid — the
# largest encode stage). This kernel runs the whole per-chunk pipeline —
# diff model, segment detection, the closed-form emission formula, the
# prefix sums, and the two monotone butterfly routings — inside VMEM.
# All flat-order shifts decompose into pltpu.roll on the lane axis plus a
# row roll for the cross-row boundary (power-of-two distances only).


def _flat_shift_left(x, d, R, fill):
    """y[i] = x[i + d] over the flattened (R, 128) layout, fill past end."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if d == 0:
        return x
    if d < 128:
        lr = pltpu.roll(x, shift=128 - d, axis=1)  # [r, (c + d) % 128]
        nr = pltpu.roll(lr, shift=R - 1, axis=0)   # row r + 1
        y = jnp.where(col < 128 - d, lr, nr)
    else:
        y = pltpu.roll(x, shift=R - (d >> 7), axis=0)
    flat = row * 128 + col
    return jnp.where(flat >= R * 128 - d, fill, y)


def _flat_shift_right(x, d, R, fill):
    """y[i] = x[i - d] over the flattened (R, 128) layout, fill before 0."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if d == 0:
        return x
    if d < 128:
        rr = pltpu.roll(x, shift=d, axis=1)        # [r, (c - d) % 128]
        pr = pltpu.roll(rr, shift=1, axis=0)       # row r - 1
        y = jnp.where(col >= d, rr, pr)
    else:
        y = pltpu.roll(x, shift=d >> 7, axis=0)
    flat = row * 128 + col
    return jnp.where(flat < d, fill, y)


def _flat_prefix(x, R, op, exclusive):
    """Inclusive/exclusive prefix ``op`` (add or max, identity 0) over the
    flattened (R, 128) layout: 7 lane stages + log2(R) row-carry stages."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    m = x
    d = 1
    while d < 128:  # within-row inclusive prefix
        sh = pltpu.roll(m, shift=d, axis=1)
        m = op(m, jnp.where(col >= d, sh, 0))
        d <<= 1
    if op is jnp.add:
        rowv = jnp.sum(m[:, 127:128], axis=1, keepdims=True)  # row totals
    else:
        rowv = m[:, 127:128]
    # exclusive prefix over rows of rowv
    e = pltpu.roll(rowv, shift=1, axis=0)
    e = jnp.where(row1 >= 1, e, 0)
    d = 1
    while d < R:
        sh = pltpu.roll(e, shift=d, axis=0)
        e = op(e, jnp.where(row1 >= d, sh, 0))
        d <<= 1
    incl = op(m, e)  # broadcast row carry over lanes
    if not exclusive:
        return incl
    return incl - x if op is jnp.add else None


def _mod258(d, bound: int):
    """Exact d % 258 for 0 <= d < ``bound`` (static) via conditional
    subtracts of 258 * 2^k. The chain starts at the largest subtrahend
    m < bound (so d < 2m and one subtract leaves the remainder < m) and
    halves down to 258 — log2(bound/258) selects, any chunk size."""
    q = d
    m = RESET_CHUNK
    while m * 2 < bound:
        m *= 2
    while m >= RESET_CHUNK:
        q = jnp.where(q >= m, q - m, q)
        m //= 2
    return q


def _route(v, t, kept, rank, n_kept, R, capR):
    """Monotone routing: kept element at flat i lands at column t[i]
    (strictly increasing over kept). Left-compact to the dense prefix
    (LSB-first butterfly), widen to capR rows, then place right
    (MSB-first). Returns (vals, have) over (capR, 128)."""
    r = jnp.where(kept, _iota_flat(R) - rank, 0)
    vv, tt = v, t
    d = 1
    while d < R * 128:
        in_v = _flat_shift_left(vv, d, R, 0)
        in_t = _flat_shift_left(tt, d, R, 0)
        in_r = _flat_shift_left(r, d, R, 0)
        arrive = (in_r & d) != 0
        moved = (r & d) != 0
        vv = jnp.where(arrive, in_v, vv)
        tt = jnp.where(arrive, in_t, tt)
        r = jnp.where(arrive, in_r - d, jnp.where(moved, 0, r))
        d <<= 1
    if capR > R:
        pad = jnp.zeros((capR - R, 128), jnp.int32)
        vv = jnp.concatenate([vv, pad], axis=0)
        tt = jnp.concatenate([tt, pad], axis=0)
    elif capR < R:
        # expansion shape (out smaller than the padded stream): the dense
        # prefix holds <= out_len kept elements (targets are in-range),
        # so rows past capR are empty after compaction — truncate
        vv = vv[:capR]
        tt = tt[:capR]
    return _place_right(vv, tt, n_kept, capR)


def _place_right(vv, tt, n_kept, capR):
    """MSB-first right placement of a DENSE PREFIX: element at flat i
    (i < n_kept) lands at column tt[i] >= i (tt strictly increasing).
    Returns (vals, have) over (capR, 128). The remaining shift s and the
    occupancy bit ride ONE packed word (sh = s << 1 | have) so each
    round shifts two arrays, not three — ~25% fewer vreg ops in the
    butterflies that dominate the repad and RLE kernels."""
    flat = _iota_flat(capR)
    live = flat < n_kept
    sh = jnp.where(live, ((tt - flat) << 1) | 1, 0)
    vv = jnp.where(live, vv, 0)
    d = 1 << (capR * 128 - 1).bit_length() - 1
    while d >= 1:
        in_v = _flat_shift_right(vv, d, capR, 0)
        in_sh = _flat_shift_right(sh, d, capR, 0)
        arrive = ((in_sh & 1) != 0) & ((in_sh & (2 * d)) != 0)
        moved = (sh & (2 * d)) != 0  # h == 0 implies s == 0: never fires
        vv = jnp.where(arrive, in_v, vv)
        sh = jnp.where(arrive, in_sh - 2 * d, jnp.where(moved, 0, sh))
        d >>= 1
    return vv, (sh & 1) != 0


def _iota_flat(R):
    return (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))


def _rle_fused_kernel(len_ref, carry_ref, x_ref, out_ref, tot_ref, *,
                      use_diff: bool, R: int, capR: int, tile: int = 0):
    """One grid step = one chunk: diff (carry-seeded) -> segment starts ->
    cummax segment origin -> q = (i - start) % 258 -> emission flags ->
    two prefix sums -> two monotone routings (literals, count bytes).

    ``tile`` > 0 (a power of two) forces a segment restart every ``tile``
    positions and applies the last-byte rule (transform.cpp:252) at every
    tile's final position — the chunk then encodes as the CONCATENATION of
    independent per-tile MNP-5 streams, which is exactly the adaptive
    block-RLE band payload (transform.cpp:97-134) when the caller feeds
    tiles in scan order: the per-chunk prefix sums concatenate the tile
    streams for free, so the band stage needs no separate butterfly
    concat pass."""
    c = pl.program_id(0)
    length = len_ref[c]
    carry = carry_ref[c]
    x = x_ref[0]  # (R, 128) i32
    col = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    fi = _iota_flat(R)

    # previous byte in flat order (carry before position 0)
    lr = pltpu.roll(x, shift=1, axis=1)
    pr = pltpu.roll(lr, shift=1, axis=0)
    prev = jnp.where(col >= 1, lr, pr)
    prev = jnp.where(fi == 0, carry, prev)
    y = ((x - prev) & 255) if use_diff else x
    ylr = pltpu.roll(y, shift=1, axis=1)
    ypr = pltpu.roll(ylr, shift=1, axis=0)
    py = jnp.where(col >= 1, ylr, ypr)

    valid = fi < length
    seg_start = ((fi == 0) | (y != py) | (fi == length - 1)) & valid
    if tile:
        ti = fi & (tile - 1)
        seg_start = (seg_start
                     | (valid & ((ti == 0) | (ti == tile - 1))))
    sidx = _flat_prefix(jnp.where(seg_start, fi, 0), R, jnp.maximum, False)
    q = _mod258(fi - sidx, R * 128)
    nxt_start = _flat_shift_left(seg_start.astype(jnp.int32), 1, R, 1)
    seg_end = (nxt_start != 0) | (fi == length - 1)
    emit_lit = valid & (q < 3)
    emit_cnt = valid & ((q == RESET_CHUNK - 1) | (seg_end & (q >= 2)))

    # a position emits 0, 1 or 2 bytes (2 = third literal + its count at
    # a segment end); pack the pair into ONE routed 16-bit value landing
    # at the pair's first output slot — the second byte's slot is then
    # the only kind of routing gap, closed by a single shift afterwards.
    # This halves the butterfly work vs the two-route (literals, counts)
    # formulation it replaces (measured 8.9 -> 5.3 ms per 16.8 MB step).
    emit2 = emit_lit & emit_cnt
    emit_n = emit_lit.astype(jnp.int32) + emit_cnt.astype(jnp.int32)
    off = _flat_prefix(emit_n, R, jnp.add, True)
    kept = emit_n > 0
    rank = _flat_prefix(kept.astype(jnp.int32), R, jnp.add, True)
    n_kept = jnp.sum(kept.astype(jnp.int32))
    total = jnp.sum(emit_n)
    cntv = (q - 2) & 255
    b0 = jnp.where(emit_lit, y, cntv)
    b1 = jnp.where(emit2, cntv, 0)
    v, have = _route(jnp.where(kept, b0 | (b1 << 8), 0), off, kept,
                     rank, n_kept, R, capR)
    pv = _flat_shift_right(v, 1, capR, 0)
    fo = _iota_flat(capR)
    out = jnp.where(have, v & 255, (pv >> 8) & 255)
    out_ref[0] = jnp.where(fo < total, out, 0)
    tot_ref[0] = jnp.full((1, 128), 0, jnp.int32) + total


@functools.partial(jax.jit,
                   static_argnames=("use_diff", "cap", "interpret", "tile"))
def rle_diff_encode_fused(chunks: jax.Array, lengths: jax.Array,
                          carries: jax.Array, use_diff: bool, cap: int,
                          interpret: bool = False, tile: int = 0):
    """Fused per-chunk diff + MNP-5 RLE encode on TPU.

    chunks (C, n) uint8 (n % 128 == 0), lengths (C,) valid byte counts,
    carries (C,) the input byte preceding each chunk (diff seed).
    Returns (streams (C, cap) uint8, rle_lens (C,) int32) — bit-exact with
    ``diff then ops/rle.rle_encode`` per chunk (cap % 128 == 0).

    ``tile`` > 0 (power of two, dividing n): per-tile restart mode — each
    chunk row is treated as n/tile independent tile streams encoded and
    concatenated in order (see _rle_fused_kernel). Tile mode is for the
    adaptive band stage, whose diff runs in MATRIX order before the tile
    reorder — so it requires ``use_diff=False``.
    """
    C, n = chunks.shape
    if n % 128 or cap % 128:
        raise ValueError("chunk length and cap must divide by 128")
    if tile:
        if tile & (tile - 1) or n % tile:
            raise ValueError("tile must be a power of two dividing n")
        if use_diff:
            raise ValueError("tile mode requires use_diff=False")
    R, capR = n // 128, cap // 128
    x = chunks.reshape(C, R, 128).astype(jnp.int32)
    out, tot = pl.pallas_call(
        functools.partial(_rle_fused_kernel, use_diff=use_diff, R=R,
                          capR=capR, tile=tile),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(C,),
            in_specs=[pl.BlockSpec((1, R, 128), lambda c, l, k: (c, 0, 0))],
            out_specs=[
                pl.BlockSpec((1, capR, 128), lambda c, l, k: (c, 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda c, l, k: (c, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((C, capR, 128), jnp.int32),
            jax.ShapeDtypeStruct((C, 1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(lengths.astype(jnp.int32), carries.astype(jnp.int32), x)
    return out.reshape(C, cap).astype(jnp.uint8), tot[:, 0, 0]


def _rle_expand_kernel(len_ref, carry_ref, x_ref, ic_ref, out_ref, *,
                       use_diff: bool, R: int, outR: int):
    """One grid step = one chunk: MNP-5 expansion (given the per-byte
    count-byte classification from ops/rle.rle_classify) + optional diff
    revert, entirely in VMEM. The XLA formulation round-trips the
    (C, out_len) arrays through HBM for every one of its ~40 butterfly /
    fill / prefix rounds (measured 55 ms per 16.8 MB decode step — the
    decode-tail bottleneck); here the rounds are vreg traffic and HBM
    sees only stream-in + bytes-out."""
    c = pl.program_id(0)
    length = len_ref[c]
    carry = carry_ref[c]
    x = x_ref[0]   # (R, 128) i32 stream bytes
    ic = ic_ref[0]  # (R, 128) i32 count-byte flags
    fi = _iota_flat(R)
    valid = fi < length
    is_cnt = (ic != 0) & valid
    expand = jnp.where(is_cnt, x, jnp.where(valid, 1, 0))
    off = _flat_prefix(expand, R, jnp.add, True)  # exclusive out offsets
    total = jnp.sum(jnp.where(valid, expand, 0))
    # count byte -> repeats of the previous stream byte (the 3rd literal)
    prev = _flat_shift_right(x, 1, R, 0)
    src = jnp.where(is_cnt, prev, x)
    kept = expand > 0
    rank = _flat_prefix(kept.astype(jnp.int32), R, jnp.add, True)
    n_kept = jnp.sum(kept.astype(jnp.int32))
    v, have = _route(jnp.where(kept, src, 0), off, kept, rank, n_kept,
                     R, outR)
    # fill run bodies: a gap between routed sources is < RESET_CHUNK, so
    # log2(258) = 9 nearest-left-source propagation rounds close them all
    hv = have.astype(jnp.int32)
    d = 1
    while d < RESET_CHUNK:
        sv = _flat_shift_right(v, d, outR, 0)
        sh = _flat_shift_right(hv, d, outR, 0)
        fill = (hv == 0) & (sh != 0)
        v = jnp.where(fill, sv, v)
        hv = hv | fill.astype(jnp.int32)
        d <<= 1
    fo = _iota_flat(outR)
    v = jnp.where(fo < total, v, 0)
    if use_diff:
        # diff revert fused: running sum mod 256 seeded by the carry
        v = (_flat_prefix(v, outR, jnp.add, False) + carry) & 255
        v = jnp.where(fo < total, v, 0)
    out_ref[0] = v


@functools.partial(jax.jit,
                   static_argnames=("out_len", "use_diff", "interpret"))
def rle_expand(streams: jax.Array, is_cnt: jax.Array, lengths: jax.Array,
               carries: jax.Array, out_len: int, use_diff: bool,
               interpret: bool = False) -> jax.Array:
    """Fused MNP-5 expansion (+ optional per-chunk diff revert) on TPU.

    streams (C, n) uint8 (n % 128 == 0), is_cnt (C, n) bool (from
    ops/rle.rle_classify), lengths (C,) valid stream byte counts, carries
    (C,) diff seeds. Returns (C, out_len) uint8 — bit-exact with
    ``rle_decode`` then ``diff_revert`` per chunk (out_len % 128 == 0).
    """
    C, n = streams.shape
    if n % 128 or out_len % 128:
        raise ValueError("stream length and out_len must divide by 128")
    R, outR = n // 128, out_len // 128
    x = streams.reshape(C, R, 128).astype(jnp.int32)
    ic = is_cnt.reshape(C, R, 128).astype(jnp.int32)
    out = pl.pallas_call(
        functools.partial(_rle_expand_kernel, use_diff=use_diff, R=R,
                          outR=outR),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, R, 128), lambda c, l, k: (c, 0, 0)),
                pl.BlockSpec((1, R, 128), lambda c, l, k: (c, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, outR, 128), lambda c, l, k: (c, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((C, outR, 128), jnp.int32),
        interpret=interpret,
    )(lengths.astype(jnp.int32), carries.astype(jnp.int32), x, ic)
    return out.reshape(C, out_len).astype(jnp.uint8)


_RG = 8  # chunks per repad grid step: amortizes the ~30 us/step grid +
# DMA-wait overhead measured at one-chunk steps, and the k-th chunk's
# compute overlaps the k+1..RG DMAs (all started up front)


def _repad_kernel(aoff_ref, wc_ref, dense_ref, lw_ref, out_ref, scratch,
                  sem, *, SWR: int, outR: int, nlR: int, Wb: int):
    """One grid step = _RG chunks: DMA each chunk's dense payload words
    from HBM (128-word-aligned dynamic offset) into its VMEM scratch
    slot, then route word i to its padded slot lane(i) * Wb +
    (i - lane_start(i)) — the wire->decoder layout transform entirely in
    VMEM. The XLA spread formulation costs ~12 ms per 16.8 MB step in
    HBM round-trips."""
    g = pl.program_id(0)
    for k in range(_RG):
        pltpu.make_async_copy(
            dense_ref.at[pl.ds(aoff_ref[g * _RG + k], SWR), :],
            scratch.at[k], sem.at[k]).start()
    for k in range(_RG):
        lw = lw_ref[k]  # (nlR, 128) lane word counts (flat over nl)
        start = _flat_prefix(lw, nlR, jnp.add, True)  # excl lane starts
        # one packed route: lane id << 18 | lane start, placed at each
        # lane's start position, forward-filled across the lane's words
        ids = _iota_flat(nlR)
        kept = lw > 0
        rank = _flat_prefix(kept.astype(jnp.int32), nlR, jnp.add, True)
        n_kept = jnp.sum(kept.astype(jnp.int32))
        packed = jnp.where(kept, (ids << 18) | start, 0)
        v, have = _route(packed, start, kept, rank, n_kept, nlR, SWR)
        hv = have.astype(jnp.int32)
        d = 1
        while d < Wb:
            sv = _flat_shift_right(v, d, SWR, 0)
            sh = _flat_shift_right(hv, d, SWR, 0)
            fill = (hv == 0) & (sh != 0)
            v = jnp.where(fill, sv, v)
            hv = hv | fill.astype(jnp.int32)
            d <<= 1
        i = _iota_flat(SWR)
        tt = (v >> 18) * Wb + (i - (v & ((1 << 18) - 1)))
        pltpu.make_async_copy(
            dense_ref.at[pl.ds(aoff_ref[g * _RG + k], SWR), :],
            scratch.at[k], sem.at[k]).wait()
        words, _ = _place_right(scratch[k], tt, wc_ref[g * _RG + k], SWR)
        out_ref[k] = words[:outR]


@functools.partial(jax.jit, static_argnames=("nl", "wb", "interpret"))
def repad_words(dense: jax.Array, aoff_rows: jax.Array, wc: jax.Array,
                lane_words: jax.Array, nl: int, wb: int,
                interpret: bool = False) -> jax.Array:
    """Wire payload -> the decoder's padded fixed-stride lane layout.

    dense: (Nrows, 128) u32 — per-chunk word streams each starting at a
    128-word-aligned row (aoff_rows (C,), in rows); wc (C,) word counts;
    lane_words (C, nl). Returns (C, nl * wb) u32 (padding slots carry
    garbage — consumers mask by lane_words / symbol counts, the same
    contract as models/chunked._repad_words). Requires (nl * wb) % 128
    == 0 and lane ids < 2^12, lane starts < 2^18 (checked)."""
    C = lane_words.shape[0]
    if (nl * wb) % 128:
        raise ValueError("nl * wb must divide by 128")
    if nl * wb > (1 << 18):
        raise ValueError("chunk stride exceeds the packed-route domain")
    outR = nl * wb // 128
    nlR = -(-nl // 128)
    # a chunk's dense words never exceed its stride; rounded up to the
    # sublane tile (8 rows) — an odd scratch/DMA row count (e.g. 153 at
    # the 144-word stride) faults the TPU worker (observed on v5e)
    SWR = max(-(-outR // 8) * 8, 8)
    Cp = -(-C // _RG) * _RG  # pad the chunk axis to the grid batch
    lw_pad = jnp.zeros((Cp, nlR * 128), jnp.int32)
    lw_pad = lw_pad.at[:C, :nl].set(lane_words.astype(jnp.int32))
    aoff_p = jnp.zeros((Cp,), jnp.int32).at[:C].set(
        aoff_rows.astype(jnp.int32))
    wc_p = jnp.zeros((Cp,), jnp.int32).at[:C].set(wc.astype(jnp.int32))
    out = pl.pallas_call(
        functools.partial(_repad_kernel, SWR=SWR, outR=outR, nlR=nlR,
                          Wb=wb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Cp // _RG,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # dense stays in HBM
                pl.BlockSpec((_RG, nlR, 128), lambda g, a, w: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((_RG, outR, 128),
                                   lambda g, a, w: (g, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((_RG, SWR, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((_RG,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Cp, outR, 128), jnp.int32),
        interpret=interpret,
    )(aoff_p, wc_p, dense.astype(jnp.int32), lw_pad.reshape(Cp, nlR, 128))
    return out[:C].reshape(C, nl * wb).astype(jnp.uint32)


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
    # widening outside the kernel keeps the slab at 8 rows
    kern, tiles = _hist_kernel, data.reshape(C, R, _LANES).astype(jnp.int32)
    acc = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # lengths ride in SMEM
            grid=(C,),
            in_specs=[pl.BlockSpec((1, R, _LANES), lambda c, lens: (c, 0, 0))],
            out_specs=pl.BlockSpec((1, 128, 128), lambda c, lens: (c, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((C, 128, 128), jnp.float32),
        interpret=interpret,
    )(lengths.astype(jnp.int32), tiles)
    # acc[c, 16 r + a, 16 r' + b]: the r-diagonal holds the real pairs,
    # cross-row terms are MXU by-products — drop them with one einsum
    h = jnp.einsum("crarb->cab", acc.reshape(C, 8, 16, 8, 16))
    return h.reshape(C, N_SYM).astype(jnp.int32)
