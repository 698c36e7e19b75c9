"""Adaptive block RLE as batched device ops.

Reference behavior (transform.cpp:25-134, 294-361; SURVEY.md §2.4): split the
W x H byte matrix into bs x bs tiles (clamped at the borders), RLE each tile
in row-major AND column-major scan order, keep the smaller (horizontal wins
ties -> dir bit 1, transform.cpp:114-123), and auto-search block sizes
8,16,...,1024 keeping a strictly smaller result (ties keep the smaller bs,
transform.cpp:319). Payload = [W u64 BE][H u64 BE][bs u64 BE][scanDir bits
MSB-first] ++ concatenated winning tile streams (headers.cpp:18-63).

TPU design: W, H and bs are static under jit, so every tile's geometry —
clamped extents, scan-order index maps — is a compile-time constant numpy
array. Tile gathering is one fancy-index gather; the 2 x n_tiles x n_sizes
candidate RLE passes (the reference's hot loop #3) collapse into vmapped
calls of the closed-form ``rle_encoded_size`` — exactly the fan-out SURVEY.md
§2.4 calls "embarrassingly parallel, ideal for vmap". Materialization scatters
winning tiles through one exclusive prefix-sum of their lengths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from huffman_codec_tpu.ops.rle import (
    rle_decode,
    rle_encode,
    rle_encoded_size,
    rle_max_encoded_len,
)

INIT_RLE_BLOCK_SIZE = 8  # transform.hpp:17
MAX_RLE_DOUBLING_STEPS = 7  # transform.hpp:18
ADAPT_HEADER_BYTES = 24  # 3 big-endian u64s (headers.cpp:27-37)


def candidate_sizes(width: int, height: int) -> list[int]:
    """The reference's search schedule (transform.cpp:309-325): 8 always
    (after the exit-12 minimum check), then doublings while <= min(W, H)."""
    if min(width, height) < INIT_RLE_BLOCK_SIZE:
        raise ValueError("too small 2D data dimensions")  # exit 12
    sizes, bs = [], INIT_RLE_BLOCK_SIZE
    for step in range(MAX_RLE_DOUBLING_STEPS + 1):
        if step > 0 and (bs > width or bs > height):
            break
        sizes.append(bs)
        bs *= 2
    return sizes


@functools.lru_cache(maxsize=64)
def _tile_maps(width: int, height: int, bs: int):
    """Static per-tile scan-order index maps.

    Returns (hor_idx, ver_idx) int32[n_tiles, bs*bs] flat matrix indices
    (position j of tile t in the given scan order; positions past the tile's
    clamped sx*sy point at the tile base and are masked by valid_len), plus
    valid_len int32[n_tiles]. Mirrors getBlockBase / getBlockSizeX/Y /
    getBlockVector (transform.cpp:25-94) including partial border tiles.
    """
    bpl = -(-width // bs)
    bpc = -(-height // bs)
    nt = bpl * bpc
    cap = bs * bs
    hor = np.zeros((nt, cap), np.int32)
    ver = np.zeros((nt, cap), np.int32)
    lens = np.zeros((nt,), np.int32)
    j = np.arange(cap)
    for t in range(nt):
        bx = (t % bpl) * bs
        by = (t // bpl) * bs
        sx = min(bs, width - bx)
        sy = min(bs, height - by)
        lens[t] = sx * sy
        yh, xh = j // sx, j % sx  # row-major
        xv, yv = j // sy, j % sy  # column-major (transform.cpp:79-91)
        h = (by + yh) * width + bx + xh
        v = (by + yv) * width + bx + xv
        valid = j < sx * sy
        base = by * width + bx
        hor[t] = np.where(valid, h, base)
        ver[t] = np.where(valid, v, base)
    return hor, ver, lens


def _tiles_fast(flat: jax.Array, width: int, height: int, bs: int):
    """Gather-free tile streams for the aligned case (bs divides both
    dims): scan-order reordering is a pure reshape/transpose — an
    HBM-bandwidth copy on TPU instead of a ~10 ns/element gather.

    hor tile t=(by,bx) position j=(y*bs+x): axes (by, bx, y, x);
    ver position j=(x*bs+y) (transform.cpp:79-91): axes (by, bx, x, y).
    Tile order (by, bx) row-major matches getBlockBase
    (transform.cpp:25-40)."""
    m = flat.reshape(height // bs, bs, width // bs, bs)
    hor = m.transpose(0, 2, 1, 3).reshape(-1, bs * bs)
    ver = m.transpose(0, 2, 3, 1).reshape(-1, bs * bs)
    return hor, ver


def _gather_tiles(flat: jax.Array, width: int, height: int, bs: int):
    if width % bs == 0 and height % bs == 0:
        hor, ver = _tiles_fast(flat, width, height, bs)
        return hor, ver, jnp.full((hor.shape[0],), bs * bs, jnp.int32)
    hor_idx, ver_idx, lens = _tile_maps(width, height, bs)
    return flat[jnp.asarray(hor_idx)], flat[jnp.asarray(ver_idx)], jnp.asarray(lens)


def _tile_sizes(flat: jax.Array, width: int, height: int, bs: int):
    """(hor_sizes, ver_sizes) int32[n_tiles] — encoded size of every tile in
    both scan orders, no materialization."""
    hor, ver, lens = _gather_tiles(flat, width, height, bs)
    size = jax.vmap(rle_encoded_size)
    return size(hor, lens), size(ver, lens), lens


@functools.partial(jax.jit, static_argnames=("width", "height"))
def adapt_search_sizes(matrix: jax.Array, width: int, height: int) -> jax.Array:
    """Total encoded size (header included) for every candidate block size.
    The caller picks ``argmin`` — first minimum == smaller bs, matching the
    strict `<` rule at transform.cpp:319."""
    flat = matrix.reshape(-1)
    totals = []
    for bs in candidate_sizes(width, height):
        h, v, _ = _tile_sizes(flat, width, height, bs)
        nt = h.shape[0]
        totals.append(
            ADAPT_HEADER_BYTES + (nt + 7) // 8 + jnp.sum(jnp.minimum(h, v))
        )
    return jnp.stack(totals)


GROUP_K = 64  # tiles per manifest group in grouped-manifest mode


def grouped_manifest(nt: int, bs: int, est_payload: int) -> bool:
    """Use the grouped manifest when per-tile lengths would cost more than
    ~1.5% of the estimated payload (huge tile counts at small bs — e.g.
    512x512 @ bs=8 = 4096 tiles = 8 KB of u16 lens on a 16 KB payload)."""
    per_tile = nt * tile_len_width(bs)
    return nt > GROUP_K and per_tile > max(64, est_payload // 64)


def _tile_geom_arrays(width: int, height: int, bs: int) -> np.ndarray:
    """Static per-tile output sizes sx*sy (border tiles clamped)."""
    bpl = -(-width // bs)
    bpc = -(-height // bs)
    t = np.arange(bpl * bpc)
    sx = np.minimum(bs, width - (t % bpl) * bs)
    sy = np.minimum(bs, height - (t // bpl) * bs)
    return (sx * sy).astype(np.int32)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "bs", "group_cap"))
def adapt_group_tile_lens(
    stream: jax.Array,
    group_offs: jax.Array,
    total: jax.Array,
    width: int,
    height: int,
    bs: int,
    group_cap: int,
) -> jax.Array:
    """Recover per-tile RLE lengths from a grouped manifest.

    ``group_offs`` (int32[n_groups]) are byte offsets of every GROUP_K-th
    tile in the concatenated tile stream; within a group the boundaries are
    rediscovered by walking the decoder FSM (transform.cpp:137-159) and
    cutting each time the running output count reaches the tile's known
    geometric size — groups run data-parallel, the serial walk is only
    ``group_cap`` bytes deep. Returns int32[n_groups * GROUP_K] lengths
    (zero-padded past n_tiles).
    """
    sizes_np = _tile_geom_arrays(width, height, bs)
    ng = group_offs.shape[0]
    npad = ng * GROUP_K
    sizes = jnp.zeros((npad,), jnp.int32).at[: sizes_np.shape[0]].set(
        jnp.asarray(sizes_np)).reshape(ng, GROUP_K)

    j = jnp.arange(group_cap, dtype=jnp.int32)[None, :]
    gidx = jnp.clip(group_offs[:, None] + j, 0,
                    max(0, stream.shape[0] - 1))
    seg = stream[gidx].astype(jnp.int32)  # (ng, group_cap)
    glen = (jnp.concatenate(
        [group_offs[1:], jnp.asarray(total, jnp.int32).reshape(1)])
        - group_offs)  # bytes per group (total = true tile-stream length)

    k = jnp.arange(GROUP_K, dtype=jnp.int32)

    def step(carry, b):
        # carry: (t_rel, produced, match, count) per group; b: (byte, pos)
        t_rel, produced, match, count = carry
        byte, pos = b
        active = pos < glen
        is_cnt = count == 3
        emit = jnp.where(is_cnt, byte, 1)
        new_match = jnp.where(is_cnt, match, byte)
        eq = (match == byte) & ~is_cnt
        new_count = jnp.where(is_cnt, 0, jnp.where(eq, count + 1, 1))
        produced2 = produced + emit
        # one-hot select, NOT a batched 1-element gather (scan-carried
        # gathers unroll per batch row in the TPU lowering — the round-1
        # compile bomb; see ops/canonical.py build_lengths)
        tsize = jnp.sum(
            jnp.where(k[None, :] == t_rel[:, None], sizes, 0), axis=1)
        done = produced2 >= tsize  # tile complete -> FSM reset
        t_rel2 = jnp.where(done, t_rel + 1, t_rel)
        produced2 = jnp.where(done, 0, produced2)
        new_match = jnp.where(done, -1, new_match)
        new_count = jnp.where(done, 0, new_count)
        out_t = jnp.where(active, t_rel, -1)
        t_rel = jnp.where(active, t_rel2, t_rel)
        produced = jnp.where(active, produced2, produced)
        match = jnp.where(active, new_match, match)
        count = jnp.where(active, new_count, count)
        return (t_rel, produced, match, count), out_t

    zero = jnp.zeros((ng,), jnp.int32)
    init = (zero, zero, zero - 1, zero)
    _, owner = jax.lax.scan(
        step, init, (seg.T, jnp.broadcast_to(
            jnp.arange(group_cap, dtype=jnp.int32)[:, None],
            (group_cap, ng))))
    # owner: (group_cap, ng) tile index per byte -> per-tile byte counts
    lens = jnp.sum(owner[:, :, None] == k[None, None, :], axis=0,
                   dtype=jnp.int32)  # (ng, GROUP_K)
    return lens.reshape(-1)


@functools.partial(jax.jit, static_argnames=("width", "height", "bs", "cap"))
def adapt_serial_tile_owner(stream: jax.Array, total: jax.Array,
                            width: int, height: int, bs: int,
                            cap: int) -> jax.Array:
    """v1-parity tile-boundary discovery: the reference's sequential
    block walk (transform.cpp:330-361) as ONE ``lax.scan`` over the tile
    stream — v1 payloads interleave tile boundaries with the data, so
    the walk is serial by the FORMAT's design; this keeps it on device
    (the round-3 build delegated this mode to the native runtime).

    Returns owner int32[cap]: the tile index each stream byte belongs
    to (-1 past ``total``). The caller turns it into per-tile lengths
    (one bincount) and decodes tiles in parallel (adapt_decode_tiled).
    Scalar-carry FSM: one dynamic tile-size lookup per step (a scalar
    dynamic-slice — NOT the batched scan-carried gather that bombs the
    TPU lowering; see adapt_group_tile_lens)."""
    sizes = jnp.asarray(_tile_geom_arrays(width, height, bs))
    data = stream[:cap].astype(jnp.int32)

    def step(carry, inp):
        t_rel, produced, match, count = carry
        byte, pos = inp
        active = pos < total
        is_cnt = count == 3
        emit = jnp.where(is_cnt, byte, 1)
        new_match = jnp.where(is_cnt, match, byte)
        eq = (match == byte) & ~is_cnt
        new_count = jnp.where(is_cnt, 0, jnp.where(eq, count + 1, 1))
        produced2 = produced + emit
        tsize = jax.lax.dynamic_index_in_dim(
            sizes, jnp.clip(t_rel, 0, sizes.shape[0] - 1), keepdims=False)
        done = produced2 >= tsize
        out_t = jnp.where(active, t_rel, -1)
        t_rel = jnp.where(active & done, t_rel + 1, t_rel)
        produced = jnp.where(active, jnp.where(done, 0, produced2),
                             produced)
        match = jnp.where(active, jnp.where(done, -1, new_match), match)
        count = jnp.where(active, jnp.where(done, 0, new_count), count)
        return (t_rel, produced, match, count), out_t

    z = jnp.int32(0)
    _, owner = jax.lax.scan(
        step, (z, z, z - 1, z),
        (data, jnp.arange(cap, dtype=jnp.int32)))
    return owner


def tile_len_width(bs: int) -> int:
    """Manifest bytes per tile length: a tile's RLE stream is at most
    rle_max_encoded_len(bs*bs) bytes, so u16 suffices through bs=181."""
    return 2 if rle_max_encoded_len(bs * bs) <= 0xFFFF else 4


def _emission_histogram(vals: jax.Array, n_invalid: jax.Array) -> jax.Array:
    """(256,) counts of the emitted bytes: ``vals`` is the flat emission
    array with non-emitting positions mapped to 0; the caller passes how
    many of those there are and bucket 0 is corrected afterwards — this
    keeps the histogram a dense fixed-shape op (Pallas on TPU) with no
    compaction pass at all."""
    from huffman_codec_tpu.ops.canonical import histogram

    L2 = 8192
    flat = vals.reshape(-1)
    pad = -flat.shape[0] % L2
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    rows = flat.reshape(-1, L2)
    counts = histogram(rows, jnp.full((rows.shape[0],), L2, jnp.int32))
    counts = jnp.sum(counts, axis=0)
    return counts.at[0].add(-(n_invalid + pad))


@functools.partial(jax.jit, static_argnames=("width", "height", "bs"))
def _adapt_score_v3(matrix: jax.Array, width: int, height: int,
                    bs: int) -> jax.Array:
    """Estimated final v3 container bytes for ONE candidate block size,
    with NO materialization: per-tile encoded sizes in both scan orders
    come from the closed-form emission formula (ops/rle._emissions), the
    entropy estimate from a masked histogram of the winning-direction
    emission values (identical, as a multiset, to the histogram of the
    materialized stream the round-3 search built — so the choice is
    unchanged, the 2x full RLE encodes + scatters per candidate are
    gone). Returns an int32 scalar ON DEVICE so the caller can dispatch
    every candidate asynchronously and sync once."""
    from huffman_codec_tpu.ops.canonical import build_lengths
    from huffman_codec_tpu.ops.rle import _emissions

    flat = matrix.reshape(-1)
    hor, ver, lens = _gather_tiles(flat, width, height, bs)
    nt = hor.shape[0]
    el_h, ec_h, cv_h = jax.vmap(_emissions)(hor, lens)
    el_v, ec_v, cv_v = jax.vmap(_emissions)(ver, lens)
    h_sz = jnp.sum(el_h.astype(jnp.int32) + ec_h.astype(jnp.int32), axis=1)
    v_sz = jnp.sum(el_v.astype(jnp.int32) + ec_v.astype(jnp.int32), axis=1)
    dirs = (h_sz <= v_sz)[:, None]  # horizontal wins ties
    vals = jnp.where(
        dirs,
        jnp.where(el_h, hor, jnp.where(ec_h, cv_h, 0)),
        jnp.where(el_v, ver, jnp.where(ec_v, cv_v, 0)),
    ).astype(jnp.uint8)
    emitted = jnp.sum(jnp.minimum(h_sz, v_sz))
    n_invalid = nt * hor.shape[1] - emitted
    counts = _emission_histogram(vals, n_invalid)
    bit_lens = build_lengths(counts[None, :])[0]
    est = jnp.sum(counts * bit_lens) // 8
    per_tile = jnp.where(
        (nt > GROUP_K)
        & (nt * tile_len_width(bs) > jnp.maximum(64, est // 64)),
        -(-nt // GROUP_K) * 4, nt * tile_len_width(bs))
    return (est + per_tile + (nt + 7) // 8).astype(jnp.int32)


def adapt_search_best_v3(matrix: jax.Array, width: int,
                         height: int) -> int:
    """v3 block-size search: minimize the ESTIMATED FINAL container bytes —
    entropy-coded payload + the v3 tile manifest — not the raw RLE size.

    The reference minimizes the pre-entropy stream (transform.cpp:309-325)
    because its FGK stage is streamed; v3's canonical stage compresses the
    candidates very differently (a small-tile stream is shorter but its
    4x-larger tile manifest can swamp the gain), so the search must price
    both. The v1 parity path keeps the reference objective.

    All candidate scores are dispatched before any is fetched — one
    device sync total (the round-trip latency dominates the device work
    on a tunneled chip). Dispatch happens from a thread per candidate:
    XLA compilation releases the GIL, so the 8 cold compiles overlap
    (measured 27 -> 10 s on the v5e); warm calls just pay ~ms of thread
    spawn before the same async dispatch wave."""
    cands = candidate_sizes(width, height)
    scores = _threaded_scores(matrix, width, height, cands)
    for s in scores:
        s.copy_to_host_async()
    vals = [int(s) for s in scores]
    return cands[int(np.argmin(vals))]  # first minimum == smaller bs


_WARM_SCORE_KEYS: set = set()


def _threaded_scores(matrix, width, height, cands):
    """Dispatch _adapt_score_v3 for every candidate — from one thread per
    candidate on the FIRST call for this geometry (cold compiles overlap;
    the jit cache is shared), and inline on warm calls (threaded dispatch
    costs extra tunnel round-trips once everything is compiled)."""
    key = (matrix.shape, matrix.dtype, width, height, tuple(cands))
    if key in _WARM_SCORE_KEYS:
        return [_adapt_score_v3(matrix, width, height, b) for b in cands]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(cands)) as ex:
        futs = [ex.submit(_adapt_score_v3, matrix, width, height, b)
                for b in cands]
        out = [f.result() for f in futs]
    _WARM_SCORE_KEYS.add(key)
    return out


def _be64(v: int) -> np.ndarray:
    return np.frombuffer(int(v).to_bytes(8, "big"), np.uint8)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "bs", "out_len",
                              "with_header"))
def adapt_encode_fixed(
    matrix: jax.Array, width: int, height: int, bs: int,
    out_len: int | None = None, with_header: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Materialize the adaptive payload for one block size.

    Returns (stream uint8[out_len], total_len, dirs bool[n_tiles],
    tile_lens int32[n_tiles]). With ``with_header`` (the default) the
    stream is bit-exact with the 4-arg applyAdaptRLE (transform.cpp:
    97-134) ++ createAdaptRLEHeader (headers.cpp:18-63); v3 callers pass
    False — the manifest replaces the in-band header, and the tile data
    starts at offset 0 (no O(n) strip afterwards).
    """
    flat = matrix.reshape(-1)
    hor, ver, lens = _gather_tiles(flat, width, height, bs)
    nt = hor.shape[0]
    cap = rle_max_encoded_len(bs * bs)
    enc = jax.vmap(lambda t, l: rle_encode(t, l, out_len=cap))
    hor_s, hor_n = enc(hor, lens)
    ver_s, ver_n = enc(ver, lens)
    dirs = hor_n <= ver_n  # horizontal wins ties (transform.cpp:114-123)
    tile_s = jnp.where(dirs[:, None], hor_s, ver_s)
    tile_n = jnp.minimum(hor_n, ver_n)

    n_dir_bytes = (nt + 7) // 8
    header_len = (ADAPT_HEADER_BYTES + n_dir_bytes) if with_header else 0
    if out_len is None:
        out_len = header_len + nt * cap
    total = header_len + jnp.sum(tile_n)

    # concatenate the winning tile streams with the monotone butterfly
    # (each kept byte's output offset IS its rank among kept bytes) —
    # XLA:TPU scatters run ~14 ns/index, the butterfly is pure VPU
    from huffman_codec_tpu.ops.compact import monotone_compact

    j = jnp.arange(cap, dtype=jnp.int32)[None, :]
    off = jnp.cumsum(tile_n) - tile_n
    kept = (j < tile_n[:, None]).reshape(-1)
    rank = (off[:, None] + j).reshape(-1)
    body = monotone_compact(tile_s.reshape(-1).astype(jnp.int32), rank,
                            kept, out_len - header_len).astype(jnp.uint8)
    if with_header:
        hdr = jnp.zeros((header_len,), jnp.uint8)
        hdr = hdr.at[:8].set(jnp.asarray(_be64(width)))
        hdr = hdr.at[8:16].set(jnp.asarray(_be64(height)))
        hdr = hdr.at[16:24].set(jnp.asarray(_be64(bs)))
        # scanDir bits MSB-first, 1 = horizontal, 0-pad (headers.cpp:41-60)
        dpad = jnp.zeros((n_dir_bytes * 8,), jnp.uint8).at[:nt].set(
            dirs.astype(jnp.uint8))
        dir_bytes = jnp.sum(
            dpad.reshape(n_dir_bytes, 8)
            * (jnp.uint8(1) << (7 - jnp.arange(8, dtype=jnp.uint8))),
            axis=1, dtype=jnp.uint8)
        hdr = hdr.at[ADAPT_HEADER_BYTES:header_len].set(dir_bytes)
        out = jnp.concatenate([hdr, body])
    else:
        out = body
    return out, total, dirs, tile_n


@functools.partial(jax.jit, static_argnames=("width", "height", "bs"))
def adapt_decode_tiled(
    stream: jax.Array,
    tile_lens: jax.Array,
    dirs: jax.Array,
    width: int,
    height: int,
    bs: int,
) -> jax.Array:
    """Parallel adaptive decode given the per-tile manifest (the v3 device
    container stores it; v1 streams lack it and decode via the native
    runtime's sequential block walk, transform.cpp:330-361).

    ``stream`` holds only the concatenated tile data (no header).
    Returns the reconstructed uint8[height*width] matrix (flat).
    """
    hor_idx, ver_idx, lens = _tile_maps(width, height, bs)
    cap = rle_max_encoded_len(bs * bs)
    off = jnp.cumsum(tile_lens) - tile_lens
    j = jnp.arange(cap, dtype=jnp.int32)[None, :]
    gidx = jnp.clip(off[:, None] + j, 0, max(0, stream.shape[0] - 1))
    tiles_enc = stream[gidx]
    tiles_enc = jnp.where(j < tile_lens[:, None], tiles_enc, 0)
    dec = jax.vmap(lambda t, l: rle_decode(t, l, out_len=bs * bs, block=64))
    tiles, _ = dec(tiles_enc, tile_lens)
    scatter_idx = jnp.where(dirs[:, None], jnp.asarray(hor_idx), jnp.asarray(ver_idx))
    valid = jnp.arange(bs * bs, dtype=jnp.int32)[None, :] < jnp.asarray(lens)[:, None]
    scatter_idx = jnp.where(valid, scatter_idx, width * height)
    out = jnp.zeros((width * height,), jnp.uint8)
    return out.at[scatter_idx.reshape(-1)].set(tiles.reshape(-1), mode="drop")
