"""Per-chunk two-pass canonical Huffman — the TPU-speed entropy stage.

Why this exists: the reference's FGK coder (huffman.cpp) interleaves a tree
mutation between every symbol, which no amount of batching can make faster
than O(tree) vector work per byte on a TPU (ops/fgk.py implements it exactly
for format parity, and measures in MB/s). The classic accelerator answer —
the GPU-Huffman literature's design (PAPERS.md) — is two-pass semi-static
coding per chunk: histogram, build an optimal prefix code, then encoding is
one table gather + prefix-sum bit packing per symbol: O(1) vector ops/byte,
memory-bound. The v3 container exposes it as its default entropy mode;
compression quality matches the adaptive coder closely because each chunk
gets its own optimal table (vs FGK's learning-lag), at 256 B/chunk overhead.

Everything is batched over the chunk dimension C:

- histogram: one scatter-add over (C, 256)
- Huffman code lengths: the two-queue merge as a 255-step ``lax.scan``
  (per-step O(1) gathers per chunk — NOT per symbol), then a reverse
  255-step depth propagation
- canonical assignment: length-histogram prefix sums + one argsort
- encode: gather code/len per symbol -> ops/pack.pack_codes
- decode: left-justified 32-bit window compare against per-length
  boundaries (first l with w < B[l]); lanes of symbols decode in parallel
  across (C x n_lanes) with a ``lax.scan`` over lane positions, enabled by
  per-lane bit offsets recorded in the container manifest

Code lengths are Fibonacci-bounded by the chunk size (< 32 bits for chunks
<= 3.5 M symbols), asserted statically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

N_SYM = 256
MAX_LEN = 31  # left-justified 32-bit window decode
BIG = jnp.int32(0x3FFFFFFF)


def _use_pallas() -> bool:
    """Pallas kernels on accelerators unless HCTPU_PALLAS=0 (escape hatch
    for platforms where Mosaic lowering is unavailable)."""
    import os

    return os.environ.get("HCTPU_PALLAS", "1") != "0"


# ---------------------------------------------------------------------------
# code construction
# ---------------------------------------------------------------------------


def rank_sort256(key: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(sorted, order) of (C, 256) int32 keys, stable ascending, with NO
    jnp.sort/argsort: a SINGLE (C, 256) sort instance costs ~13 minutes of
    XLA:TPU compile time on this backend (measured — the hidden round-1/2
    "bench killer" that the persistent compile cache was papering over),
    while compare-count ranking + one-hot placement are plain
    elementwise/reduce ops that compile in seconds. O(n^2) work per chunk
    is 3 x (C, 256, 256) fused compare-reduces — well under a millisecond
    of VPU time at C = 256."""
    C, n = key.shape
    i = jnp.arange(n, dtype=jnp.int32)
    a = key[:, :, None]  # key_i
    b = key[:, None, :]  # key_j
    before = (b < a) | ((b == a) & (i[None, None, :] < i[None, :, None]))
    rank = jnp.sum(before.astype(jnp.int32), axis=2)  # (C, n)
    oh = rank[:, :, None] == i[None, None, :]  # [rank_i == r]
    sorted_v = jnp.sum(jnp.where(oh, a, 0), axis=1)
    order = jnp.sum(jnp.where(oh, i[None, :, None], 0), axis=1)
    return sorted_v, order.astype(jnp.int32)


def histogram(data: jax.Array, lengths: jax.Array) -> jax.Array:
    """counts (C, 256) of the valid prefix of each chunk row.

    On TPU this dispatches to the Pallas kernel (ops/pallas_kernels.py):
    explicit VMEM blocking keeps the one-hot compare in-core, so HBM
    traffic is just the input bytes + 1 KB of counts per chunk. Fallback
    (CPU tests / non-blockable lengths): broadcast-compare + reduce, NOT
    scatter-add — XLA lowers scatters with colliding indices to a serial
    loop on TPU (measured ~300x slower), while the (C, L, 256) compare
    fuses into a vectorized reduction loop."""
    C, L = data.shape
    if jax.default_backend() != "cpu" and _use_pallas():
        from huffman_codec_tpu.ops.pallas_kernels import histogram256, pick_block

        if pick_block(L):
            return histogram256(data, lengths)
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = idx < lengths[:, None]
    sym = data.astype(jnp.int32)
    v = jnp.arange(N_SYM, dtype=jnp.int32)
    eq = (sym[:, :, None] == v[None, None, :]) & valid[:, :, None]
    return jnp.sum(eq, axis=1, dtype=jnp.int32)


def build_lengths_pm(counts: jax.Array) -> jax.Array:
    """EXACT optimal prefix-code lengths per chunk (C, 256), length-limited
    to MAX_LEN, via vectorized package-merge — scan-free: 30 fixed merge
    rounds and a 31-step backward boundary walk. Compile depth is O(1) in
    both C and the input size (the property that matters on TPU — see
    build_lengths_exact's docstring for why a 255-step scan is not an
    option), and for MAX_LEN = 31 >= the Fibonacci depth bound of any
    chunk <= 3.5 M symbols the result equals the unrestricted Huffman
    cost exactly (huffman.cpp's tree quality, the reference bar).

    Package-merge (coin collector): level L holds the sorted leaves; each
    round pairs adjacent items into packages and merges them with the
    leaves one level up. At the top, the first 2(n-1) items are selected;
    a leaf's code length = the number of levels at which it is selected.
    Only the per-level boundary (how many leaves are selected) is needed:
    selected items always form a PREFIX of each level's sorted list, so
    the backward walk is one masked popcount per level — no per-item
    bookkeeping, no (C, 512, 256) membership tensors.

    The per-round merge of the (sorted) leaves with the (sorted) pairwise
    packages is NOT a jnp.sort, and the 30 rounds are NOT unrolled — both
    variants send XLA:TPU's compiler pathological (measured >14 min; the
    same failure mode as the long scans is triggered by graph SIZE here).
    Both inputs are already sorted, so each element's merged position is
    its own index plus a broadcast compare-count against the other list,
    placement is the monotone butterfly (ops/compact.butterfly_place),
    and the 30 identical rounds ride ONE ``lax.scan`` body — the 30-step
    pure-elementwise scan is the regime this backend compiles in seconds
    (see build_lengths_exact's docstring for the measurements).

    Tie rule (leaf before package at equal weight) only shapes the tree,
    never the total cost. Absent symbols and list padding ride as
    BIG-weight items that sort past every selectable prefix.
    """
    C = counts.shape[0]
    n = jnp.sum(counts > 0, axis=1).astype(jnp.int32)  # present symbols
    key = jnp.where(counts > 0, counts.astype(jnp.int32), BIG)
    leaves, order = rank_sort256(key)  # (C, 256) ascending, absent -> BIG
    # packed item: weight << 1 | is_package (leaf wins ties; leaf and
    # package keys are never equal, so every cross-compare is strict)
    leaf_items = leaves << 1
    pad = jnp.full((C, N_SYM), (BIG << 1) | 1, jnp.int32)
    lst0 = jnp.concatenate([leaf_items, pad], axis=1)  # level MAX_LEN, sorted

    i2 = jnp.arange(2 * N_SYM, dtype=jnp.int32)[None, :]

    def merge_round(lst, _):
        w = lst >> 1
        pk_items = (jnp.minimum(w[:, 0::2] + w[:, 1::2], BIG) << 1) | 1
        # merge two sorted (C, 256) lists into (C, 512): leaves ascending
        # ++ packages reversed is a bitonic sequence, so a 9-round bitonic
        # merge (fixed-stride compare-exchanges, pure roll/min/max on
        # (C, 512)) sorts it — ~15x fewer element-ops than the
        # compare-count + butterfly-place merge this replaces (2 full
        # (C, 256, 256) compare-reduces per round). Equal packed items are
        # interchangeable (leaf-vs-package ties split by the LSB), so the
        # merge's instability cannot change the result.
        x = jnp.concatenate([leaf_items, pk_items[:, ::-1]], axis=1)
        d = N_SYM
        while d >= 1:
            lo = (i2 & d) == 0
            xp = jnp.where(lo, jnp.roll(x, -d, axis=1),
                           jnp.roll(x, d, axis=1))
            x = jnp.where(lo, jnp.minimum(x, xp), jnp.maximum(x, xp))
            d >>= 1
        return x, x & 1

    _, isp_scan = jax.lax.scan(merge_round, lst0, None, length=MAX_LEN - 1)
    # ispkg[lev]: lev 0 = level MAX_LEN (the leaves), .., MAX_LEN-1 = level 1
    ispkg = jnp.concatenate([(lst0 & 1)[None], isp_scan], axis=0)

    pos2 = jnp.arange(2 * N_SYM, dtype=jnp.int32)[None, :]
    rank = jnp.arange(N_SYM, dtype=jnp.int32)[None, :]
    lens_sorted = jnp.zeros((C, N_SYM), jnp.int32)
    m = jnp.maximum(2 * (n - 1), 0)  # items selected at level 1
    for lev in range(MAX_LEN - 1, -1, -1):  # level 1 up to level MAX_LEN
        p = jnp.sum(ispkg[lev] * (pos2 < m[:, None]), axis=1)
        nleaf = m - p  # leaves selected at this level = leaf ranks [0, nleaf)
        lens_sorted += (rank < nleaf[:, None]).astype(jnp.int32)
        m = 2 * p
    # single-symbol chunk: decoder needs a 1-bit code (same convention as
    # build_lengths_exact)
    lens_sorted = jnp.where((n[:, None] == 1) & (rank == 0), 1, lens_sorted)
    # un-sort via a one-hot select (order is a permutation): the batched
    # .at[cvec, order].set scatter this replaces ran ~14 ns/index on TPU
    oh = order[:, :, None] == jnp.arange(N_SYM, dtype=jnp.int32)[None, None, :]
    return jnp.sum(oh.astype(jnp.int32) * lens_sorted[:, :, None], axis=1)


def build_lengths_kraft(counts: jax.Array) -> jax.Array:
    """Near-optimal prefix-code lengths per chunk (C, 256) with NO scan —
    O(1) compile depth, pure (C, 256)-shaped vector ops.

    Why not exact Huffman on device: ``build_lengths_exact``'s two-queue
    merge is a 255-step ``lax.scan`` whose body XLA:TPU takes minutes to
    compile (measured >9.5 min at C=2 AND C=256 on v5e — the round-1/2
    bench killer), while a 33-step scan compiles in ~1 s; the pass blowup
    is specific to the long scan-carried select chains. The fix is
    algorithmic: integer Shannon lengths + greedy Kraft-slack promotion.

    1. l0_i = ceil(log2(total / c_i)) via a broadcast compare against the
       32 thresholds ceil(total / 2^l) — exact in int32, no floats.
       Kraft holds by construction (sum 2^-l0 <= sum c/total = 1).
    2. Two promotion passes: symbols in descending-count order are
       shortened by one bit while the Kraft slack lasts (prefix-sum of
       promotion costs vs slack — one cumsum per pass). The largest-coin-
       first fill is a feasibility greedy, NOT benefit-aware: on
       near-uniform counts it can land up to ~11% over optimal (measured
       on 4 near-equal counts), which is why ``build_lengths_pm`` is the
       production builder — this stays as a cheap approximate fallback.

    Exactness is NOT required for correctness: the v3 wire stores the
    lengths, and decode rebuilds the same canonical code either way.
    """
    C = counts.shape[0]
    c64 = counts.astype(jnp.uint32)
    total = jnp.sum(c64, axis=1, keepdims=True)  # (C, 1) < 2^22 (3.5M-symbol chunk bound)
    present = counts > 0
    lvec = jnp.arange(32, dtype=jnp.uint32)[None, :]  # (1, 32)
    # thr[l] = ceil(total / 2^l); c >= thr[l]  <=>  c * 2^l >= total
    thr = (total + (jnp.uint32(1) << lvec) - 1) >> lvec  # (C, 32)
    ok = c64[:, :, None] >= thr[:, None, :]  # (C, 256, 32), monotone in l
    l0 = 32 - jnp.sum(ok.astype(jnp.int32), axis=2)  # first ok l
    lens = jnp.where(present, jnp.clip(l0, 1, MAX_LEN), 0)

    # promotion passes: spend Kraft slack on the most frequent symbols.
    # Work in units of 2^-31: capacity 2^31 fits uint32; each present
    # symbol contributes 1 << (31 - l). Promotion coins are powers of two,
    # so filling the binary slack level-by-level (largest coin first,
    # taking at most ``slack >> (31-l)`` coins per level) is the exact
    # binary-budget greedy; within a level the most frequent symbols win.
    # The key shape fact: in count-descending order the ceil() levels are
    # MONOTONE nondecreasing (and promotions of a per-level rank prefix
    # preserve that), so per-level ranks come from one 32-wide cumsum,
    # never a 256-wide sort per pass.
    _, order = rank_sort256(-counts.astype(jnp.int32))  # count desc
    cvec = jnp.arange(C, dtype=jnp.int32)[:, None]
    pos = jnp.arange(N_SYM, dtype=jnp.int32)[None, :]
    l_all = jnp.arange(32, dtype=jnp.int32)[None, :]  # (1, 32)
    l_s = jnp.take_along_axis(lens, order, 1)
    p_s = jnp.take_along_axis(present, order, 1)
    for _ in range(2):
        used = jnp.sum(jnp.where(
            p_s, jnp.uint32(1) << (31 - l_s).astype(jnp.uint32), 0), axis=1)
        slack = (jnp.uint32(1) << 31) - used  # (C,)
        k_l = jnp.sum((l_s[:, :, None] == l_all[:, None, :]) & p_s[..., None],
                      axis=1).astype(jnp.int32)  # (C, 32) symbols per level
        start = jnp.cumsum(k_l, axis=1) - k_l  # first rank of each level
        # biggest coins first: level 2 costs 2^29, ... level 31 costs 1
        take = [jnp.zeros_like(slack, jnp.int32), jnp.zeros_like(slack, jnp.int32)]
        for l in range(2, 32):
            shift = jnp.uint32(31 - l)
            t = jnp.minimum(k_l[:, l].astype(jnp.uint32), slack >> shift)
            slack = slack - (t << shift)
            take.append(t.astype(jnp.int32))
        take = jnp.stack(take, axis=1)  # (C, 32)
        rank = pos - jnp.take_along_axis(start, l_s, 1)
        promote = p_s & (l_s > 1) & (rank < jnp.take_along_axis(take, l_s, 1))
        l_s = jnp.where(promote, l_s - 1, l_s)
    return jnp.zeros_like(lens).at[cvec, order].set(l_s)


def build_lengths_exact(counts: jax.Array) -> jax.Array:
    """Optimal prefix-code lengths per chunk (C, 256) via the two-queue
    Huffman merge, vectorized over chunks; 255 scan steps total.

    NOTE: kept as the CPU/test oracle for ``build_lengths_kraft`` — the
    255-step scan body sends XLA:TPU's optimizer pathological (minutes of
    compile time), so the production encode uses the scan-free builder.

    TPU-shaped: the scan body contains NO per-row gathers or scatters —
    batched 1-element gather/scatter ops get unrolled per batch row by the
    TPU lowering, which made compile time scale with the chunk count C
    (the round-1 bench hang). Every indexed access is expressed as a
    one-hot select over the 256-wide state rows instead: dense (C, 256)
    elementwise work the vector unit eats, constant compile time."""
    C = counts.shape[0]
    n_sym = jnp.sum(counts > 0, axis=1).astype(jnp.int32)  # (C,)

    # ascending by (count, symbol) — stable argsort gives the symbol
    # tie-break; zero-count symbols pushed to the end
    key = jnp.where(counts > 0, counts, BIG)
    order = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    leaf_w = jnp.take_along_axis(jnp.where(counts > 0, counts, BIG), order, 1)

    iota = jnp.arange(N_SYM, dtype=jnp.int32)[None, :]  # (1, 256)
    iw0 = jnp.full((C, N_SYM), BIG, jnp.int32)  # internal weights
    # parent[i] (merge-step index of the parent) per node, one row of 256
    # for leaves (sorted order) and one for internals (creation order)
    lp0 = jnp.zeros((C, N_SYM), jnp.int32)
    ip0 = jnp.zeros((C, N_SYM), jnp.int32)

    def pick(li, ri, iw):
        # queue-front reads as one-hot reductions (no gather): exhausted
        # leaf queue (li == 256) naturally selects nothing -> BIG
        lw = jnp.sum(jnp.where(iota == li[:, None], leaf_w, 0), axis=1)
        lw = jnp.where(li >= n_sym, BIG, lw)
        rw = jnp.sum(jnp.where(iota == ri[:, None], iw, 0), axis=1)
        rw = jnp.where(ri >= N_SYM, BIG, rw)
        take_leaf = lw <= rw  # leaf wins ties -> lower depth variance
        val = jnp.where(take_leaf, lw, rw)
        return (jnp.where(take_leaf, li + 1, li),
                jnp.where(take_leaf, ri, ri + 1)), val, take_leaf

    def merge(carry, t):
        li, ri, iw, lpar, ipar = carry
        active = t < n_sym - 1
        (li2, ri2), aval, aleaf = pick(li, ri, iw)
        (li3, ri3), bval, bleaf = pick(li2, ri2, iw)
        new_w = jnp.where(active, aval + bval, BIG)
        # iw[:, t] = new_w — as a one-hot select, NOT dynamic_update_slice:
        # mixing a dynamic-indexed read of a scan carry with a DUS write of
        # the same carry sends XLA:TPU copy analysis pathological (measured
        # 228 s vs 0.5 s compile for the same loop on v5e)
        iw = jnp.where(iota == t, new_w[:, None], iw)
        # parent assignment via one-hot masked select: node a is leaf li
        # (if aleaf) else internal ri; each node gets a parent exactly once
        amask_l = active & aleaf
        bmask_l = active & bleaf
        lhit = ((iota == jnp.where(amask_l, li, -1)[:, None])
                | (iota == jnp.where(bmask_l, li2, -1)[:, None]))
        ihit = ((iota == jnp.where(active & ~aleaf, ri, -1)[:, None])
                | (iota == jnp.where(active & ~bleaf, ri2, -1)[:, None]))
        lpar = jnp.where(lhit, t, lpar)
        ipar = jnp.where(ihit, t, ipar)
        return (li3, ri3, iw, lpar, ipar), None

    zero = jnp.zeros((C,), jnp.int32)
    (li, ri, iw, lpar, ipar), _ = jax.lax.scan(
        merge, (zero, zero, iw0, lp0, ip0),
        jnp.arange(N_SYM - 1, dtype=jnp.int32),
    )

    # depth propagation: internal t's depth = depth of its parent merge + 1;
    # the root (t == n_sym-2) stays 0. Reverse creation order; one-hot
    # reads AND writes (same carry-aliasing rule as the merge above).
    def dprop(depth, t):
        p = jnp.sum(jnp.where(iota == t, ipar, 0), axis=1)
        dp = jnp.sum(jnp.where(iota == p[:, None], depth, 0), axis=1)
        d = jnp.where(t == n_sym - 2, 0, dp + 1)
        d = jnp.where(t < n_sym - 1, d, 0)
        return jnp.where(iota == t, d[:, None], depth), None

    depth, _ = jax.lax.scan(
        dprop, jnp.zeros((C, N_SYM), jnp.int32),
        jnp.arange(N_SYM - 2, -1, -1, dtype=jnp.int32),
    )

    # leaf_depth[rank] = depth[lpar[rank]] + 1 — a batched 256-from-256
    # gather OUTSIDE any scan (single op, compiles fine)
    leaf_depth = jnp.take_along_axis(depth, lpar, axis=1) + 1
    rank = jnp.broadcast_to(iota, (C, N_SYM))
    present = rank < n_sym[:, None]
    leaf_depth = jnp.where(present, leaf_depth, 0)
    # single-symbol chunk: give it a 1-bit code (decoder needs a length)
    leaf_depth = jnp.where((n_sym[:, None] == 1) & (rank == 0), 1, leaf_depth)

    lens = jnp.zeros((C, N_SYM), jnp.int32)
    cvec = jnp.arange(C, dtype=jnp.int32)
    lens = lens.at[cvec[:, None], order].set(leaf_depth)
    return lens


# production alias: exact package-merge — optimal cost (huffman.cpp parity)
# with O(1) compile depth on TPU. build_lengths_exact stays as the scalar-
# shaped test oracle; build_lengths_kraft as the cheap approximate fallback.
build_lengths = build_lengths_pm


def _canon_ranks(lens: jax.Array):
    """Per-symbol canonical ranks with NO sort, scatter, or gather.

    The canonical order is ascending (length, symbol) with absent symbols
    (len 0) last — the length domain is tiny (33 classes), so each
    symbol's rank is its class's start position plus a within-class
    prefix count, all (C, 256, 33)-shaped dense ops (the rank_sort256
    formulation this replaces burned 3 (C, 256, 256) compare-reduces, and
    the old bl_count scatter-add lowered to ~14 ns/index on TPU).

    Returns (first_code (C, 33), start_index (C, 33), cls_oh
    (C, 256, 33) bool one-hot of each symbol's class, rank (C, 256))."""
    C = lens.shape[0]
    cls = jnp.where(lens > 0, lens, MAX_LEN + 1)  # (C, 256) in [1, 32]
    lv = jnp.arange(MAX_LEN + 2, dtype=jnp.int32)[None, None, :]
    cls_oh = cls[:, :, None] == lv  # (C, 256, 33)
    bl_count = jnp.sum(cls_oh, axis=1, dtype=jnp.int32)  # (C, 33)

    def fc_step(code, l):
        code = (code + bl_count[:, l - 1]) << 1
        return code, code

    _, fc = jax.lax.scan(
        fc_step, jnp.zeros((C,), jnp.int32),
        jnp.arange(1, MAX_LEN + 2, dtype=jnp.int32),
    )
    first_code = jnp.concatenate(
        [jnp.zeros((1, C), jnp.int32), fc], 0).T  # (C, 33), index by l
    start_index = jnp.concatenate(
        [jnp.zeros((C, 1), jnp.int32), jnp.cumsum(bl_count[:, :-1], axis=1)],
        axis=1)  # (C, 33): position of first symbol of class l
    ohi = cls_oh.astype(jnp.int32)
    within = jnp.sum(ohi * (jnp.cumsum(ohi, axis=1) - 1), axis=2)
    rank = jnp.sum(ohi * start_index[:, None, :], axis=2) + within
    return first_code, start_index, cls_oh, rank


def canonical_tables(lens: jax.Array):
    """(first_code (C,33), start_index (C,33), canon_syms (C,256)).

    Canonical order = ascending (length, symbol); codes assigned per
    RFC-1951 style: first_code[l] = (first_code[l-1]+bl_count[l-1]) << 1.
    """
    first_code, start_index, _, rank = _canon_ranks(lens)
    # canon_syms[r] = the symbol of rank r: ranks are a permutation, so
    # one (C, 256, 256) one-hot select inverts it without sort or scatter
    pos = jnp.arange(N_SYM, dtype=jnp.int32)
    oh = (rank[:, :, None] == pos[None, None, :]).astype(jnp.int32)
    canon_syms = jnp.sum(oh * pos[None, :, None], axis=1)
    return first_code, start_index, canon_syms


def assign_codes(lens: jax.Array) -> jax.Array:
    """codes (C, 256) u32, right-aligned, straight from the per-symbol
    canonical ranks: code(s) = first_code[l_s] + rank(s) -
    start_index[l_s] — symbol order throughout, so no canon_syms
    inversion, no gathers, no scatters."""
    first_code, start_index, cls_oh, rank = _canon_ranks(lens)
    ohi = cls_oh.astype(jnp.int32)
    fc_sel = jnp.sum(ohi * first_code[:, None, :], axis=2)
    si_sel = jnp.sum(ohi * start_index[:, None, :], axis=2)
    codes = jnp.where(lens > 0, fc_sel + rank - si_sel, 0)
    return codes.astype(jnp.uint32)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("lane",))
def canonical_encode_batch(data: jax.Array, lengths: jax.Array,
                           lane: int = 512):
    """Encode (C, L) chunks into word-aligned lane buffers.

    Returns (lane_buf (C, n_lanes, W) uint32, lane_words (C, n_lanes)
    int32, lens_tables (C, 256) uint8). Lane k of a chunk holds symbols
    [k*lane, (k+1)*lane) packed MSB-first into lane_words[k] u32 words
    (zero-padded to the word boundary — the v3 canonical wire layout);
    the host strips the inter-lane padding with one boolean mask.

    On accelerators the per-symbol table lookup + packing runs as the
    fused Pallas ``lane_pack`` kernel (MXU one-hot matmuls + butterfly
    placement); the XLA path (CPU tests) computes the identical layout
    via ``lane_pack_xla`` (gather + per-lane pack_codes).
    """
    C, L = data.shape
    if L % lane:
        raise ValueError("chunk length must divide by the lane size")
    counts = histogram(data, lengths)
    lens = build_lengths(counts)
    codes = assign_codes(lens)
    tables = codes | (lens.astype(jnp.uint32) << 26)

    from huffman_codec_tpu.ops.pallas_kernels import (
        _LB, lane_pack, lane_pack_xla)

    # the pack kernel's grid step is one 8-lane row and its table lookup
    # tiles the lane axis (_TL), so live VMEM is ~30 (8, lane) i32
    # intermediates: lane 16384 measures ~12 MB scoped, 32768 OOMs the
    # 16 MB limit — 16384 is the kernel ceiling (the whole-file profile)
    use_pl = (jax.default_backend() != "cpu" and _use_pallas()
              and lane % 128 == 0 and (L // lane) % _LB == 0
              and lane <= 16384)
    if use_pl:
        buf, bits = lane_pack(data, lengths, tables, lane)
    else:
        buf, bits = lane_pack_xla(data, lengths, tables, lane)
    lane_words = (bits + 31) >> 5
    return buf, lane_words, lens.astype(jnp.uint8)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("lane", "out_len", "max_len"))
def canonical_decode_batch(
    words: jax.Array,
    lens_tables: jax.Array,
    lane_words: jax.Array,
    lengths: jax.Array,
    lane: int = 512,
    out_len: int = 0,
    max_len: int = MAX_LEN,
):
    """Decode PADDED lane-word buffers back to (C, out_len) symbols.

    ``words`` is (C, n_lanes * Wl) with lane k's word-aligned bitstream at
    words [k*Wl, k*Wl + lane_words[k]) — the fixed-stride layout the host
    reconstructs from the wire with one boolean-mask scatter (memcpy
    speed). Fixed offsets keep every lane's reads independent; lane k
    holds symbols [k*lane, (k+1)*lane) of the chunk (clipped by the
    symbol count). ``lane_words`` is only consulted by the wire loader;
    decode itself needs no offsets manifest."""
    C, W = words.shape
    n_lanes = lane_words.shape[1]
    Wl = W // n_lanes
    if out_len <= 0:
        raise ValueError("canonical_decode_batch needs static out_len")
    # Two kernel layouts. Time-major (lane_decode): output (lane, G, nl)
    # with nl minor — nl pads to 128 vector lanes, so VMEM ~ 4 KB x
    # (lane + Wl) regardless of nl; needs lane <= ~4096. Lane-major
    # (lane_decode_lanemajor): output (G, nl, lane) with the symbol axis
    # minor — VMEM ~ 32 x roundup(nl, 8) x (lane + Wl); the fat-lane
    # whole-file profile (nl <= 16, lane up to 16384) rides this one
    # after models/chunked.py re-batches its lanes across the chunk axis.
    on_tpu = jax.default_backend() != "cpu" and _use_pallas()
    if on_tpu and lane % 128 == 0 and lane > 4096 and n_lanes <= 16:
        from huffman_codec_tpu.ops.pallas_kernels import (
            lane_decode_lanemajor)

        out = lane_decode_lanemajor(
            words.reshape(C, n_lanes, Wl), lens_tables, lengths,
            lane=lane, max_len=max_len)
        return out[:, :out_len]
    if on_tpu and lane % 8 == 0 and lane <= 4096:
        from huffman_codec_tpu.ops.pallas_kernels import lane_decode

        out = lane_decode(words.reshape(C, n_lanes, Wl), lens_tables,
                          lengths, lane=lane, max_len=max_len)
        return out[:, :out_len]
    lens = lens_tables.astype(jnp.int32)
    first_code, start_index, canon_syms = canonical_tables(lens)

    # per-length exclusive upper boundary: a codeword of length l satisfies
    # (w >> (32-l)) < first_code[l] + bl_count[l], and for every shorter l'
    # the prefix value is >= that boundary — so the code length is the FIRST
    # l whose boundary test passes (empty lengths have boundary == their
    # predecessor's and can never be first). Comparing in code space (not
    # left-justified-window space) avoids 32-bit shift overflow entirely.
    lvec = jnp.arange(1, MAX_LEN + 1, dtype=jnp.int32)[None, :]  # (1, 31)
    bl_count = jnp.diff(start_index, axis=1)  # (C, 32): counts per length l=0..31
    bound = first_code[:, 1 : MAX_LEN + 1] + bl_count[:, 1 : MAX_LEN + 1]

    off0 = jnp.broadcast_to(
        (jnp.arange(n_lanes, dtype=jnp.uint32) * Wl * 32)[None, :],
        (C, n_lanes))  # fixed-stride padded layout
    lane_syms = jnp.clip(
        lengths[:, None] - jnp.arange(n_lanes, dtype=jnp.int32)[None, :] * lane,
        0, lane,
    )

    cvec = jnp.arange(C, dtype=jnp.int32)[:, None]  # (C, 1)

    def read32(pos):
        """32-bit window at absolute bit position pos (C, n_lanes)."""
        i = (pos >> 5).astype(jnp.int32)
        r = (pos & 31).astype(jnp.uint32)
        w0 = words[cvec, jnp.clip(i, 0, W - 1)]
        w1 = words[cvec, jnp.clip(i + 1, 0, W - 1)]
        lo = jnp.where(r == 0, jnp.uint32(0), w1 >> (32 - r))
        return jnp.where(r == 0, w0, (w0 << r) | lo)

    # table rows broadcast once; per step the (C, n_lanes, 31) masks reduce
    # them without gathers (TPU per-element gathers are the decode
    # bottleneck — only the canon_syms lookup keeps one gather per symbol)
    fc_b = first_code[:, None, 1 : MAX_LEN + 1]  # (C, 1, 31)
    si_b = start_index[:, None, 1 : MAX_LEN + 1]

    def step(pos, k):
        w = read32(pos)  # (C, n_lanes)
        v31 = (w[:, :, None] >> (32 - lvec)[None, :, :].astype(jnp.uint32))
        sel = v31.astype(jnp.int32) < bound[:, None, :]  # (C, n_lanes, 31)
        # first-true mask: sel is monotone in l once true stays true
        ft = sel & (jnp.cumsum(sel.astype(jnp.int32), axis=2) == 1)
        fti = ft.astype(jnp.int32)
        l = jnp.sum(fti * lvec[None, :, :], axis=2)  # code length
        base = jnp.sum(fti * (si_b - fc_b), axis=2)  # start - first_code
        v = jnp.sum(fti * v31.astype(jnp.int32), axis=2)
        idx = base + v
        sym = jnp.take_along_axis(
            canon_syms, jnp.clip(idx, 0, N_SYM - 1), 1)
        ok = k < lane_syms
        pos = jnp.where(ok, pos + l.astype(jnp.uint32), pos)
        return pos, jnp.where(ok, sym, 0).astype(jnp.uint8)

    _, out = jax.lax.scan(step, off0, jnp.arange(lane, dtype=jnp.int32))
    # out: (lane, C, n_lanes) -> (C, n_lanes, lane) -> (C, L)
    out = jnp.transpose(out, (1, 2, 0)).reshape(C, n_lanes * lane)
    return out[:, :out_len]
