"""TPUCodec — the flagship chunk-parallel device codec (v3 container).

Same capability surface as the reference pipeline (diff model, stream RLE /
adaptive block RLE, entropy coding; readme.md:31) but re-designed for the
TPU execution model instead of translating the serial C++ loop:

* every transform is a static-shaped, jittable array op (ops/);
* the post-transform symbol stream is cut into fixed chunks processed with
  ``vmap``/``shard_map`` data-parallelism on encode AND decode;
* everything variable-length lives in a manifest (per-chunk bit lengths,
  per-tile byte lengths, per-lane bit offsets) so decode needs no
  sequential discovery pass;
* two entropy modes per chunk:
  - ``canonical`` (default): two-pass canonical Huffman (ops/canonical.py)
    — O(1) vector ops per symbol, the TPU-speed path; per-chunk optimal
    tables replace FGK's adaptivity at 256 B/chunk overhead.
  - ``fgk``: the reference's exact FGK coder (ops/fgk.py), chunk-parallel —
    sequential per chunk by construction (huffman.cpp), kept for parity and
    for wire-compatibility experiments.

v3 wire layout (all little-endian; contrast v1's mixed LE/BE, SURVEY.md §2.6):

    magic "HCTPU\\x03" | version u8 | flags u8 (bit7 diff, bit6 adapt)
    entropy u8 (0 fgk, 1 canonical)
    orig_size u64 | transformed_size u64 | chunk_size u32 | n_chunks u32
    lane u32 | crc32 u32 (of the original data — integrity check on decode)
    [adapt only] W u64 | H u64 | bs u64 | n_tiles u32
                 scanDir bits (ceil(nt/8) bytes, MSB-first)
                 tile_lens u32 * n_tiles
    chunk_bits u32 * n_chunks (canonical: 32 * total lane words)
    [canonical only] code-length tables 5-bit packed (160 B) * n_chunks
                     lane_words u16 * (L/lane) * n_chunks
    payload: per-chunk bitstreams, concatenated; canonical lanes each
             start WORD-aligned (<= 31 pad bits per lane) so the entropy
             encode and decode are lane-local device kernels

Unlike v1/v2, the adaptive header is NOT embedded in the compressed payload:
the manifest replaces it, which is what makes tile decode parallel.
"""

from __future__ import annotations

import functools
import struct
import zlib
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from huffman_codec_tpu.formats import FLAG_ADAPT, FLAG_DIFF

FLAG_SHARDED = 0x20  # v3-only: transforms applied per input chunk
FLAG_AGROUP = 0x10  # v3-only: grouped adaptive tile manifest
from huffman_codec_tpu.ops.adapt import (
    GROUP_K,
    adapt_decode_tiled,
    adapt_encode_fixed,
    adapt_group_tile_lens,
    adapt_search_best_v3,
    candidate_sizes,
    grouped_manifest,
    rle_max_encoded_len,
    tile_len_width,
)
from huffman_codec_tpu.ops.canonical import (
    canonical_decode_batch,
    canonical_encode_batch,
)
from huffman_codec_tpu.ops.diff import diff_apply, diff_revert
from huffman_codec_tpu.ops.fgk import fgk_decode_batch, fgk_encode_batch, max_code_bits
from huffman_codec_tpu.ops.rle import rle_decode, rle_encode, rle_encoded_size

V3_MAGIC = b"HCTPU\x03"
ENTROPY_FGK = 0
ENTROPY_CANONICAL = 1
_ENTROPY = {"fgk": ENTROPY_FGK, "canonical": ENTROPY_CANONICAL}


@dataclass(frozen=True)
class CodecConfig:
    """Pipeline options — the reference CLI surface (main.cpp:152-221
    defaults: diff off, adapt off, width 512) plus chunking/entropy."""

    use_diff: bool = False
    use_adapt: bool = False
    width: int = 512
    chunk_size: int = 1 << 16
    entropy: str = "canonical"  # "canonical" | "fgk"
    lane: int = 512  # canonical decode parallel granularity
    layout: str = "global"  # "global" | "sharded" (per-chunk transforms)
    # global layout only: best-of-two — try a whole-file candidate (one
    # chunk, one table, lane 32768) against the chunked one and keep the
    # smaller container; the whole-file economics of the reference codec
    whole_file: bool = True
    # streaming grid: process the input step_chunks chunks at a time through
    # ONE fixed-shape compilation (sharded layout only). Compile cost becomes
    # input-size-independent — the TPU serving pattern — and the host loop
    # double-buffers: step k+1's device_put overlaps step k's compute via
    # JAX async dispatch. None = whole input in one step (compile per size).
    step_chunks: int | None = None

    def flags(self) -> int:
        return ((FLAG_DIFF if self.use_diff else 0)
                | (FLAG_ADAPT if self.use_adapt else 0)
                | (FLAG_SHARDED if self.layout == "sharded" else 0))


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _start_fetch(st: dict) -> None:
    """Begin async device->host transfers for every array in a dispatched
    candidate state — fetches then complete in one overlapped wave instead
    of one ~28 ms tunnel round-trip each. A dense payload is NOT fetched
    here: its real length is only known once the manifest lands, so the
    assembler fetches ``payload[:used]`` in a second wave."""
    for k, v in st.items():
        if k == "payload" and st.get("dense"):
            continue
        if isinstance(v, jax.Array):
            v.copy_to_host_async()


def _fetch_dense_payloads(outs):
    """For per-step canonical (lane_buf, lane_words) device pairs: strip
    each step's padding ON DEVICE, then fetch manifests (wave 1) and the
    used payload prefixes (wave 2, power-of-two buckets) — the padded
    buffers (4-8x the payload) never cross the tunnel. Returns
    (payload bytes, lane_words (C, n_lanes))."""
    d = [(_strip_payload(p, m.astype(jnp.int32)), m) for p, m in outs]
    for dd, m in d:
        m.copy_to_host_async()
    lws = [np.asarray(m) for _, m in d]
    sliced = []
    for (dd, _), lw in zip(d, lws):
        used = int(lw.sum())
        b = 1024
        while b < used:
            b <<= 1
        s = dd[: min(b, dd.shape[0])]
        s.copy_to_host_async()
        sliced.append((s, used))
    payload = b"".join(np.asarray(s)[:u].astype(">u4").tobytes()
                       for s, u in sliced)
    return payload, np.concatenate(lws)


def _presplice_payload(st: dict) -> None:
    """Second fetch wave: once the manifest (wave 1) lands, slice the
    dense payload to the used prefix — rounded up to a power of two so
    the slice's compiled shape repeats across inputs — and start its
    transfer. Callers run this for every candidate before assembling any,
    so the slices ride one overlapped wave."""
    if not st.get("dense"):
        return
    used = int(np.asarray(st["meta"]).sum())
    bucket = 1024
    while bucket < used:
        bucket <<= 1
    bucket = min(bucket, st["payload"].shape[0])
    st["payload"] = st["payload"][:bucket]
    st["payload"].copy_to_host_async()

def _np_words_to_bytes(words: np.ndarray, n_bytes: int) -> bytes:
    """Big-endian u32 word stream -> wire bytes (host-side, zero-copy-ish)."""
    return words.astype(">u4").tobytes()[:n_bytes]


def _packk(vals: np.ndarray, width: int) -> bytes:
    """Flat int array -> MSB-first ``width``-bit packed bytes."""
    v = np.asarray(vals).reshape(-1).astype(np.int64)
    bits = (v[:, None] >> np.arange(width - 1, -1, -1)) & 1
    return np.packbits(bits.reshape(-1).astype(np.uint8)).tobytes()


def _unpackk(raw: bytes, count: int, width: int) -> np.ndarray:
    nbytes = (count * width + 7) // 8
    bits = np.unpackbits(np.frombuffer(raw, np.uint8, nbytes))
    bits = bits[: count * width].reshape(count, width).astype(np.int64)
    return (bits << np.arange(width - 1, -1, -1)).sum(axis=1)


def _n_words_for(length: int, entropy: str, lane: int = 512) -> int:
    """Decode-side word buffer bound per chunk."""
    if entropy == "canonical":
        from huffman_codec_tpu.ops.pallas_kernels import lane_words_cap

        return (length // lane) * lane_words_cap(lane)
    return _cdiv(length * max_code_bits(length), 32) + 2


# ---------------------------------------------------------------------------
# jitted stages (static-shape specialized per (n, config))
# ---------------------------------------------------------------------------


@jax.jit
def _strip_payload(buf, lw):
    """(C, n_lanes, W) padded lane buffers -> dense payload words, on
    device (monotone butterfly): the host then fetches only the REAL
    payload prefix instead of the x4-8 padded buffer — on a tunneled
    chip the fetch is the adaptive-encode bottleneck."""
    from huffman_codec_tpu.ops.compact import monotone_compact

    C, nl, W = buf.shape
    col = jnp.arange(W, dtype=jnp.int32)
    kept = (col[None, None, :] < lw[:, :, None]).reshape(-1)
    ki = kept.astype(jnp.int32)
    rank = jnp.cumsum(ki) - ki
    return monotone_compact(buf.reshape(-1).astype(jnp.int32), rank, kept,
                            C * nl * W).astype(jnp.uint32)


def _chunkify(stream, total, chunk_size, max_chunks):
    chunks = stream.reshape(max_chunks, chunk_size)
    lens = jnp.clip(
        total - jnp.arange(max_chunks, dtype=jnp.int32) * chunk_size,
        0, chunk_size,
    )
    return chunks, lens


_SINGLE_MAX = 2 << 20  # re-batched single-chunk path VMEM bound (bytes)


def _entropy_encode(chunks, lens, entropy, lane):
    """Uniform 4-tuple: canonical -> (lane_buf (C, n_lanes, W), lane_words
    (C, n_lanes), tables, None); fgk -> (words, bits, None, None)."""
    if entropy == "canonical":
        buf, lw, tables = canonical_encode_batch(chunks, lens, lane=lane)
        return buf, lw, tables, None
    L = chunks.shape[1]
    words, bits = fgk_encode_batch(chunks, lens, _n_words_for(L, "fgk"))
    return words, bits, None, None


@functools.partial(
    jax.jit,
    static_argnames=("use_diff", "chunk_size", "max_chunks", "entropy", "lane"),
)
def _encode_stream_stage(data, use_diff: bool, chunk_size: int,
                         max_chunks: int, entropy: str, lane: int):
    """diff? -> stream RLE -> chunked entropy coding, all on device."""
    x = diff_apply(data) if use_diff else data
    stream, total = rle_encode(x, out_len=max_chunks * chunk_size)
    chunks, lens = _chunkify(stream, total, chunk_size, max_chunks)
    enc = _entropy_encode(chunks, lens, entropy, lane)
    return (*enc, total)


@functools.partial(
    jax.jit,
    static_argnames=("use_diff", "width", "height", "bs", "chunk_size",
                     "max_chunks", "entropy", "lane"),
)
def _encode_adapt_stage(data, use_diff: bool, width: int, height: int,
                        bs: int, chunk_size: int, max_chunks: int,
                        entropy: str, lane: int):
    """diff? -> adaptive block RLE (fixed bs) -> chunked entropy coding.

    The v3 transformed stream is the concatenated tile data only — the
    manifest replaces the in-band v1 adaptive header."""
    x = (jax.lax.optimization_barrier(diff_apply(data)) if use_diff
         else data)  # barrier: see _encode_sharded_adapt_stage
    stream, tile_total, dirs, tile_lens = adapt_encode_fixed(
        x, width, height, bs, out_len=max_chunks * chunk_size,
        with_header=False,
    )
    chunks, lens = _chunkify(stream, tile_total, chunk_size, max_chunks)
    enc = _entropy_encode(chunks, lens, entropy, lane)
    return (*enc, tile_total, dirs, tile_lens)


def _sharded_cap(chunk_size: int, entropy: str, lane: int) -> int:
    """Padded per-chunk RLE buffer length; canonical rounds to whole
    lane-blocks (8 lanes, the Pallas kernel's row granularity)."""
    cap = rle_max_encoded_len(chunk_size)
    blk = 8 * lane
    return -(-cap // blk) * blk if entropy == "canonical" else cap


@functools.partial(
    jax.jit,
    static_argnames=("use_diff", "chunk_size", "n_chunks", "entropy", "lane"),
)
def _encode_sharded_stage(data, length, carry0, use_diff: bool,
                          chunk_size: int, n_chunks: int, entropy: str,
                          lane: int):
    """Per-chunk diff (with carry) -> per-chunk RLE -> chunked entropy.

    The sharded layout of parallel/mesh.py as a serializable container:
    every chunk is decodable alone given its manifest row, so decode (and
    random access) parallelize exactly like encode. RLE streams restart at
    chunk boundaries; the diff model carries one byte per chunk (stored in
    the manifest for random access). ``carry0`` is the input byte preceding
    ``data`` (0 at stream start) — it makes this stage restartable, which is
    what lets the streaming codec push arbitrary-size inputs through one
    fixed-shape compilation. Returns the _entropy_encode 4-tuple plus
    (rle_lens, carries)."""
    chunks = data.reshape(n_chunks, chunk_size)
    in_lens = jnp.clip(
        length - jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size,
        0, chunk_size,
    )
    cap = _sharded_cap(chunk_size, entropy, lane)
    # interior chunks are always full, so [:, -1] is the carry byte; only
    # the (zero-length) chunks after a partial tail see garbage, and their
    # output is masked by in_lens == 0
    carries = jnp.concatenate(
        [jnp.asarray(carry0, jnp.uint8).reshape(1), chunks[:-1, -1]])
    from huffman_codec_tpu.ops.canonical import _use_pallas

    if (jax.default_backend() != "cpu" and _use_pallas()
            and chunk_size % 128 == 0 and cap % 128 == 0):
        # fused Pallas diff+RLE (the XLA formulation round-trips 2n-wide
        # arrays through HBM per butterfly stage — measured 38 ms/16.8 MB)
        from huffman_codec_tpu.ops.pallas_kernels import rle_diff_encode_fused

        rle_streams, rle_lens = rle_diff_encode_fused(
            chunks, in_lens, carries, use_diff, cap)
    else:
        if use_diff:
            prev = jnp.concatenate([carries[:, None], chunks[:, :-1]], axis=1)
            work = (chunks - prev).astype(jnp.uint8)
        else:
            work = chunks
        enc = jax.vmap(lambda x, l: rle_encode(x, l, out_len=cap))
        rle_streams, rle_lens = enc(work, in_lens)
    out = _entropy_encode(rle_streams, rle_lens, entropy, lane)
    return (*out, rle_lens, carries)


@functools.partial(
    jax.jit, static_argnames=("chunk_size", "cap", "use_diff")
)
def _decode_sharded_tail(chunks_rle, rle_lens, carries, chunk_size: int,
                         cap: int, use_diff: bool):
    """Per-chunk RLE decode + per-chunk diff revert seeded by the stored
    carry bytes — no global pass, so decode streams through the same
    fixed-shape compilation as encode. On TPU the expansion + diff run
    as one fused Pallas kernel (ops/pallas_kernels.rle_expand) over the
    XLA FSM classification; the XLA expansion's ~40 butterfly rounds
    each round-trip HBM and were the decode-tail bottleneck."""
    from huffman_codec_tpu.ops.canonical import _use_pallas
    from huffman_codec_tpu.ops.rle import rle_classify

    if (jax.default_backend() != "cpu" and _use_pallas()
            and cap % 128 == 0 and chunk_size % 128 == 0):
        from huffman_codec_tpu.ops.pallas_kernels import rle_expand

        ic = jax.vmap(lambda s, l: rle_classify(s, l))(chunks_rle, rle_lens)
        out = rle_expand(chunks_rle, ic, rle_lens, carries, chunk_size,
                         use_diff)
        return out.reshape(-1)
    dec = jax.vmap(lambda s, l: rle_decode(s, l, out_len=chunk_size)[0])
    out = dec(chunks_rle, rle_lens)
    if use_diff:
        out = jax.vmap(lambda y, cin: diff_revert(y, cin))(out, carries)
    return out.reshape(-1)


def _entropy_decode(words, counts, hdr, chunk_size):
    if hdr["entropy"] == ENTROPY_CANONICAL:
        max_len = hdr.get("max_len_bucket", 31)
        return canonical_decode_batch(
            jnp.asarray(words), jnp.asarray(hdr["tables"]),
            jnp.asarray(hdr["lane_words"]), counts,
            lane=hdr["lane"], out_len=chunk_size, max_len=max_len,
        )
    return fgk_decode_batch(jnp.asarray(words), counts, chunk_size)


@functools.partial(jax.jit, static_argnames=("n_lanes", "wb"))
def _repad_words(flat, lane_words, n_lanes: int, wb: int):
    """Contiguous payload words -> the decoder's padded fixed-stride
    layout, on device, ALL butterfly routing: the round-3 gather
    formulation paid ~14 ns per OUTPUT slot (235 ms per 16.8 MB decode
    step — the decode-throughput bottleneck); the spread form is ~17 ms.
    (1) spread (lane id, lane start) across the dense word axis, (2)
    route dense word i to slot lane(i) * wb + (i - start(i)). Padding
    slots receive neighbouring-lane garbage rather than zeros — every
    consumer masks by lane_words / symbol counts."""
    from huffman_codec_tpu.ops.compact import monotone_spread

    C, nl = lane_words.shape
    lw = lane_words.astype(jnp.int32).reshape(-1)
    off = jnp.cumsum(lw) - lw
    total = jnp.sum(lw)
    Nw = flat.shape[0]
    kept_l = lw > 0
    ids = jnp.arange(C * nl, dtype=jnp.int32)
    lid, _ = monotone_spread(ids, off, kept_l, Nw, max_gap=wb)
    loff, _ = monotone_spread(off, off, kept_l, Nw, max_gap=wb)
    i = jnp.arange(Nw, dtype=jnp.int32)
    tgt = lid * wb + (i - loff)
    valid = i < total
    out, _ = monotone_spread(flat.astype(jnp.int32), tgt, valid,
                             C * nl * wb, max_gap=wb)
    return out.astype(jnp.uint32).reshape(C, nl * wb)


@functools.partial(
    jax.jit,
    static_argnames=("use_diff", "width", "band_h", "bs", "cap", "entropy",
                     "lane"),
)
def _encode_sharded_adapt_stage(bands, carries, use_diff: bool,
                                width: int, band_h: int, bs: int, cap: int,
                                entropy: str, lane: int):
    """Sharded-ADAPTIVE encode: each chunk is a BAND of ``band_h`` full
    matrix rows, adaptively block-RLE'd on its own (same tile rules as
    the global transform, clamped at the band borders) and entropy-coded
    with its own table. Bands are fully independent given their diff
    carry byte, so the layout streams, restarts, and random-accesses
    exactly like the stream-mode sharded layout — the v3 answer to
    "adaptive at scale" (the reference's adaptive path is whole-matrix
    only, transform.cpp:294-361). ``bands`` is (nb, band_h * width); all
    bands here share the full height (the shorter tail band, if any, is
    a separate call). Returns the _entropy_encode 4-tuple plus
    (stream_lens, dirs (nb, nt), tile_lens (nb, nt))."""
    if use_diff:
        prev = jnp.concatenate([carries[:, None], bands[:, :-1]], axis=1)
        work = (bands - prev).astype(jnp.uint8)
        # materialize: without the barrier XLA re-fuses the diff into
        # every tile-transpose/emission consumer (measured 4x the cost
        # of the parts at 16 MB)
        work = jax.lax.optimization_barrier(work)
    else:
        work = bands
    from huffman_codec_tpu.ops.canonical import _use_pallas

    cs = band_h * width
    T = bs * bs
    if (jax.default_backend() != "cpu" and _use_pallas()
            and width % bs == 0 and band_h % bs == 0
            and T & (T - 1) == 0 and cs % 128 == 0 and cap % 128 == 0):
        # fused Pallas band path: tile-major reorder (two pure
        # reshape/transpose copies), closed-form per-tile sizes for the
        # scan-direction pick, then ONE per-tile-restart RLE kernel pass
        # over the winning order — the kernel's in-chunk prefix sums
        # concatenate the tile streams, so the vmapped XLA rle_encode
        # (2x per tile) + full-width butterfly concat this replaces
        # never run (they were the 163 MB/s bottleneck, BENCH_r04)
        from huffman_codec_tpu.ops.pallas_kernels import rle_diff_encode_fused

        nb = work.shape[0]
        m = work.reshape(nb, band_h // bs, bs, width // bs, bs)
        hor = m.transpose(0, 1, 3, 2, 4).reshape(nb, -1, T)
        ver = m.transpose(0, 1, 3, 4, 2).reshape(nb, -1, T)
        nt = hor.shape[1]
        size = jax.vmap(jax.vmap(
            lambda t: rle_encoded_size(t, jnp.int32(T))))
        h_sz, v_sz = size(hor), size(ver)
        dirs = h_sz <= v_sz  # horizontal wins ties (transform.cpp:114-123)
        tile_lens = jnp.minimum(h_sz, v_sz)
        win = jnp.where(dirs[:, :, None], hor, ver).reshape(nb, cs)
        streams, totals = rle_diff_encode_fused(
            win, jnp.full((nb,), cs, jnp.int32),
            jnp.zeros((nb,), jnp.uint8), False, cap, tile=T)
        totals = totals.astype(jnp.int32)
    else:
        enc = jax.vmap(lambda m: adapt_encode_fixed(
            m, width, band_h, bs, out_len=cap, with_header=False))
        streams, totals, dirs, tile_lens = enc(work)
        totals = totals.astype(jnp.int32)
    out = _entropy_encode(streams, totals, entropy, lane)
    return (*out, totals, dirs, tile_lens)


@functools.partial(
    jax.jit,
    static_argnames=("width", "band_h", "bs", "use_diff"),
)
def _decode_sharded_adapt_tail(streams, tile_lens, dirs, carries,
                               width: int, band_h: int, bs: int,
                               use_diff: bool):
    """Inverse of the band stage: per-band manifest-parallel tile decode
    + per-band diff revert seeded by the stored carries."""
    dec = jax.vmap(lambda s, tl, d: adapt_decode_tiled(
        s, tl, d, width, band_h, bs))
    out = dec(streams, tile_lens, dirs)
    if use_diff:
        out = jax.vmap(lambda y, cin: diff_revert(y, cin))(out, carries)
    return out.reshape(-1)


def _band_tiles(width: int, band_h: int, bs: int) -> int:
    """Tiles per band — the static manifest stride."""
    return _cdiv(width, bs) * _cdiv(band_h, bs)


@functools.partial(jax.jit, static_argnames=("out_len", "use_diff"))
def _decode_stream_tail(stream, total, out_len: int, use_diff: bool):
    out, n = rle_decode(stream, total, out_len=out_len)
    return (diff_revert(out) if use_diff else out), n


@functools.partial(
    jax.jit, static_argnames=("width", "height", "bs", "use_diff")
)
def _decode_adapt_tail(stream, tile_lens, dirs, width: int, height: int,
                       bs: int, use_diff: bool):
    flat = adapt_decode_tiled(stream, tile_lens, dirs, width, height, bs)
    return diff_revert(flat) if use_diff else flat


# ---------------------------------------------------------------------------
# the codec
# ---------------------------------------------------------------------------


class TPUCodec:
    """Chunk-parallel lossless codec; encode and decode run on device.

    Shapes are static per (input length, config): the first call compiles,
    repeats hit the XLA compilation cache — the standard TPU serving model.
    """

    def __init__(self, config: CodecConfig | None = None):
        self.config = config or CodecConfig()
        if self.config.entropy not in _ENTROPY:
            raise ValueError(f"unknown entropy mode {self.config.entropy}")
        if self.config.entropy == "canonical":
            if self.config.chunk_size % self.config.lane:
                raise ValueError("chunk_size must divide by lane")
            if self.config.lane > 1 << 15:
                raise ValueError("lane > 32768 overflows the packed "
                                 "lane-words manifest width")
        if self.config.layout not in ("global", "sharded"):
            raise ValueError(f"unknown layout {self.config.layout}")
        if self.config.layout == "sharded" and self.config.use_adapt:
            # adaptive chunks are BANDS of full matrix rows
            if self.config.chunk_size % self.config.width:
                raise ValueError("sharded adaptive needs chunk_size "
                                 "divisible by the matrix width")
            if self.config.chunk_size // self.config.width < 8:
                raise ValueError("sharded adaptive needs bands of >= 8 "
                                 "rows (chunk_size / width)")

    # -- encode -------------------------------------------------------------

    def encode_chunk_range(self, data: np.ndarray | bytes, c0: int, c1: int):
        """Encode chunks [c0, c1) of the input (sharded layout only) through
        the fixed-grid device stage. This is both the streaming-encode step
        and the elastic-recovery re-dispatch unit (SURVEY.md §5): a failed
        host's chunk range can be re-encoded anywhere — the stage is
        restartable via the carry byte — and its manifest columns spliced
        in. Chunks past the input are zero-padded (their in_lens mask to 0).
        Returns the _entropy_encode 4-tuple plus (rle_lens, carries) for
        the range, as device arrays, without blocking."""
        cfg = self.config
        if cfg.layout != "sharded":
            raise ValueError("encode_chunk_range requires the sharded layout")
        cs = cfg.chunk_size
        arr = (np.frombuffer(data, np.uint8)
               if isinstance(data, (bytes, bytearray)) else data)
        n = len(arr)
        S = c1 - c0
        lo, hi = c0 * cs, min(n, c1 * cs)
        if hi - lo == S * cs:
            step_np = arr[lo:hi]
        else:
            step_np = np.zeros(S * cs, np.uint8)
            step_np[: max(0, hi - lo)] = arr[lo:hi]
        carry0 = np.uint8(arr[lo - 1] if 0 < lo <= n else 0)
        return _encode_sharded_stage(
            jax.device_put(step_np), jnp.int32(max(0, hi - lo)), carry0,
            cfg.use_diff, cs, S, cfg.entropy, cfg.lane)

    def encode(self, data: bytes) -> bytes:
        cfg = self.config
        n = len(data)
        if cfg.use_adapt:
            if cfg.width <= 0:
                raise ValueError("invalid matrix width")  # exit 4
            if n % cfg.width:
                raise ValueError("invalid size of input 2D data")  # exit 6
        if n == 0:
            return self._container(b"", 0, 0, [], None, None, None,
                                   None, zlib.crc32(b""))
        cs = cfg.chunk_size
        sharded_meta = None
        if cfg.layout == "sharded" and cfg.use_adapt:
            return self._encode_sharded_adapt(data)
        if cfg.layout == "sharded":
            n_chunks = _cdiv(n, cs)
            arr = np.frombuffer(data, np.uint8)
            S = min(cfg.step_chunks or n_chunks, n_chunks)
            n_steps = _cdiv(n_chunks, S)
            # async dispatch: the device_put + stage for step k+1 queue
            # behind step k's compute -> host I/O overlaps device work
            outs = [self.encode_chunk_range(arr, k * S, (k + 1) * S)
                    for k in range(n_steps)]
            dense = cfg.entropy == "canonical"
            if dense:
                # padded lane buffers stay on device; fetch dense payload
                payload_a, meta_a = _fetch_dense_payloads(
                    [(o[0], o[1]) for o in outs])
                tables = np.concatenate([np.asarray(o[2]) for o in outs])
                rle_lens = np.concatenate([np.asarray(o[4]) for o in outs])
                carries = np.concatenate([np.asarray(o[5]) for o in outs])
            elif n_steps == 1:
                payload_a, meta_a, tables, _, rle_lens, carries = outs[0]
            else:
                cols = []
                for i in range(6):
                    vals = [o[i] for o in outs]
                    cols.append(None if vals[0] is None else np.concatenate(
                        [np.asarray(v) for v in vals]))
                payload_a, meta_a, tables, _, rle_lens, carries = cols
            rle_lens = np.asarray(rle_lens)[:n_chunks]
            carries = np.asarray(carries)[:n_chunks]
            total = int(rle_lens.sum())
            sharded_meta = (rle_lens, carries)
            adapt_meta = None
        else:
            # global layout: best-of-two container shapes. The whole-file
            # candidate (one chunk, one table, lane 32768) wins when the
            # per-chunk manifest dominates; the chunked candidate (per-
            # 64 KiB tables, lane 2048) wins when the input's statistics
            # drift and table adaptivity pays. Both are the same wire —
            # just different (chunk_size, lane) in the header — so the
            # encoder simply keeps the smaller. This is what beats the
            # reference's whole-file FGK sizes (BASELINE.md §B).
            bs = None
            if cfg.use_adapt:
                w, h = cfg.width, n // cfg.width
                # the search must see the POST-diff matrix — the reference
                # applies the diff model before the block-size search
                # (main.cpp:63 -> transform.cpp:294) — and v3 prices the
                # entropy stage + tile manifest, not the raw RLE size
                x0 = jnp.asarray(np.frombuffer(data, np.uint8))
                sx = diff_apply(x0) if cfg.use_diff else x0
                bs = adapt_search_best_v3(sx, w, h)
            if (cfg.whole_file and cfg.entropy == "canonical"
                    and rle_max_encoded_len(n) + 64 <= 3_500_000):
                # best-of-two: DISPATCH both candidates before fetching
                # either — the device work overlaps and the ~28 ms tunnel
                # round-trips collapse into one wave
                # one thread per candidate ON THE COLD CALL ONLY: the two
                # stage compiles overlap (XLA releases the GIL); once
                # compiled, threaded dispatch costs extra tunnel
                # round-trips, so warm calls dispatch inline
                key = (n, bs, cfg.chunk_size, cfg.lane, cfg.flags())
                if key in self._WARM_GLOBAL_KEYS:
                    st1 = self._dispatch_global(data, bs, whole=True)
                    st2 = self._dispatch_global(data, bs, whole=False)
                else:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(2) as ex:
                        f1 = ex.submit(self._dispatch_global, data, bs,
                                       True)
                        f2 = ex.submit(self._dispatch_global, data, bs,
                                       False)
                        st1, st2 = f1.result(), f2.result()
                    self._WARM_GLOBAL_KEYS.add(key)
                for st in (st1, st2):
                    _start_fetch(st)
                for st in (st1, st2):
                    _presplice_payload(st)
                return self._race_v1(data, min(
                    (self._assemble_global(data, st1),
                     self._assemble_global(data, st2)), key=len))
            st = self._dispatch_global(data, bs, whole=False)
            _start_fetch(st)
            _presplice_payload(st)
            return self._race_v1(data, self._assemble_global(data, st))
        return self._finish_container(cfg.entropy, payload_a, meta_a,
                                      tables, n_chunks, n, total,
                                      adapt_meta, sharded_meta, data,
                                      cfg.chunk_size, cfg.lane,
                                      dense=isinstance(payload_a, bytes))

    # v1-race gates: only small inputs (the FGK chain is per-symbol
    # serial) whose v3 container is small enough for fixed costs or
    # per-symbol adaptation to decide the winner (BASELINE.md §B)
    _V1_RACE_MAX_IN = 1 << 20
    _V1_RACE_MAX_OUT = 1 << 16
    # global-layout geometries whose best-of-two stages are compiled
    # (class-wide — the jit cache they guard is process-wide too)
    _WARM_GLOBAL_KEYS: set = set()

    def _race_v1(self, data: bytes, blob: bytes) -> bytes:
        """Best-of-N finalist: the v1 (reference wire format) profile.

        The v3 container's fixed costs (43-byte header + a packed code-
        length table + crc) and its static tables can lose to the
        reference's 9-byte header + per-symbol FGK adaptation on small or
        gradient-heavy payloads (huffman.cpp:95-128 — e.g. df1hvx `-m`).
        When the v3 winner is small enough that those costs matter, race
        the bit-exact v1 encoder (models/reference.py) and keep the
        smaller blob — decode() dispatches on the container magic, so the
        result is self-describing either way. Gated on input size too:
        the v1 FGK chain is serial per symbol and must not run on bulk
        streaming inputs."""
        if (len(data) > self._V1_RACE_MAX_IN
                or len(blob) > self._V1_RACE_MAX_OUT):
            return blob
        cfg = self.config
        try:
            # the native C++ runtime's bit-exact v1 encoder (~4 ms per
            # corpus file; byte-identical to the upstream binary —
            # tests/test_native_runtime); the device V1Codec is the
            # fallback when no toolchain built the library
            from huffman_codec_tpu.native import runtime

            v1 = runtime.v1_compress(data, cfg.use_diff, cfg.use_adapt,
                                     cfg.width)
        except Exception:  # noqa: BLE001 — the race must never break v3
            from huffman_codec_tpu.models.reference import V1Codec

            try:
                v1 = V1Codec(cfg).encode(data)
            except Exception:  # noqa: BLE001
                return blob
        return v1 if len(v1) < len(blob) else blob

    def _encode_sharded_adapt(self, data: bytes) -> bytes:
        """Sharded-ADAPTIVE encode: the input matrix is cut into bands of
        ``chunk_size / width`` full rows; each band is independently
        adaptive-block-RLE'd (one globally searched block size) and
        entropy-coded as its own chunk. Bands restart the RLE and carry
        one diff byte — so the container streams, splices, and
        random-accesses like the stream-mode sharded layout while keeping
        the adaptive transform (the reference's is whole-matrix only)."""
        cfg = self.config
        n = len(data)
        w = cfg.width
        n_rows = n // w
        cs = cfg.chunk_size
        band_h = cs // w
        if min(w, min(band_h, n_rows)) < 8:
            raise ValueError("too small 2D data dimensions")  # exit 12
        nb_full, h_tail = divmod(n_rows, band_h)
        arr = np.frombuffer(data, np.uint8)
        x = jnp.asarray(arr)
        sx = diff_apply(x) if cfg.use_diff else x
        # block-size search: candidates must fit a band; scored on the
        # full matrix (same emission/entropy economics, one async wave)
        from huffman_codec_tpu.ops.adapt import _threaded_scores

        cands = candidate_sizes(w, min(band_h, n_rows))
        scores = _threaded_scores(sx, w, n_rows, cands)
        for s in scores:
            s.copy_to_host_async()
        bs = cands[int(np.argmin([int(s) for s in scores]))]
        cap = _sharded_cap(cs, cfg.entropy, cfg.lane)
        outs = []
        if nb_full:
            bands = arr[: nb_full * cs].reshape(nb_full, cs)
            car = np.zeros((nb_full,), np.uint8)
            car[1:] = bands[:-1, -1]
            outs.append((_encode_sharded_adapt_stage(
                jnp.asarray(bands), jnp.asarray(car), cfg.use_diff, w,
                band_h, bs, cap, cfg.entropy, cfg.lane), car))
        if h_tail:
            tb = arr[nb_full * cs:][None, :]
            car = np.asarray([arr[nb_full * cs - 1] if nb_full else 0],
                             np.uint8)
            outs.append((_encode_sharded_adapt_stage(
                jnp.asarray(tb), jnp.asarray(car), cfg.use_diff, w,
                h_tail, bs, cap, cfg.entropy, cfg.lane), car))
        if cfg.entropy == "canonical":
            payload_a, meta_a = _fetch_dense_payloads(
                [(o[0][0], o[0][1]) for o in outs])
            tables = np.concatenate([np.asarray(o[0][2]) for o in outs])
        else:
            cols = []
            for i in range(3):
                vals = [np.asarray(o[0][i]) for o in outs
                        if o[0][i] is not None]
                cols.append(np.concatenate(vals) if vals else None)
            payload_a, meta_a, tables = cols
        rle_lens = np.concatenate([np.asarray(o[0][4]) for o in outs])
        dirs = np.concatenate(
            [np.asarray(o[0][5]).reshape(-1) for o in outs])
        tile_lens = np.concatenate(
            [np.asarray(o[0][6]).reshape(-1) for o in outs])
        carries = np.concatenate([o[1] for o in outs])
        n_chunks = nb_full + (1 if h_tail else 0)
        total = int(rle_lens.sum())
        adapt_meta = (w, n_rows, bs, dirs, tile_lens, False)
        sharded_meta = (rle_lens, carries)
        return self._finish_container(cfg.entropy, payload_a, meta_a,
                                      tables, n_chunks, n, total,
                                      adapt_meta, sharded_meta, data, cs,
                                      cfg.lane,
                                      dense=isinstance(payload_a, bytes))

    def _dispatch_global(self, data: bytes, bs, whole: bool) -> dict:
        """Dispatch one global-layout candidate's device stage WITHOUT any
        host sync. ``whole`` = single chunk at lane <= 2048 with >= 64
        lanes (one table, minimal manifest, lanes re-batched across the
        kernel chunk axis); else per-chunk tables at the archival lane
        (2048) or the user's configured lane."""
        cfg = self.config
        n = len(data)
        x = jnp.asarray(np.frombuffer(data, np.uint8))
        cap = rle_max_encoded_len(n) + 64
        if whole:
            # one chunk, ~8-16 fat lanes: smallest power-of-two lane
            # >= cap/8, clamped to 32768 — the minimal-manifest archival
            # geometry (every lane entry costs ~2.4 B of word padding +
            # manifest bits), exactly the r3 economics. Decode re-batches
            # the lanes across the kernel chunk axis and rides the
            # LANE-MAJOR Pallas decode kernel (r3 fell back to a 14 s XLA
            # scan here); the pack kernel's VMEM ceiling is 16384, so
            # 32768-lane encodes take the XLA pack path (~tens of ms on
            # these whole-file shapes — decode speed is what users feel)
            lane = min(1 << 15, max(64, 1 << ((cap + 7) // 8 - 1)
                                    .bit_length()))
            cs = -(-cap // (8 * lane)) * (8 * lane)
            cap = cs
        else:
            lane = (2048 if cfg.whole_file and cfg.entropy == "canonical"
                    and cfg.chunk_size % 2048 == 0 else cfg.lane)
            cs = cfg.chunk_size
        max_chunks = _cdiv(cap, cs)
        st = dict(cs=cs, lane=lane, bs=bs, n=n)
        if cfg.use_adapt:
            w, h = cfg.width, n // cfg.width
            (st["payload"], st["meta"], st["tables"], _, st["total"],
             st["dirs"], st["tile_lens"]) = _encode_adapt_stage(
                x, cfg.use_diff, w, h, bs, cs, max_chunks, cfg.entropy,
                lane)
            st["wh"] = (w, h)
        else:
            st["payload"], st["meta"], st["tables"], _, st["total"] = (
                _encode_stream_stage(x, cfg.use_diff, cs, max_chunks,
                                     cfg.entropy, lane))
        if cfg.entropy == "canonical":
            # dense payload on device; the padded buffer never crosses
            # the host<->device link (fetched as dense[:used] later)
            st["payload"] = _strip_payload(st["payload"], st["meta"])
            st["dense"] = True
        return st

    def _assemble_global(self, data: bytes, st: dict) -> bytes:
        """Fetch one dispatched candidate (transfers were started by
        ``_start_fetch``) and assemble its container."""
        cfg = self.config
        cs, lane = st["cs"], st["lane"]
        if cfg.use_adapt:
            tile_lens = np.asarray(st["tile_lens"])
            if cfg.entropy == "canonical":
                est_payload = 4 * int(np.asarray(st["meta"]).sum())
            else:
                est_payload = int(np.asarray(st["meta"]).sum()) // 8
            grouped = grouped_manifest(len(tile_lens), st["bs"],
                                       est_payload)
            adapt_meta = (*st["wh"], st["bs"], np.asarray(st["dirs"]),
                          tile_lens, grouped)
        else:
            adapt_meta = None
        total = int(st["total"])
        n_chunks = _cdiv(total, cs)
        return self._finish_container(cfg.entropy, st["payload"],
                                      st["meta"], st["tables"], n_chunks,
                                      st["n"], total, adapt_meta, None,
                                      data, cs, lane,
                                      dense=st.get("dense", False))

    def _encode_global(self, data: bytes, bs, whole: bool) -> bytes:
        st = self._dispatch_global(data, bs, whole)
        _start_fetch(st)
        return self._assemble_global(data, st)

    def _finish_container(self, entropy, payload_a, meta_a, tables,
                          n_chunks, orig, total, adapt_meta, sharded_meta,
                          data, chunk_size, lane, dense=False) -> bytes:
        if entropy == "canonical":
            lw = np.asarray(meta_a)[:n_chunks]
            chunk_bits = (lw.sum(axis=1, dtype=np.int64) * 32).tolist()
            lanes_np = lw
            if dense and isinstance(payload_a, (bytes, bytearray)):
                # already fetched via _fetch_dense_payloads
                streams = [bytes(payload_a)]
            elif dense:
                # payload_a is the device-side dense word stream, already
                # bucket-sliced by _presplice_payload with its transfer in
                # flight; trim to the exact used prefix on host
                used = int(lw.sum())
                streams = [np.asarray(payload_a)[:used].astype(
                    ">u4").tobytes()]
            else:
                # payload_a: (nc, n_lanes, W) word-aligned lane buffers;
                # meta_a: (nc, n_lanes) used words per lane. One boolean
                # mask strips the inter-lane padding (host memcpy speed).
                buf = np.asarray(payload_a)[:n_chunks]
                colw = np.arange(buf.shape[2] if n_chunks else 0)
                streams = [
                    buf[c].astype(">u4")[
                        colw[None, :] < lw[c][:, None]].tobytes()
                    for c in range(n_chunks)
                ]
        else:
            bits_np = np.asarray(meta_a)[:n_chunks]
            words_np = np.asarray(payload_a[:n_chunks])
            streams = []
            for c in range(n_chunks):
                nb = (int(bits_np[c]) + 7) // 8
                streams.append(_np_words_to_bytes(words_np[c], nb))
            chunk_bits = bits_np.tolist()
            lanes_np = None
        tables_np = (np.asarray(tables)[:n_chunks]
                     if tables is not None else None)
        return self._container(b"".join(streams), orig, total, chunk_bits,
                               adapt_meta, tables_np, lanes_np,
                               sharded_meta, zlib.crc32(data),
                               chunk_size=chunk_size, lane=lane)

    def _container(self, payload, orig, total, chunk_bits, adapt_meta,
                   tables, lane_words, sharded_meta, crc=0,
                   chunk_size=None, lane=None) -> bytes:
        cfg = self.config
        chunk_size = cfg.chunk_size if chunk_size is None else chunk_size
        lane = cfg.lane if lane is None else lane
        flags = cfg.flags()
        grouped = (cfg.use_adapt and adapt_meta is not None
                   and adapt_meta[5])
        if grouped:
            flags |= FLAG_AGROUP
        canonical = cfg.entropy == "canonical" and tables is not None
        out = bytearray()
        out += V3_MAGIC
        out.append(3)  # container version (3: per-container lane-words width)
        out.append(flags)
        out.append(_ENTROPY[cfg.entropy])
        # canonical code-length table bit width (0 for fgk)
        tw = 0
        if canonical and len(chunk_bits):
            tw = 4 if int(np.max(tables)) <= 15 else 5
        out.append(tw)
        # lane-words manifest bit width: the actual maximum for THIS
        # container, not the lane-implied worst case (_lw_width) — worth
        # 100-300 B on corpus-scale containers at one header byte
        kw = 0
        if canonical and len(chunk_bits):
            kw = max(1, int(np.asarray(lane_words).max()).bit_length())
        out.append(kw)
        out += struct.pack("<QQIIII", orig, total, chunk_size,
                           len(chunk_bits), lane, crc)
        if cfg.use_adapt and adapt_meta is not None:
            w, h, bs, dirs, tile_lens, grouped = adapt_meta
            nt = len(tile_lens)
            out += struct.pack("<QQQI", w, h, bs, nt)
            out += np.packbits(np.asarray(dirs, np.uint8)).tobytes()
            if grouped:
                # one u32 byte-offset per GROUP_K tiles; per-tile lengths
                # are rediscovered on device (ops/adapt.py
                # adapt_group_tile_lens) — 64x smaller manifest
                offs = np.concatenate(
                    [[0], np.cumsum(tile_lens.astype(np.int64))])
                out += offs[:nt:GROUP_K].astype("<u4").tobytes()
            else:
                # tile-length width is implied by bs (tile_len_width)
                out += np.asarray(tile_lens,
                                  f"<u{tile_len_width(bs)}").tobytes()
        if not canonical:
            out += np.asarray(chunk_bits, "<u4").tobytes()
        if sharded_meta is not None:
            rle_lens, carries = sharded_meta
            out += np.asarray(rle_lens, "<u4").tobytes()
            out += np.asarray(carries, np.uint8).tobytes()
        if canonical and len(chunk_bits):
            # v2 canonical manifest economies (the difference between
            # trailing and beating the reference's sizes): tables at
            # 4 or 5 bits/len; lane_words k-bit packed with only the USED
            # lanes stored (the used count per chunk is derivable from the
            # transformed size); chunk_bits omitted entirely — always
            # 32 * sum(lane_words) for word-aligned lanes.
            out += _packk(np.asarray(tables), tw)
            lw = np.asarray(lane_words)
            counts = self._chunk_counts(sharded_meta, total, chunk_size,
                                        len(chunk_bits))
            used = -(-counts // lane)
            mask = np.arange(lw.shape[1])[None, :] < used[:, None]
            # any nonzero word count beyond the derived used-lane prefix
            # would be silently dropped -> corrupt container; fail loudly
            assert (lw[~mask] == 0).all(), \
                "lane_words nonzero outside the used-lane mask"
            out += _packk(lw[mask], kw)
        out += payload
        return bytes(out)

    @staticmethod
    def _chunk_counts(sharded_meta, total, chunk_size, n_chunks):
        """Per-chunk symbol counts — the manifest-free invariant both the
        writer and the parser derive identically."""
        if sharded_meta is not None:
            return np.asarray(sharded_meta[0], np.int64)
        return np.clip(
            int(total) - np.arange(n_chunks, dtype=np.int64) * chunk_size,
            0, chunk_size)

    # -- decode -------------------------------------------------------------

    def _load_words(self, blob, hdr, c0=0, c1=None):
        """Payload byte streams -> padded u32 word matrix for chunks
        [c0, c1) (the manifest makes any chunk range addressable) —
        fully vectorized numpy (the round-2 per-chunk Python loop was the
        decode bottleneck: 256 iterations rebuilding 92 MB serially).

        canonical: each lane is re-padded to the BUCKETED stride
        ``hdr['wl_bucket']`` (smallest power of two covering the
        container's fattest lane, floor 8 for Mosaic sublane tiling) —
        typically 8x smaller than the worst-case ``lane_words_cap``
        stride, shrinking both the host->device transfer and the decode
        kernel's refill one-hot. fgk: chunk words are contiguous."""
        cs = hdr["chunk_size"]
        entropy = "canonical" if hdr["entropy"] == ENTROPY_CANONICAL else "fgk"
        L = (_sharded_cap(cs, entropy, hdr["lane"])
             if hdr["flags"] & FLAG_SHARDED else cs)
        c1 = hdr["n_chunks"] if c1 is None else c1
        C = c1 - c0
        offs = hdr["chunk_offs"]
        base = hdr["payload_off"] + int(offs[c0])
        nbytes = int(offs[c1] - offs[c0])
        if entropy == "canonical":
            lane = hdr["lane"]
            n_lanes = L // lane
            Wb = hdr["wl_bucket"]
            if C == 0 or nbytes == 0:
                return np.zeros((C, n_lanes * Wb), np.uint32)
            # canonical chunk streams are word-aligned (chunk_bits =
            # 32 * sum(lane_words)), so one big-endian u32 view + one
            # fancy-index gather rebuilds every lane row at once
            flat = np.frombuffer(blob, ">u4", nbytes // 4, base).astype(
                np.uint32)
            lw = hdr["lane_words"][c0:c1].astype(np.int64)  # (C, n_lanes)
            lane_off = np.concatenate(
                [[0], np.cumsum(lw.reshape(-1))])[:-1].reshape(C, n_lanes)
            col = np.arange(Wb, dtype=np.int64)
            idx = lane_off[:, :, None] + col[None, None, :]
            words = flat[np.minimum(idx, flat.size - 1)]
            words[col[None, None, :] >= lw[:, :, None]] = 0
            return words.reshape(C, n_lanes * Wb)
        wpc = _n_words_for(L, entropy, hdr["lane"])
        if C == 0 or nbytes == 0:
            return np.zeros((C, wpc), np.uint32)
        payload = np.frombuffer(blob, np.uint8, nbytes, base)
        chunk_nb = (offs[c0 + 1 : c1 + 1] - offs[c0:c1]).astype(np.int64)
        bidx = ((offs[c0:c1] - offs[c0])[:, None]
                + np.arange(4 * wpc, dtype=np.int64)[None, :])
        valid = np.arange(4 * wpc, dtype=np.int64)[None, :] < chunk_nb[:, None]
        b = payload[np.minimum(bidx, payload.size - 1)]
        b[~valid] = 0
        b = b.reshape(C, wpc, 4).astype(np.uint32)
        return (b[:, :, 0] << 24) | (b[:, :, 1] << 16) | (b[:, :, 2] << 8) \
            | b[:, :, 3]

    def _load_words_device(self, blob, hdr, c0, c1, rows):
        """Canonical word loader with the re-pad ON DEVICE: only the
        contiguous payload range (plus the tiny lane_words manifest)
        crosses the host->device link — ~4x less transfer than shipping
        the padded buffer — and the padded layout is built by the Pallas
        repad kernel on TPU (butterfly spreads on XLA elsewhere).
        ``rows`` >= c1-c0 zero-pads the chunk axis to the fixed grid."""
        cs = hdr["chunk_size"]
        L = (_sharded_cap(cs, "canonical", hdr["lane"])
             if hdr["flags"] & FLAG_SHARDED else cs)
        if self._use_pallas_repad(hdr):
            from huffman_codec_tpu.ops.pallas_kernels import repad_words

            d2, aoff, wc, lw = self._stage_words_aligned(blob, hdr, c0,
                                                         c1, rows)
            return repad_words(d2, aoff, wc, lw, L // hdr["lane"],
                               hdr["wl_bucket"])
        fd, lw = self._stage_words(blob, hdr, c0, c1, rows)
        return _repad_words(fd, lw, L // hdr["lane"], hdr["wl_bucket"])

    @staticmethod
    def _use_pallas_repad(hdr) -> bool:
        """Gate for the Pallas repad kernel (ops/pallas_kernels.repad_words)
        vs the XLA spread: shape/domain constraints + TPU backend."""
        from huffman_codec_tpu.ops.canonical import _use_pallas

        cs = hdr["chunk_size"]
        L = (_sharded_cap(cs, "canonical", hdr["lane"])
             if hdr["flags"] & FLAG_SHARDED else cs)
        nl = L // hdr["lane"]
        wb = hdr["wl_bucket"]
        # wb cap: the kernel's unrolled butterflies + fill rounds scale
        # with the stride, and Mosaic compile blows up on the few-fat-
        # lanes whole-file geometry (73 s at nl=16, wb=6592 on the v5e);
        # those containers are latency-bound anyway — the XLA spread
        # decodes them in ~ms and compiles in seconds
        return (jax.default_backend() != "cpu" and _use_pallas()
                and (nl * wb) % 128 == 0 and nl * wb <= (1 << 18)
                and nl <= 4096 and wb <= 2048)

    def _stage_words_aligned(self, blob, hdr, c0, c1, rows):
        """Aligned staging for the Pallas repad kernel: each chunk's
        dense word stream lands at a 128-word-aligned row of one (N, 128)
        buffer (the kernel DMAs per-chunk slices at dynamic row offsets).
        Alignment padding is < 512 B/chunk — the transfer stays ~dense.
        Returns (dense2d, aoff_rows, wc, lane_words) device arrays."""
        cs = hdr["chunk_size"]
        L = (_sharded_cap(cs, "canonical", hdr["lane"])
             if hdr["flags"] & FLAG_SHARDED else cs)
        n_lanes = L // hdr["lane"]
        Wb = hdr["wl_bucket"]
        offs = hdr["chunk_offs"]
        lw = np.zeros((rows, n_lanes), np.int32)
        lw[: c1 - c0] = hdr["lane_words"][c0:c1]
        wc = lw.sum(axis=1)
        rows_per = (wc + 127) // 128
        aoff = np.zeros(rows, np.int64)
        aoff[1:] = np.cumsum(rows_per)[:-1]
        # must cover the repad kernel's DMA span (SWR, rounded to the
        # 8-row sublane tile there)
        swr = max(8, -(-(n_lanes * Wb // 128) // 8) * 8)
        nb = 128
        while nb < int(aoff[-1] + rows_per[-1]) + swr:
            nb <<= 1
        dense = np.zeros(nb * 128, np.uint32)
        base = hdr["payload_off"]
        for k in range(c1 - c0):
            o0 = base + int(offs[c0 + k])
            nw = int(wc[k])
            if nw:
                dense[int(aoff[k]) * 128: int(aoff[k]) * 128 + nw] = (
                    np.frombuffer(blob, ">u4", nw, o0))
        return (jnp.asarray(dense.reshape(nb, 128)),
                jnp.asarray(aoff.astype(np.int32)), jnp.asarray(wc),
                jnp.asarray(lw))

    def _stage_words(self, blob, hdr, c0, c1, rows):
        """The transfer half of ``_load_words_device``: the contiguous
        payload slice as dense big-endian-decoded u32 words (padded to a
        power-of-two bucket so downstream shapes repeat across steps and
        containers) plus the padded lane_words slice, both shipped to
        device. NOTE on this rig: the payload is high-entropy, which the
        dev tunnel's compressed transport moves ~30x slower than raw
        corpus bytes — real PCIe does not care."""
        cs = hdr["chunk_size"]
        L = (_sharded_cap(cs, "canonical", hdr["lane"])
             if hdr["flags"] & FLAG_SHARDED else cs)
        n_lanes = L // hdr["lane"]
        offs = hdr["chunk_offs"]
        base = hdr["payload_off"] + int(offs[c0])
        nbytes = int(offs[c1] - offs[c0])
        lw = np.zeros((rows, n_lanes), np.int32)
        lw[: c1 - c0] = hdr["lane_words"][c0:c1]
        nb = 1024
        while nb < nbytes // 4:
            nb <<= 1
        fpad = np.zeros(nb, np.uint32)
        if nbytes:
            fpad[: nbytes // 4] = np.frombuffer(blob, ">u4", nbytes // 4,
                                                base)
        return jnp.asarray(fpad), jnp.asarray(lw)

    @staticmethod
    @functools.partial(
        jax.jit,
        static_argnames=("n_lanes", "wb", "cs", "cap", "use_diff", "lane",
                         "max_len"))
    def _decode_step_fused(dense2d, aoff, wc, lw, tables, lane_words, rl,
                           car, n_lanes: int, wb: int, cs: int, cap: int,
                           use_diff: bool, lane: int, max_len: int):
        """One fused device dispatch for a whole decode step: Pallas
        repad -> canonical entropy decode -> RLE expand + diff revert.
        The three separate jit dispatches this replaces each paid the
        dispatch round-trip, which at 4+ steps was ~1/3 of the streamed
        decode wall (606 vs 907 MB/s device-stage sum, BENCH_r04)."""
        from huffman_codec_tpu.ops.pallas_kernels import repad_words

        w = repad_words(dense2d, aoff, wc, lw, n_lanes, wb)
        chunks_rle = canonical_decode_batch(
            w, tables, lane_words, rl, lane=lane, out_len=cap,
            max_len=max_len)
        return _decode_sharded_tail(chunks_rle, rl, car, cs, cap, use_diff)

    def stage_decode_steps(self, blob: bytes, hdr: dict | None = None):
        """Parse + start the host->device transfers for every decode
        step WITHOUT dispatching any compute. Returns (hdr, staged):
        each staged entry holds the step's device arrays (dense payload
        words, manifest slices). Splitting staging from compute lets a
        server overlap the next batch's upload with this one's decode —
        and lets the bench time the device decode with inputs resident
        (symmetric with the encode metric)."""
        hdr = self._parse(blob) if hdr is None else hdr
        if not hdr["flags"] & FLAG_SHARDED:
            raise ValueError("decode_steps requires the sharded layout")
        n_chunks = hdr["n_chunks"]
        S = min(self.config.step_chunks or n_chunks, n_chunks)
        n_steps = _cdiv(n_chunks, S)
        staged = []
        for k in range(n_steps):
            c0, c1 = k * S, min(n_chunks, (k + 1) * S)
            st = {"c0": c0, "c1": c1}
            rl = hdr["rle_lens"][c0:c1].astype(np.int32)
            car = hdr["carries"][c0:c1]
            sub = dict(hdr)
            if hdr["entropy"] == ENTROPY_CANONICAL:
                if self._use_pallas_repad(hdr):
                    (st["dense2d"], st["aoff"], st["wc"],
                     st["lw"]) = self._stage_words_aligned(blob, hdr, c0,
                                                           c1, S)
                else:
                    st["flat"], st["lw"] = self._stage_words(blob, hdr,
                                                             c0, c1, S)
                sub["tables"] = hdr["tables"][c0:c1]
                sub["lane_words"] = hdr["lane_words"][c0:c1]
            else:
                st["words"] = self._load_words(blob, hdr, c0, c1)
            if c1 - c0 < S:  # zero-pad the tail step to the fixed grid
                pad = S - (c1 - c0)
                if hdr["entropy"] == ENTROPY_CANONICAL:
                    sub["tables"] = np.pad(sub["tables"], ((0, pad), (0, 0)))
                    sub["lane_words"] = np.pad(sub["lane_words"],
                                               ((0, pad), (0, 0)))
                else:
                    st["words"] = np.pad(st["words"], ((0, pad), (0, 0)))
                rl = np.pad(rl, (0, pad))
                car = np.pad(car, (0, pad))
            st["sub"] = sub
            st["rl"] = jnp.asarray(rl)
            st["car"] = jnp.asarray(car)
            if "dense2d" in st:
                # stage the manifest slices too, so the fused decode step
                # dispatches with zero implicit H2D uploads
                st["tabd"] = jnp.asarray(sub["tables"])
                st["lwm"] = jnp.asarray(sub["lane_words"])
            staged.append(st)
        return hdr, staged

    def run_decode_steps(self, hdr: dict, staged: list):
        """Dispatch the decode compute for pre-staged steps; returns the
        per-step DEVICE output arrays without fetching (async)."""
        cs = hdr["chunk_size"]
        use_diff = bool(hdr["flags"] & FLAG_DIFF)
        entropy = ("canonical" if hdr["entropy"] == ENTROPY_CANONICAL
                   else "fgk")
        cap = _sharded_cap(cs, entropy, hdr["lane"])
        L = cap if hdr["flags"] & FLAG_SHARDED else cs
        n_lanes = L // hdr["lane"]
        parts = []
        for st in staged:
            if "dense2d" in st:
                parts.append(self._decode_step_fused(
                    st["dense2d"], st["aoff"], st["wc"], st["lw"],
                    st["tabd"], st["lwm"], st["rl"], st["car"], n_lanes,
                    hdr["wl_bucket"], cs, cap, use_diff, hdr["lane"],
                    hdr["max_len_bucket"]))
                continue
            if "flat" in st:
                w = _repad_words(st["flat"], st["lw"], n_lanes,
                                 hdr["wl_bucket"])
            else:
                w = jnp.asarray(st["words"])
            chunks_rle = _entropy_decode(w, st["rl"], st["sub"], cap)
            parts.append(_decode_sharded_tail(
                chunks_rle, st["rl"], st["car"], cs, cap, use_diff))
        return parts

    def decode_steps(self, blob: bytes, hdr: dict | None = None):
        """Dispatch the sharded-layout decode and return the per-step
        DEVICE arrays without fetching — the streaming-serve primitive:
        H2D transfers, entropy decode and the RLE+diff tail all queue
        asynchronously; the caller decides when (and whether) the
        results cross back to the host."""
        hdr, staged = self.stage_decode_steps(blob, hdr)
        return self.run_decode_steps(hdr, staged)

    def decode(self, blob: bytes) -> bytes:
        if blob[:6] != V3_MAGIC:
            # self-describing dispatch: encode() may return a v1 blob
            # when the reference profile wins the size race (_race_v1),
            # and users hand us upstream-binary files directly
            from huffman_codec_tpu.formats import is_v2

            if is_v2(blob):
                from huffman_codec_tpu.native import runtime

                return runtime.v2_decompress(blob)
            try:  # native v1 decoder (bit-exact, ~ms); device fallback
                from huffman_codec_tpu.native import runtime

                return runtime.v1_decompress(blob)
            except Exception:  # noqa: BLE001 — no toolchain / bad lib
                from huffman_codec_tpu.models.reference import V1Codec

                return V1Codec(self.config).decode(blob)
        hdr = self._parse(blob)
        if hdr["orig"] == 0:
            return b""
        cs = hdr["chunk_size"]
        n_chunks = hdr["n_chunks"]
        use_diff = bool(hdr["flags"] & FLAG_DIFF)
        if hdr["flags"] & FLAG_SHARDED and hdr["flags"] & FLAG_ADAPT:
            flat = self._decode_adapt_bands(blob, hdr, 0, hdr["n_chunks"])
            out = flat[: hdr["orig"]]
        elif hdr["flags"] & FLAG_SHARDED:
            parts = self.decode_steps(blob, hdr)
            # overlapped device->host wave: start every part's transfer
            # before touching any (a serial np.asarray per part measures
            # ~26 MB/s on a tunneled chip vs ~45 MB/s overlapped)
            for p in parts:
                p.copy_to_host_async()
            flat = (np.asarray(parts[0]) if len(parts) == 1 else
                    np.concatenate([np.asarray(p) for p in parts]))
            out = flat[: hdr["orig"]]
        else:
            words = (self._load_words_device(blob, hdr, 0, n_chunks,
                                             n_chunks)
                     if hdr["entropy"] == ENTROPY_CANONICAL
                     else self._load_words(blob, hdr))
            n_lanes = cs // hdr["lane"]
            if (hdr["entropy"] == ENTROPY_CANONICAL and n_chunks == 1
                    and n_lanes % 8 == 0 and n_lanes >= 8
                    and cs <= _SINGLE_MAX):
                # whole-file container: decode the single chunk's lanes as
                # 8 pseudo-chunks sharing the one table — fills the Pallas
                # kernel's sublane batch and keeps its VMEM blocks ~cs/2
                sub = dict(hdr)
                sub["tables"] = np.tile(hdr["tables"], (8, 1))
                sub["lane_words"] = hdr["lane_words"].reshape(8, -1)
                scs = cs // 8
                counts = jnp.asarray(np.clip(
                    hdr["total"] - np.arange(8, dtype=np.int64) * scs,
                    0, scs).astype(np.int32))
                chunks = _entropy_decode(
                    words.reshape(8, -1), counts, sub, scs)
            else:
                counts = jnp.asarray(np.clip(
                    hdr["total"] - np.arange(n_chunks, dtype=np.int64) * cs,
                    0, cs).astype(np.int32))
                chunks = _entropy_decode(words, counts, hdr, cs)
            stream = chunks.reshape(-1)
            if hdr["flags"] & FLAG_ADAPT:
                nt = len(hdr["dirs"])
                if hdr["flags"] & FLAG_AGROUP:
                    group_cap = GROUP_K * rle_max_encoded_len(
                        hdr["bs"] * hdr["bs"])
                    tl = adapt_group_tile_lens(
                        stream,
                        jnp.asarray(hdr["group_offs"].astype(np.int32)),
                        jnp.int32(hdr["total"]), hdr["w"], hdr["h"],
                        hdr["bs"], group_cap)[:nt]
                else:
                    tl = jnp.asarray(hdr["tile_lens"].astype(np.int32))
                flat = _decode_adapt_tail(
                    stream, tl,
                    jnp.asarray(hdr["dirs"]), hdr["w"], hdr["h"], hdr["bs"],
                    use_diff,
                )
                out = np.asarray(flat)[: hdr["orig"]]
            else:
                dec, m = _decode_stream_tail(
                    stream, jnp.int32(hdr["total"]), hdr["orig"] + 8,
                    use_diff)
                if int(m) != hdr["orig"]:
                    raise ValueError("corrupt v3 container: size mismatch")
                out = np.asarray(dec)[: hdr["orig"]]
        result = out.tobytes()
        if zlib.crc32(result) != hdr["crc"]:
            raise ValueError("v3 container integrity check failed (crc32)")
        return result

    def _decode_adapt_bands(self, blob: bytes, hdr: dict, c0: int,
                            c1: int) -> np.ndarray:
        """Decode bands [c0, c1) of a sharded-adaptive container: entropy
        decode the covering chunks, manifest-parallel tile decode per
        band, per-band diff revert — no band outside the range is
        touched (the adaptive random-access primitive)."""
        cs = hdr["chunk_size"]
        w, bs = hdr["w"], hdr["bs"]
        band_h = cs // w
        n_rows = hdr["h"]
        nb_full, h_tail = divmod(n_rows, band_h)
        use_diff = bool(hdr["flags"] & FLAG_DIFF)
        entropy = ("canonical" if hdr["entropy"] == ENTROPY_CANONICAL
                   else "fgk")
        cap = _sharded_cap(cs, entropy, hdr["lane"])
        nt_full = _band_tiles(w, band_h, bs)
        dirs, tl = hdr["dirs"], hdr["tile_lens"].astype(np.int32)
        parts = []
        for (b0, b1, bh, nt, toff) in self._band_groups(
                c0, c1, nb_full, h_tail, nt_full, w, bs, band_h):
            words = self._load_words_device(blob, hdr, b0, b1, b1 - b0)
            sub = dict(hdr)
            if hdr["entropy"] == ENTROPY_CANONICAL:
                sub["tables"] = hdr["tables"][b0:b1]
                sub["lane_words"] = hdr["lane_words"][b0:b1]
            else:
                words = jnp.asarray(self._load_words(blob, hdr, b0, b1))
            rl = jnp.asarray(hdr["rle_lens"][b0:b1].astype(np.int32))
            streams = _entropy_decode(words, rl, sub, cap)
            d = dirs[toff: toff + (b1 - b0) * nt].reshape(b1 - b0, nt)
            t = tl[toff: toff + (b1 - b0) * nt].reshape(b1 - b0, nt)
            parts.append(_decode_sharded_adapt_tail(
                streams, jnp.asarray(t), jnp.asarray(d),
                jnp.asarray(hdr["carries"][b0:b1]), w, bh, bs, use_diff))
        for p in parts:
            p.copy_to_host_async()
        return np.concatenate([np.asarray(p) for p in parts])

    @staticmethod
    def _band_groups(c0, c1, nb_full, h_tail, nt_full, w, bs, band_h):
        """Split a band range into (start, end, band rows, tiles/band,
        flat tile offset) groups of identical geometry (full bands, then
        the shorter tail band)."""
        groups = []
        f1 = min(c1, nb_full)
        if c0 < f1:
            groups.append((c0, f1, band_h, nt_full, c0 * nt_full))
        if h_tail and c1 > nb_full:
            nt_tail = _band_tiles(w, h_tail, bs)
            groups.append((nb_full, nb_full + 1, h_tail, nt_tail,
                           nb_full * nt_full))
        return groups

    def decode_range(self, blob: bytes, start: int, length: int) -> bytes:
        """Random-access decode of ``[start, start+length)`` — sharded
        layout only: touches just the covering chunks (entropy + RLE per
        chunk; the stored per-chunk diff carry seeds the local revert).
        This is the checkpoint/resume primitive for multi-GB corpora
        (SURVEY.md §5): any byte range is recoverable without a full pass."""
        hdr = self._parse(blob)
        if not hdr["flags"] & FLAG_SHARDED:
            raise ValueError("decode_range requires the sharded layout")
        if start < 0 or length < 0 or start + length > hdr["orig"]:
            raise ValueError("range out of bounds")
        if length == 0:
            return b""
        cs = hdr["chunk_size"]
        c0, c1 = start // cs, (start + length - 1) // cs + 1
        if hdr["flags"] & FLAG_ADAPT:
            flat = self._decode_adapt_bands(blob, hdr, c0, c1)
            lo = start - c0 * cs
            return flat[lo: lo + length].tobytes()
        words = self._load_words(blob, hdr, c0, c1)
        sub = dict(hdr)
        if hdr["entropy"] == ENTROPY_CANONICAL:
            sub["tables"] = hdr["tables"][c0:c1]
            sub["lane_words"] = hdr["lane_words"][c0:c1]
        entropy = "canonical" if hdr["entropy"] == ENTROPY_CANONICAL else "fgk"
        cap = _sharded_cap(cs, entropy, hdr["lane"])
        rle_lens = jnp.asarray(hdr["rle_lens"][c0:c1].astype(np.int32))
        chunks_rle = _entropy_decode(words, rle_lens, sub, cap)
        dec = jax.vmap(lambda s, l: rle_decode(s, l, out_len=cs)[0])
        chunks = dec(chunks_rle, rle_lens)
        if hdr["flags"] & FLAG_DIFF:
            carries = jnp.asarray(hdr["carries"][c0:c1])
            rev = jax.vmap(lambda y, cin: diff_revert(y, cin))
            chunks = rev(chunks, carries)
        flat = np.asarray(chunks).reshape(-1)
        lo = start - c0 * cs
        return flat[lo : lo + length].tobytes()

    @staticmethod
    def _parse(blob: bytes) -> dict:
        if len(blob) < 43 or blob[:6] != V3_MAGIC or blob[6] != 3:
            raise ValueError("invalid v3 container")
        flags = blob[7]
        entropy = blob[8]
        tblw = blob[9]  # canonical table bit width (4 or 5; 0 for fgk)
        kw = blob[10]  # lane-words manifest bit width (container max)
        orig, total, chunk_size, n_chunks, lane, crc = struct.unpack_from(
            "<QQIIII", blob, 11)
        pos = 43
        hdr = dict(flags=flags, entropy=entropy, orig=orig, total=total,
                   chunk_size=chunk_size, n_chunks=n_chunks, lane=lane,
                   crc=crc)
        chunk_bits: list = []
        if flags & FLAG_ADAPT and orig:
            w, h, bs, nt = struct.unpack_from("<QQQI", blob, pos)
            pos += 28
            ndb = _cdiv(nt, 8)
            dirs = np.unpackbits(
                np.frombuffer(blob, np.uint8, ndb, pos), count=nt
            ).astype(bool)
            pos += ndb
            hdr.update(w=w, h=h, bs=bs, dirs=dirs)
            if flags & FLAG_AGROUP:
                ng = _cdiv(nt, GROUP_K)
                hdr["group_offs"] = np.frombuffer(blob, "<u4", ng, pos).copy()
                pos += 4 * ng
            else:
                tw = tile_len_width(bs)
                tile_lens = np.frombuffer(blob, f"<u{tw}", nt, pos).copy()
                pos += tw * nt
                hdr["tile_lens"] = tile_lens
        if entropy != ENTROPY_CANONICAL:
            chunk_bits = np.frombuffer(blob, "<u4", n_chunks, pos).tolist()
            pos += 4 * n_chunks
        if flags & FLAG_SHARDED and n_chunks:
            rle_lens = np.frombuffer(blob, "<u4", n_chunks, pos).copy()
            pos += 4 * n_chunks
            carries = np.frombuffer(blob, np.uint8, n_chunks, pos).copy()
            pos += n_chunks
            hdr.update(rle_lens=rle_lens, carries=carries)
        if entropy == ENTROPY_CANONICAL and n_chunks:
            ename = "canonical"
            L = (_sharded_cap(chunk_size, ename, lane)
                 if flags & FLAG_SHARDED else chunk_size)
            tables = _unpackk(blob[pos:], n_chunks * 256, tblw).reshape(
                n_chunks, 256).astype(np.uint8)
            pos += (n_chunks * 256 * tblw + 7) // 8
            lpc = L // lane
            counts = TPUCodec._chunk_counts(
                (hdr["rle_lens"], None) if flags & FLAG_SHARDED else None,
                total, chunk_size, n_chunks)
            used = -(-counts // lane)
            n_entries = int(used.sum())
            entries = _unpackk(blob[pos:], n_entries, kw)
            pos += (n_entries * kw + 7) // 8
            lw = np.zeros((n_chunks, lpc), np.int32)
            lw[np.arange(lpc)[None, :] < used[:, None]] = entries
            chunk_bits = (32 * lw.sum(axis=1, dtype=np.int64)).tolist()
            mx = int(lw.max()) if lw.size else 1
            # decoder stride: bucket the fattest lane to a multiple of 16
            # (floor 8 keeps the Mosaic sublane tile; cap = worst case).
            # NOT a power of two: a 129-word lane (one incompressible
            # chunk in a 64 MB corpus) would double the stride to 256,
            # and the repad output + the decode kernel's refill one-hot
            # both scale with the stride — measured 36 -> 21 ms repad on
            # the bench container from this change alone. Multiples of
            # 16 keep (nl * wb) % 128 == 0 for every nl % 8 == 0 layout.
            from huffman_codec_tpu.ops.pallas_kernels import lane_words_cap

            wb = max(8, -(-mx // 16) * 16)
            # static max-code-length bucket (one compiled decode shape per
            # container): shrinks the kernel's per-symbol boundary compare
            ml = int(tables.max()) if tables.size else 1
            hdr.update(tables=tables, lane_words=lw,
                       wl_bucket=min(wb, lane_words_cap(lane)),
                       max_len_bucket=next(
                           b for b in (8, 12, 16, 24, 31) if b >= ml))
        hdr.update(
            chunk_bits=chunk_bits, payload_off=pos,
            chunk_offs=np.concatenate([
                np.zeros(1, np.int64),
                np.cumsum(np.asarray([(b + 7) // 8 for b in chunk_bits],
                                     dtype=np.int64)),
            ]),
        )
        return hdr
