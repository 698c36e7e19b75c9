"""TPUCodec — the flagship chunk-parallel device codec (v3 container).

Same capability surface as the reference pipeline (diff model, stream RLE /
adaptive block RLE, FGK adaptive Huffman; readme.md:31) but re-designed for
the TPU execution model instead of translating the serial C++ loop:

* every transform is a static-shaped, jittable array op (ops/);
* the post-transform symbol stream is cut into fixed chunks, each carrying
  an independent FGK tree -> `vmap`/`shard_map` data-parallelism on encode
  AND decode (the reference format's single serial FGK chain is the one
  thing that cannot be parallelized without replaying state, SURVEY.md §7);
* everything variable-length lives in a manifest (per-chunk bit lengths,
  per-tile byte lengths) so decode needs no sequential discovery pass.

v3 wire layout (all little-endian; contrast v1's mixed LE/BE, SURVEY.md §2.6):

    magic "HCTPU\\x03" | version u8 | flags u8 (bit7 diff, bit6 adapt)
    orig_size u64 | transformed_size u64 | chunk_size u32 | n_chunks u32
    [adapt only] W u64 | H u64 | bs u64 | n_tiles u32
                 scanDir bits (ceil(nt/8) bytes, MSB-first)
                 tile_lens u32 * n_tiles
    chunk_bits u64 * n_chunks
    payload: byte-aligned per-chunk FGK bitstreams, concatenated

Unlike v1/v2, the adaptive header is NOT embedded in the compressed payload:
the manifest replaces it, which is what makes tile decode parallel.
"""

from __future__ import annotations

import functools
import struct
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from huffman_codec_tpu.formats import FLAG_ADAPT, FLAG_DIFF
from huffman_codec_tpu.ops.adapt import (
    adapt_decode_tiled,
    adapt_encode_fixed,
    adapt_search_sizes,
    candidate_sizes,
    rle_max_encoded_len,
)
from huffman_codec_tpu.ops.diff import diff_apply, diff_revert
from huffman_codec_tpu.ops.fgk import fgk_decode_batch, fgk_encode_batch, max_code_bits
from huffman_codec_tpu.ops.pack import bytes_to_words, words_to_bytes
from huffman_codec_tpu.ops.rle import rle_decode, rle_encode

V3_MAGIC = b"HCTPU\x03"


@dataclass(frozen=True)
class CodecConfig:
    """Pipeline options — the reference CLI surface plus chunking
    (main.cpp:152-221 defaults: diff off, adapt off, width 512)."""

    use_diff: bool = False
    use_adapt: bool = False
    width: int = 512
    chunk_size: int = 1 << 16

    def flags(self) -> int:
        return (FLAG_DIFF if self.use_diff else 0) | (
            FLAG_ADAPT if self.use_adapt else 0
        )


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# jitted encode stages (static-shape specialized per (n, config))
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("use_diff", "chunk_size", "max_chunks", "n_words")
)
def _encode_stream_stage(
    data: jax.Array, use_diff: bool, chunk_size: int, max_chunks: int, n_words: int
):
    """diff? -> stream RLE -> chunked FGK, all on device."""
    x = diff_apply(data) if use_diff else data
    stream, total = rle_encode(x, out_len=max_chunks * chunk_size)
    chunks = stream.reshape(max_chunks, chunk_size)
    lens = jnp.clip(
        total - jnp.arange(max_chunks, dtype=jnp.int32) * chunk_size, 0, chunk_size
    )
    words, bits = fgk_encode_batch(chunks, lens, n_words)
    return words, bits, total


@functools.partial(
    jax.jit,
    static_argnames=("use_diff", "width", "height", "bs", "chunk_size",
                     "max_chunks", "n_words"),
)
def _encode_adapt_stage(
    data: jax.Array, use_diff: bool, width: int, height: int, bs: int,
    chunk_size: int, max_chunks: int, n_words: int,
):
    """diff? -> adaptive block RLE (fixed bs) -> chunked FGK.

    The v3 transformed stream is the concatenated tile data only — the
    manifest replaces the in-band v1 adaptive header."""
    x = diff_apply(data) if use_diff else data
    payload, total, dirs, tile_lens = adapt_encode_fixed(
        x, width, height, bs, out_len=max_chunks * chunk_size
    )
    from huffman_codec_tpu.ops.adapt import ADAPT_HEADER_BYTES

    nt = dirs.shape[0]
    header_len = ADAPT_HEADER_BYTES + (nt + 7) // 8
    tile_total = total - header_len
    # strip the v1-style header: shift payload left by header_len
    stream = jnp.roll(payload, -header_len)
    chunks = stream.reshape(max_chunks, chunk_size)
    lens = jnp.clip(
        tile_total - jnp.arange(max_chunks, dtype=jnp.int32) * chunk_size,
        0, chunk_size,
    )
    words, bits = fgk_encode_batch(chunks, lens, n_words)
    return words, bits, tile_total, dirs, tile_lens


@functools.partial(jax.jit, static_argnames=("chunk_size", "out_len", "use_diff"))
def _decode_stream_stage(
    words: jax.Array, counts: jax.Array, total: jax.Array,
    chunk_size: int, out_len: int, use_diff: bool,
):
    chunks = fgk_decode_batch(words, counts, chunk_size)
    stream = chunks.reshape(-1)
    out, n = rle_decode(stream, total, out_len=out_len)
    return (diff_revert(out) if use_diff else out), n


@functools.partial(
    jax.jit, static_argnames=("chunk_size", "width", "height", "bs", "use_diff")
)
def _decode_adapt_stage(
    words: jax.Array, counts: jax.Array, tile_lens: jax.Array, dirs: jax.Array,
    chunk_size: int, width: int, height: int, bs: int, use_diff: bool,
):
    chunks = fgk_decode_batch(words, counts, chunk_size)
    stream = chunks.reshape(-1)
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

    # -- encode -------------------------------------------------------------

    def encode(self, data: bytes) -> bytes:
        cfg = self.config
        n = len(data)
        if cfg.use_adapt:
            if cfg.width <= 0:
                raise ValueError("invalid matrix width")  # exit 4
            if n % cfg.width:
                raise ValueError("invalid size of input 2D data")  # exit 6
        if n == 0:
            return self._container(b"", 0, 0, [], None)
        x = jnp.asarray(np.frombuffer(data, np.uint8))
        cs = cfg.chunk_size
        if cfg.use_adapt:
            w, h = cfg.width, n // cfg.width
            sizes = np.asarray(adapt_search_sizes(x, w, h))
            bs = candidate_sizes(w, h)[int(np.argmin(sizes))]
            cap = rle_max_encoded_len(n) + 64
            max_chunks = _cdiv(cap, cs)
            n_words = _cdiv(cs * max_code_bits(cs), 32) + 2
            words, bits, total, dirs, tile_lens = _encode_adapt_stage(
                x, cfg.use_diff, w, h, bs, cs, max_chunks, n_words
            )
            adapt_meta = (w, h, bs, np.asarray(dirs), np.asarray(tile_lens))
        else:
            cap = rle_max_encoded_len(n)
            max_chunks = _cdiv(cap, cs)
            n_words = _cdiv(cs * max_code_bits(cs), 32) + 2
            words, bits, total = _encode_stream_stage(
                x, cfg.use_diff, cs, max_chunks, n_words
            )
            adapt_meta = None
        total = int(total)
        n_chunks = _cdiv(total, cs)
        bits_np = np.asarray(bits)[:n_chunks]
        streams = []
        for c in range(n_chunks):
            nb = (int(bits_np[c]) + 7) // 8
            streams.append(
                np.asarray(words_to_bytes(words[c], max(1, nb)))[:nb].tobytes()
            )
        return self._container(b"".join(streams), n, total, bits_np.tolist(),
                               adapt_meta)

    def _container(self, payload, orig, total, chunk_bits, adapt_meta) -> bytes:
        cfg = self.config
        out = bytearray()
        out += V3_MAGIC
        out.append(1)
        out.append(cfg.flags())
        out += struct.pack("<QQII", orig, total, cfg.chunk_size, len(chunk_bits))
        if cfg.use_adapt and adapt_meta is not None:
            w, h, bs, dirs, tile_lens = adapt_meta
            nt = len(tile_lens)
            out += struct.pack("<QQQI", w, h, bs, nt)
            acc, nb = 0, 0
            for d in dirs:
                acc = (acc << 1) | int(d)
                nb += 1
                if nb == 8:
                    out.append(acc)
                    acc, nb = 0, 0
            if nb:
                out.append(acc << (8 - nb))
            out += np.asarray(tile_lens, "<u4").tobytes()
        for b in chunk_bits:
            out += struct.pack("<Q", int(b))
        out += payload
        return bytes(out)

    # -- decode -------------------------------------------------------------

    def decode(self, blob: bytes) -> bytes:
        hdr = self._parse(blob)
        if hdr["orig"] == 0:
            return b""
        cs = hdr["chunk_size"]
        n_chunks = hdr["n_chunks"]
        wpc = _cdiv(cs * max_code_bits(cs), 32) + 2
        words = np.zeros((n_chunks, wpc), np.uint32)
        pos = hdr["payload_off"]
        for c in range(n_chunks):
            nb = (hdr["chunk_bits"][c] + 7) // 8
            chunk = np.frombuffer(blob, np.uint8, nb, pos)
            pos += nb
            w = np.asarray(bytes_to_words(jnp.asarray(chunk), _cdiv(nb, 4)))
            words[c, : w.shape[0]] = w
        counts = np.clip(
            hdr["total"] - np.arange(n_chunks, dtype=np.int64) * cs, 0, cs
        ).astype(np.int32)
        use_diff = bool(hdr["flags"] & FLAG_DIFF)
        if hdr["flags"] & FLAG_ADAPT:
            w_, h_, bs = hdr["w"], hdr["h"], hdr["bs"]
            flat = _decode_adapt_stage(
                jnp.asarray(words), jnp.asarray(counts),
                jnp.asarray(hdr["tile_lens"].astype(np.int32)),
                jnp.asarray(hdr["dirs"]), cs, w_, h_, bs, use_diff,
            )
            out = np.asarray(flat)[: hdr["orig"]]
        else:
            dec, n = _decode_stream_stage(
                jnp.asarray(words), jnp.asarray(counts), jnp.int32(hdr["total"]),
                cs, hdr["orig"] + 8, use_diff,
            )
            if int(n) != hdr["orig"]:
                raise ValueError("corrupt v3 container: size mismatch")
            out = np.asarray(dec)[: hdr["orig"]]
        return out.tobytes()

    @staticmethod
    def _parse(blob: bytes) -> dict:
        if len(blob) < 32 or blob[:6] != V3_MAGIC or blob[6] != 1:
            raise ValueError("invalid v3 container")
        flags = blob[7]
        orig, total, chunk_size, n_chunks = struct.unpack_from("<QQII", blob, 8)
        pos = 32
        hdr = dict(flags=flags, orig=orig, total=total, chunk_size=chunk_size,
                   n_chunks=n_chunks)
        if flags & FLAG_ADAPT and orig:
            w, h, bs, nt = struct.unpack_from("<QQQI", blob, pos)
            pos += 28
            ndb = _cdiv(nt, 8)
            dirs = np.unpackbits(
                np.frombuffer(blob, np.uint8, ndb, pos), count=nt
            ).astype(bool)
            pos += ndb
            tile_lens = np.frombuffer(blob, "<u4", nt, pos).copy()
            pos += 4 * nt
            hdr.update(w=w, h=h, bs=bs, dirs=dirs, tile_lens=tile_lens)
        chunk_bits = [
            struct.unpack_from("<Q", blob, pos + 8 * c)[0] for c in range(n_chunks)
        ]
        pos += 8 * n_chunks
        hdr.update(chunk_bits=chunk_bits, payload_off=pos)
        return hdr
