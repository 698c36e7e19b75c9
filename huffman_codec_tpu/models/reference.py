"""V1Codec — the reference wire format driven through the device ops.

Produces output byte-identical to the upstream binary (main.cpp:39-87) with
every pipeline stage running as JAX array ops; the whole post-transform
stream is one FGK chunk, because the v1 format's single adaptive tree is a
serial chain by construction (SURVEY.md §7 hard part c). This model exists
for interop/parity; TPUCodec (v3) is the performance path, and the native
C++ runtime is the fast host path for v1 bulk work.

Decode: stream mode runs fully on device (FGK walk + parallel RLE). v1
adaptive payloads interleave tile boundaries with the data itself
(transform.cpp:330-361), which forces a sequential discovery walk — that
mode delegates to the native runtime when available, else the pyref model.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from huffman_codec_tpu.formats import make_huff_header, parse_huff_header
from huffman_codec_tpu.models.chunked import CodecConfig, _cdiv
from huffman_codec_tpu.ops.adapt import (
    adapt_encode_fixed,
    adapt_search_sizes,
    candidate_sizes,
    rle_max_encoded_len,
)
from huffman_codec_tpu.ops.diff import diff_apply, diff_revert
from huffman_codec_tpu.ops.fgk import fgk_decode_chunk, fgk_encode_chunk, max_code_bits
from huffman_codec_tpu.ops.pack import bytes_to_words, words_to_bytes
from huffman_codec_tpu.ops.rle import rle_decode, rle_encode


class V1Codec:
    """Bit-exact v1 (reference format) encode/decode on device."""

    def __init__(self, config: CodecConfig | None = None):
        self.config = config or CodecConfig()

    def encode(self, data: bytes) -> bytes:
        cfg = self.config
        n = len(data)
        if cfg.use_adapt:
            if cfg.width <= 0:
                raise ValueError("invalid width of 2D data")  # exit 4
            if n % cfg.width:
                raise ValueError("invalid size of input 2D data")  # exit 6
        if n == 0:
            return make_huff_header(0, cfg.use_diff, cfg.use_adapt)
        x = jnp.asarray(np.frombuffer(data, np.uint8))
        if cfg.use_diff:
            x = diff_apply(x)
        if cfg.use_adapt:
            w, h = cfg.width, n // cfg.width
            sizes = np.asarray(adapt_search_sizes(x, w, h))
            bs = candidate_sizes(w, h)[int(np.argmin(sizes))]
            cap = rle_max_encoded_len(n) + 64
            stream, total, _, _ = adapt_encode_fixed(x, w, h, bs, out_len=cap)
        else:
            stream, total = rle_encode(x)
        total = int(total)
        # bucket the padded stream length and word capacity to powers of
        # two: fgk_encode_chunk is a fixed-shape scan, so nearby totals
        # share one compilation (the 48-cell matrix would otherwise
        # compile a fresh scan per cell; the pad columns are masked by
        # the true ``length`` operand and never reach the output bytes)
        gran = max(4096, 1 << max(0, total.bit_length() - 3))
        cap = _cdiv(total, gran) * gran  # <= ~14% pad, few shapes/octave
        n_words = _cdiv(cap * max_code_bits(cap), 32) + 2
        pad = jnp.zeros((cap,), jnp.uint8).at[:total].set(stream[:total])
        words, bits = fgk_encode_chunk(pad, jnp.int32(total), n_words)
        nb = (int(bits) + 7) // 8
        body = np.asarray(words_to_bytes(words, max(1, nb)))[:nb].tobytes()
        return make_huff_header(total, cfg.use_diff, cfg.use_adapt) + body

    def decode(self, blob: bytes, size_hint: int | None = None,
               force_device: bool = False) -> bytes:
        count, use_diff, use_adapt = parse_huff_header(blob)
        if count == 0:
            return b""
        if use_adapt:
            if not force_device:
                # the native runtime walks tile boundaries fastest on
                # host; the device path below is full-JAX parity
                try:
                    from huffman_codec_tpu.native import runtime

                    return runtime.v1_decompress(blob)
                except Exception:
                    pass
            return self._decode_adapt_device(blob, count, use_diff)
        payload = np.frombuffer(blob, np.uint8, offset=9)
        words = bytes_to_words(jnp.asarray(payload), _cdiv(len(payload), 4))
        if 8 * len(payload) < count:  # each symbol needs >= 1 bit (exit 9)
            raise ValueError("invalid Huffman coding file contents")
        stream = fgk_decode_chunk(words, jnp.int32(count), out_len=count)
        # tight RLE expansion bound: every count byte (<= 255 extra output
        # bytes) is preceded by exactly 3 literals in the stream
        # (transform.cpp:256-269), so a `count`-byte stream holds at most
        # count // 4 count bytes -> decoded size <= count + 255*(count//4)
        bound = size_hint or (count + 255 * (count // 4))
        out, n = rle_decode(stream, jnp.int32(count), out_len=int(bound))
        out = np.asarray(out)[: int(n)]
        if use_diff:
            out = np.asarray(diff_revert(jnp.asarray(out)))
        return out.tobytes()

    def _decode_adapt_device(self, blob: bytes, count: int,
                             use_diff: bool) -> bytes:
        """Full-JAX v1 adaptive decode: FGK -> in-band adaptive header
        parse -> serial tile-boundary walk (one lax.scan; the v1 format
        interleaves boundaries with data, transform.cpp:330-361) ->
        parallel per-tile RLE decode + scatter. Byte-exact with the
        native runtime / pyref on every corpus case; slower than native
        (the walk is sequential by the format's design)."""
        from huffman_codec_tpu.formats import parse_adapt_rle_header
        from huffman_codec_tpu.models.chunked import _decode_adapt_tail
        from huffman_codec_tpu.ops.adapt import adapt_serial_tile_owner

        payload = np.frombuffer(blob, np.uint8, offset=9)
        if 8 * len(payload) < count:
            raise ValueError("invalid Huffman coding file contents")
        words = bytes_to_words(jnp.asarray(payload), _cdiv(len(payload), 4))
        stream = np.asarray(
            fgk_decode_chunk(words, jnp.int32(count), out_len=count))
        w, h, bs, dirs, hdr_len = parse_adapt_rle_header(stream.tobytes())
        nt = _cdiv(w, bs) * _cdiv(h, bs)
        body = stream[hdr_len:count]
        total = body.size
        owner = np.asarray(adapt_serial_tile_owner(
            jnp.asarray(body), jnp.int32(total), int(w), int(h), int(bs),
            int(total)))
        tl = np.bincount(owner[owner >= 0], minlength=nt).astype(np.int32)
        flat = _decode_adapt_tail(
            jnp.asarray(body), jnp.asarray(tl),
            jnp.asarray(np.asarray(dirs[:nt], bool)), int(w), int(h),
            int(bs), use_diff)
        return np.asarray(flat)[: w * h].tobytes()
