"""Wire formats shared by every backend (pyref / native C++ / JAX).

Two containers:

v1 — the reference-compatible format (bit-for-bit interoperable with the
     upstream C++ binary):

       [byteCount u64 LE][flags u8][huffman bits, MSB-first, 0-padded]

     * byteCount is the POST-transform symbol count fed to the Huffman coder
       (reference: main.cpp:75 passes the transformed vector's size), stored
       little-endian (headers.cpp:112-114).
     * flags: bit7 = diff model used, bit6 = adaptive RLE used
       (headers.cpp:117-122); bits 5..0 are zero.
     * In adaptive mode the adaptive-RLE header ([W u64 BE][H u64 BE]
       [blockSize u64 BE][scanDir bits, MSB-first, 0-padded to a byte]) is
       *inside* the Huffman-coded payload (transform.cpp:127-131).

v2 — the native chunked container (this framework's scale format): the
     post-transform symbol stream is split into fixed-size chunks, each
     encoded with an independent FGK tree so chunks are data-parallel across
     TPU cores; a manifest of per-chunk (symbol count, bit length) makes
     decode equally parallel and doubles as resumable state.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

FLAG_DIFF = 0x80  # headers.cpp:119 (bit7)
FLAG_ADAPT = 0x40  # headers.cpp:121 (bit6)
HUFF_HEADER_BYTES = 9

# ---------------------------------------------------------------------------
# v1 Huffman header
# ---------------------------------------------------------------------------


def make_huff_header(byte_count: int, use_diff: bool, use_adapt: bool) -> bytes:
    """<64b byteCount LE><8b flags> (headers.cpp:107-125)."""
    flags = (FLAG_DIFF if use_diff else 0) | (FLAG_ADAPT if use_adapt else 0)
    return struct.pack("<QB", byte_count, flags)


def parse_huff_header(header: bytes) -> tuple[int, bool, bool]:
    """Inverse of make_huff_header (decode side: main.cpp:93-98)."""
    if len(header) < HUFF_HEADER_BYTES:
        raise ValueError("invalid or missing Huffman coding header")  # exit 8
    byte_count, flags = struct.unpack("<QB", header[:HUFF_HEADER_BYTES])
    return byte_count, bool(flags & FLAG_DIFF), bool(flags & FLAG_ADAPT)


# ---------------------------------------------------------------------------
# v1 adaptive-RLE header (lives INSIDE the Huffman payload)
# ---------------------------------------------------------------------------


def make_adapt_rle_header(
    width: int, height: int, block_size: int, scan_dirs: list[bool]
) -> bytes:
    """<u64 W BE><u64 H BE><u64 bs BE><scanDir bits MSB-first, 0-padded>.

    Note the big-endian u64s — deliberately opposite of the outer header's
    little-endian byteCount (headers.cpp:27-37 vs headers.cpp:112-114).
    Scan-dir bit: 1 = horizontal, 0 = vertical (headers.cpp:41-60).
    """
    out = bytearray(struct.pack(">QQQ", width, height, block_size))
    acc = 0
    nbits = 0
    for d in scan_dirs:
        acc = (acc << 1) | int(bool(d))
        nbits += 1
        if nbits == 8:
            out.append(acc)
            acc = 0
            nbits = 0
    if nbits:
        out.append(acc << (8 - nbits))
    return bytes(out)


def parse_adapt_rle_header(data: bytes) -> tuple[int, int, int, list[bool], int]:
    """Returns (W, H, blockSize, scanDirs, header_len). headers.cpp:65-105."""
    if len(data) < 24:
        raise ValueError("invalid or missing adaptive block RLE header")  # exit 10
    width, height, block_size = struct.unpack(">QQQ", data[:24])
    n_blocks = block_count(width, height, block_size)
    n_dir_bytes = (n_blocks + 7) // 8
    if len(data) < 24 + n_dir_bytes:
        raise ValueError("invalid adaptive block RLE header")  # exit 11
    dirs: list[bool] = []
    for i in range(n_blocks):
        byte = data[24 + i // 8]
        dirs.append(bool((byte >> (7 - (i % 8))) & 1))
    return width, height, block_size, dirs, 24 + n_dir_bytes


def block_count(width: int, height: int, block_size: int) -> int:
    """ceil(W/bs) * ceil(H/bs) (transform.cpp:410-418)."""
    return ((width + block_size - 1) // block_size) * (
        (height + block_size - 1) // block_size
    )


# ---------------------------------------------------------------------------
# v2 native chunked container
# ---------------------------------------------------------------------------

V2_MAGIC = b"HCTPU\x02"  # 6 bytes; cannot be a sane v1 byteCount prefix
V2_VERSION = 1


@dataclass(frozen=True)
class V2Header:
    flags: int  # same bit meanings as v1 (FLAG_DIFF | FLAG_ADAPT)
    orig_size: int  # original (pre-transform) input size in bytes
    symbol_count: int  # post-transform symbol count (sum over chunks)
    chunk_size: int  # symbols per chunk (last chunk may be short)
    chunk_bits: tuple[int, ...]  # compressed bit length per chunk

    @property
    def n_chunks(self) -> int:
        return len(self.chunk_bits)


def make_v2_container(header: V2Header, payload: bytes) -> bytes:
    """v2 layout::

    [magic 6B][version u8][flags u8]
    [orig_size u64 LE][symbol_count u64 LE][chunk_size u32 LE][n_chunks u32 LE]
    [chunk_bits u64 LE x n_chunks]
    [payload: per-chunk bitstreams, each 0-padded to a byte boundary,
     concatenated in chunk order]
    """
    out = bytearray()
    out += V2_MAGIC
    out.append(V2_VERSION)
    out.append(header.flags)
    out += struct.pack(
        "<QQII",
        header.orig_size,
        header.symbol_count,
        header.chunk_size,
        header.n_chunks,
    )
    out += struct.pack(f"<{header.n_chunks}Q", *header.chunk_bits)
    out += payload
    return bytes(out)


def parse_v2_container(data: bytes) -> tuple[V2Header, bytes]:
    if not is_v2(data):
        raise ValueError("not a v2 container")
    if data[6] != V2_VERSION:
        raise ValueError(f"unsupported v2 version {data[6]}")
    flags = data[7]
    orig_size, symbol_count, chunk_size, n_chunks = struct.unpack(
        "<QQII", data[8:32]
    )
    off = 32
    chunk_bits = struct.unpack(f"<{n_chunks}Q", data[off : off + 8 * n_chunks])
    off += 8 * n_chunks
    header = V2Header(
        flags=flags,
        orig_size=orig_size,
        symbol_count=symbol_count,
        chunk_size=chunk_size,
        chunk_bits=chunk_bits,
    )
    return header, data[off:]


def is_v2(data: bytes) -> bool:
    return data[: len(V2_MAGIC)] == V2_MAGIC


# ---------------------------------------------------------------------------
# bit packing (v1 bit order: MSB-first within each byte, main.cpp:78-84)
# ---------------------------------------------------------------------------


def pack_bits_msb(bits) -> bytes:
    """Pack an iterable of 0/1 into bytes MSB-first, zero-padded."""
    out = bytearray()
    acc = 0
    n = 0
    for b in bits:
        acc = (acc << 1) | (b & 1)
        n += 1
        if n == 8:
            out.append(acc)
            acc = 0
            n = 0
    if n:
        out.append(acc << (8 - n))
    return bytes(out)


def unpack_bits_msb(data: bytes) -> list[int]:
    """Explode bytes into bits MSB-first (main.cpp:107-113)."""
    out: list[int] = []
    for byte in data:
        for i in range(7, -1, -1):
            out.append((byte >> i) & 1)
    return out
