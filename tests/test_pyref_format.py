"""Differential tests: pyref (exact scalar model) vs the compiled C++ oracle.

Edge cases pinned per SURVEY.md §2.3/§2.6: run lengths around 3/258/516,
trailing runs, count-255 reset, empty input, header endianness, scan-dir
bit order, non-divisible matrices.
"""

import random

import pytest

from huffman_codec_tpu import pyref
from huffman_codec_tpu.formats import (
    make_adapt_rle_header,
    pack_bits_msb,
    parse_adapt_rle_header,
    unpack_bits_msb,
)
from huffman_codec_tpu.pyref.codec import apply_diff_model, revert_diff_model

from conftest import run_oracle

# ---------------------------------------------------------------------------
# RLE unit tests (format quirks)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "data,expected",
    [
        (b"", b""),
        (b"A", b"A"),
        (b"AA", b"AA"),
        (b"AAA", b"AAA"),  # 3-run at EOS: last byte is literal, no count yet
        (b"AAAA", b"AAA\x00A"),  # trailing run: flush count 0 + literal
        (b"AAAAA", b"AAA\x01A"),
        (b"A" * 258, b"AAA\xfeA"),  # last byte never extends the run
        (b"A" * 259, b"AAA\xffA"),  # run of 258 -> count 255
        (b"A" * 260, b"AAA\xffAA"),  # reset: 259th byte restarts matching
        (b"A" * 262, b"AAA\xffAAA\x00A"),
        (b"A" * 516, b"AAA\xffAAA\xfeA"),
        (b"A" * 517, b"AAA\xffAAA\xffA"),
        (b"AAAB", b"AAA\x00B"),  # interior 3-run gets count 0
        (b"AAAABBBB", b"AAA\x01BBB\x00B"),
        (b"ABAB", b"ABAB"),
    ],
)
def test_rle_encode_exact(data, expected):
    assert bytes(pyref.rle_encode(data)) == expected


@pytest.mark.parametrize(
    "data",
    [b""]
    + [b"A" * n for n in (1, 2, 3, 4, 5, 257, 258, 259, 260, 262, 516, 517, 1000)]
    + [b"AAAB", b"BAAA", b"AAAABBBB", bytes(range(256)) * 3],
)
def test_rle_roundtrip(data):
    enc = pyref.rle_encode(data)
    dec, pos = pyref.rle_decode(enc)
    assert bytes(dec) == data
    assert pos == len(enc)


def test_rle_roundtrip_random():
    rng = random.Random(0)
    for trial in range(50):
        n = rng.randrange(0, 2000)
        # biased toward runs
        data = bytearray()
        while len(data) < n:
            data += bytes([rng.randrange(4)]) * rng.randrange(1, 20)
        data = bytes(data[:n])
        dec, _ = pyref.rle_decode(pyref.rle_encode(data))
        assert bytes(dec) == data


# ---------------------------------------------------------------------------
# diff model
# ---------------------------------------------------------------------------


def test_diff_model():
    data = bytes([5, 3, 3, 200, 1, 255, 0])
    d = apply_diff_model(data)
    assert list(d) == [5, (3 - 5) & 0xFF, 0, (200 - 3) & 0xFF, (1 - 200) & 0xFF,
                       254, 1]
    assert bytes(revert_diff_model(d)) == data


# ---------------------------------------------------------------------------
# headers
# ---------------------------------------------------------------------------


def test_huff_header_endianness():
    from huffman_codec_tpu.formats import make_huff_header, parse_huff_header

    h = make_huff_header(0x0102030405060708, True, False)
    assert h[:8] == bytes([8, 7, 6, 5, 4, 3, 2, 1])  # little-endian
    assert h[8] == 0x80
    assert parse_huff_header(h) == (0x0102030405060708, True, False)


def test_adapt_header_endianness_and_bits():
    # W=0x0102=258, H=0x0104=260, bs=256 -> ceil(258/256)*ceil(260/256) = 4 blocks
    h = make_adapt_rle_header(0x0102, 0x0104, 256, [True, False, True, False])
    assert h[:8] == bytes([0, 0, 0, 0, 0, 0, 1, 2])  # big-endian
    assert h[8:16] == bytes([0, 0, 0, 0, 0, 0, 1, 4])
    assert h[16:24] == bytes([0, 0, 0, 0, 0, 0, 1, 0])
    assert h[24] == 0b10100000  # MSB-first, zero-padded
    w, hh, bs, dirs, ln = parse_adapt_rle_header(h)
    assert (w, hh, bs, dirs, ln) == (
        0x0102, 0x0104, 256, [True, False, True, False], 25)


def test_bit_packing():
    bits = [1, 0, 1, 1, 0, 0, 1, 0, 1, 1]
    packed = pack_bits_msb(bits)
    assert packed == bytes([0b10110010, 0b11000000])
    assert unpack_bits_msb(packed)[:10] == bits


# ---------------------------------------------------------------------------
# FGK vs oracle (differential, small inputs)
# ---------------------------------------------------------------------------

SMALL_INPUTS = [
    b"",
    b"a",
    b"ab",
    b"aab",
    b"abracadabra",
    b"mississippi river runs deep",
    bytes(range(256)),
    bytes(range(256)) * 2,
    b"A" * 1000,
    bytes([i % 7 for i in range(500)]),
    bytes([(i * i) % 251 for i in range(2000)]),
]


@pytest.mark.parametrize("idx", range(len(SMALL_INPUTS)))
@pytest.mark.parametrize("flags", [[], ["-m"]])
def test_compress_matches_oracle_stream(oracle, tmp_path, idx, flags):
    data = SMALL_INPUTS[idx]
    rc, expected = run_oracle(oracle, ["-c", *flags], tmp_path, data)
    assert rc == 0
    ours = pyref.compress(data, use_diff="-m" in flags, use_adapt=False)
    assert ours == expected
    # and our decoder round-trips the oracle's output
    assert pyref.decompress(expected) == data


@pytest.mark.parametrize("flags", [["-a"], ["-a", "-m"]])
@pytest.mark.parametrize("w,h", [(8, 8), (16, 16), (16, 8), (64, 32), (24, 24),
                                 (17, 16)])
def test_compress_matches_oracle_adaptive(oracle, tmp_path, flags, w, h):
    rng = random.Random(w * 1000 + h)
    data = bytearray()
    # runs + gradients to exercise scan-direction selection
    for y in range(h):
        for x in range(w):
            data.append((x if y % 2 else y * 3) & 0xFF if rng.random() < 0.8
                        else rng.randrange(256))
    data = bytes(data)
    rc, expected = run_oracle(oracle, ["-c", "-w", str(w), *flags], tmp_path, data)
    assert rc == 0
    ours = pyref.compress(data, use_diff="-m" in flags, use_adapt=True, width=w)
    assert ours == expected
    assert pyref.decompress(expected) == data


def test_empty_file_is_9_bytes(oracle, tmp_path):
    rc, expected = run_oracle(oracle, ["-c"], tmp_path, b"")
    assert rc == 0 and len(expected) == 9
    assert pyref.compress(b"") == expected
    assert pyref.decompress(expected) == b""


def test_oracle_decodes_our_output(oracle, tmp_path):
    data = b"the quick brown fox jumps over the lazy dog" * 10
    ours = pyref.compress(data, use_diff=True)
    inp = tmp_path / "c.bin"
    out = tmp_path / "d.bin"
    inp.write_bytes(ours)
    import subprocess

    proc = subprocess.run(
        [str(oracle), "-d", "-i", str(inp), "-o", str(out)], capture_output=True
    )
    assert proc.returncode == 0
    assert out.read_bytes() == data
