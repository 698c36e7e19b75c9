"""Bit packing: scatter-free segment-sum formulation vs the scatter oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from huffman_codec_tpu.ops.pack import (  # noqa: E402
    bytes_to_words,
    pack_codes,
    pack_codes_segsum,
    words_to_bytes,
)

RNG = np.random.default_rng(5)


def scalar_pack(codes, lens):
    bits = []
    for v, l in zip(codes, lens):
        bits.extend((int(v) >> (l - 1 - k)) & 1 for k in range(l))
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for k, bit in enumerate(bits[i : i + 8]):
            b |= bit << (7 - k)
        out.append(b)
    return bytes(out), len(bits)


@pytest.mark.parametrize("n", [1, 2, 7, 100, 1000])
@pytest.mark.parametrize("maxlen", [4, 24, 31])
def test_pack_matches_scalar(n, maxlen):
    # pack_codes' contract: codes are >= 1 bit except a zero-length padding
    # TAIL (what both entropy coders feed it); interior zeros are only
    # supported by the general formulations (segsum test below).
    lens = RNG.integers(1, maxlen + 1, n).astype(np.int32)
    tail = RNG.integers(0, max(1, n // 3))
    if tail:
        lens[n - tail:] = 0
    codes = (RNG.integers(0, 1 << 31, n).astype(np.uint64)
             & ((1 << lens.astype(np.uint64)) - 1)).astype(np.uint32)
    expect, nbits = scalar_pack(codes, lens)
    nw = nbits // 32 + 2
    w, total = pack_codes(jnp.asarray(codes), jnp.zeros(n, jnp.uint32),
                          jnp.asarray(lens), nw)
    assert int(total) == nbits
    got = bytes(np.asarray(words_to_bytes(w, max(1, len(expect)))))
    assert got == expect


def test_pack_min_length_runs():
    """Worst-case run: 33 one-bit codes share an output word."""
    n = 200
    lens = np.ones(n, np.int32)
    codes = (np.arange(n) & 1).astype(np.uint32)
    expect, nbits = scalar_pack(codes, lens)
    nw = nbits // 32 + 2
    w, total = pack_codes(jnp.asarray(codes), jnp.zeros(n, jnp.uint32),
                          jnp.asarray(lens), nw)
    assert int(total) == nbits
    got = bytes(np.asarray(words_to_bytes(w, max(1, len(expect)))))
    assert got == expect


def test_pack_64bit_codes():
    """hi word exercised (codes 33..64 bits, the FGK NYT+raw path)."""
    lens = np.array([40, 33, 64, 1, 50], np.int32)
    vals = [(1 << 39) | 0xABCDE, (1 << 32) | 7, (1 << 63) | 0x123456789,
            1, (1 << 49) | 0xFFF]
    lo = np.array([v & 0xFFFFFFFF for v in vals], np.uint32)
    hi = np.array([v >> 32 for v in vals], np.uint32)
    bits = []
    for v, l in zip(vals, lens):
        bits.extend((int(v) >> (int(l) - 1 - k)) & 1 for k in range(int(l)))
    nw = len(bits) // 32 + 2
    w, total = pack_codes(jnp.asarray(lo), jnp.asarray(hi),
                          jnp.asarray(lens), nw)
    ws, ts = pack_codes_segsum(jnp.asarray(lo), jnp.asarray(hi),
                                jnp.asarray(lens), nw)
    assert int(total) == len(bits) == int(ts)
    np.testing.assert_array_equal(np.asarray(w), np.asarray(ws))
    got = np.asarray(w)
    for p, bit in enumerate(bits):
        assert (int(got[p >> 5]) >> (31 - (p & 31))) & 1 == bit, p


def test_pack_vs_segsum_random():
    n = 5000
    lens = RNG.integers(1, 32, n).astype(np.int32)
    lens[n - 100:] = 0  # padding tail
    codes = (RNG.integers(0, 1 << 31, n).astype(np.uint64)
             & ((1 << lens.astype(np.uint64)) - 1)).astype(np.uint32)
    nw = int(lens.sum()) // 32 + 2
    a, ta = pack_codes(jnp.asarray(codes), jnp.zeros(n, jnp.uint32),
                       jnp.asarray(lens), nw)
    b, tb = pack_codes_segsum(jnp.asarray(codes), jnp.zeros(n, jnp.uint32),
                               jnp.asarray(lens), nw)
    assert int(ta) == int(tb)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_words_bytes_roundtrip():
    data = RNG.integers(0, 256, 41, dtype=np.uint8)
    w = bytes_to_words(jnp.asarray(data), 11)
    back = np.asarray(words_to_bytes(w, 41))
    np.testing.assert_array_equal(back, data)
