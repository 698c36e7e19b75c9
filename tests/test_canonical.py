"""Canonical-Huffman device ops: optimality, validity, roundtrip."""

import heapq

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from huffman_codec_tpu.ops.canonical import (  # noqa: E402
    build_lengths,
    canonical_decode_batch,
    canonical_encode_batch,
    histogram,
)

RNG = np.random.default_rng(23)


def scalar_huffman_cost(counts):
    """Optimal total bit cost via a plain heap Huffman (ties don't change
    the total, only the shape)."""
    h = [c for c in counts if c > 0]
    if len(h) <= 1:
        return sum(h)  # single symbol -> 1 bit each in our convention
    heapq.heapify(h)
    total = 0
    while len(h) > 1:
        a, b = heapq.heappop(h), heapq.heappop(h)
        total += a + b
        heapq.heappush(h, a + b)
    return total


def _chunks(rows):
    L = max(len(r) for r in rows)
    L = -(-L // 512) * 512  # lane multiple
    mat = np.zeros((len(rows), L), np.uint8)
    lens = np.array([len(r) for r in rows], np.int32)
    for i, r in enumerate(rows):
        mat[i, : len(r)] = np.frombuffer(r, np.uint8)
    return jnp.asarray(mat), jnp.asarray(lens), L


CASES = [
    [bytes(RNG.integers(0, 256, 1000, dtype=np.uint8))],
    [bytes(RNG.integers(0, 4, 2000, dtype=np.uint8))],
    [b"a" * 500],
    [b"ab" * 400],
    [b"", b"xyz" * 100, b"q"],
    [bytes([255] * 100 + [0] * 3 + list(range(256)))],
    [bytes(RNG.zipf(1.5, 3000).clip(0, 255).astype(np.uint8))],
]


@pytest.mark.parametrize("rows", CASES, ids=range(len(CASES)))
def test_lengths_optimal_and_kraft(rows):
    mat, lens, L = _chunks(rows)
    counts = np.asarray(histogram(mat, lens))
    code_lens = np.asarray(build_lengths(jnp.asarray(counts)))
    for i, row in enumerate(rows):
        c = counts[i]
        cl = code_lens[i]
        assert (cl[c == 0] == 0).all()
        if (c > 0).sum() > 1:
            # Kraft equality: optimal prefix code is complete
            assert np.isclose(np.sum(0.5 ** cl[c > 0]), 1.0)
            # total cost optimal
            assert int((c * cl).sum()) == scalar_huffman_cost(c.tolist())


@pytest.mark.parametrize("rows", CASES, ids=range(len(CASES)))
def test_roundtrip(rows):
    mat, lens, L = _chunks(rows)
    n_words = L + 2
    words, total, tables, lane_bits = canonical_encode_batch(
        mat, lens, n_words, lane=512)
    out = canonical_decode_batch(words, tables, lane_bits, lens,
                                 lane=512, out_len=L)
    got = np.asarray(out)
    for i, row in enumerate(rows):
        assert bytes(got[i][: len(row)]) == row


def test_roundtrip_large_multilane():
    data = RNG.integers(0, 64, 8192, dtype=np.uint8)
    data[1000:4000] = 7  # long runs + mixed entropy
    mat = jnp.asarray(data[None, :])
    lens = jnp.asarray(np.array([8192], np.int32))
    words, total, tables, lane_bits = canonical_encode_batch(
        mat, lens, 8194, lane=512)
    assert lane_bits.shape == (1, 16)
    out = canonical_decode_batch(words, tables, lane_bits, lens,
                                 lane=512, out_len=8192)
    assert bytes(np.asarray(out)[0]) == bytes(data)


def test_lane_bits_sum_matches_total():
    rows = [bytes(RNG.integers(0, 16, 2048, dtype=np.uint8))]
    mat, lens, L = _chunks(rows)
    words, total, tables, lane_bits = canonical_encode_batch(
        mat, lens, L + 2, lane=512)
    assert int(np.asarray(lane_bits).sum()) == int(total[0])
