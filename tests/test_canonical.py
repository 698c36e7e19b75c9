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


def _to_wire(buf, lane_words):
    """Lane buffers -> the decoder's PADDED fixed-stride word rows, via the
    wire: strip each lane to its used words (what encode() writes), then
    scatter back to the fixed ``W`` stride (what _load_words rebuilds) —
    exercising the same strip/re-pad round trip as the container path."""
    buf = np.asarray(buf)
    lw = np.asarray(lane_words)
    C, n_lanes, W = buf.shape
    out = np.zeros((C, n_lanes, W), np.uint32)
    col = np.arange(W)
    for c in range(C):
        flat = buf[c][col[None, :] < lw[c][:, None]]  # wire: used words only
        out[c][col[None, :] < lw[c][:, None]] = flat
    return jnp.asarray(out.reshape(C, n_lanes * W))


@pytest.mark.parametrize("rows", CASES, ids=range(len(CASES)))
def test_roundtrip(rows):
    mat, lens, L = _chunks(rows)
    buf, lane_words, tables = canonical_encode_batch(mat, lens, lane=512)
    out = canonical_decode_batch(_to_wire(buf, lane_words), tables,
                                 lane_words, lens, lane=512, out_len=L)
    got = np.asarray(out)
    for i, row in enumerate(rows):
        assert bytes(got[i][: len(row)]) == row


def test_roundtrip_large_multilane():
    data = RNG.integers(0, 64, 8192, dtype=np.uint8)
    data[1000:4000] = 7  # long runs + mixed entropy
    mat = jnp.asarray(data[None, :])
    lens = jnp.asarray(np.array([8192], np.int32))
    buf, lane_words, tables = canonical_encode_batch(mat, lens, lane=512)
    assert lane_words.shape == (1, 16)
    out = canonical_decode_batch(_to_wire(buf, lane_words), tables,
                                 lane_words, lens, lane=512, out_len=8192)
    assert bytes(np.asarray(out)[0]) == bytes(data)


def test_lane_words_bound_bits():
    rows = [bytes(RNG.integers(0, 16, 2048, dtype=np.uint8))]
    mat, lens, L = _chunks(rows)
    buf, lane_words, tables = canonical_encode_batch(mat, lens, lane=512)
    # each lane: <= 512 symbols x <= 31 bits, word-aligned
    lw = np.asarray(lane_words)
    assert (lw >= 0).all() and (lw <= 512 * 31 // 32 + 1).all()
    assert int(lw.sum()) > 0


@pytest.mark.parametrize("rows", CASES, ids=range(len(CASES)))
def test_pallas_lane_decode_interpret_matches_xla(rows):
    """lane_decode (interpret mode) must be bit-exact with the XLA decoder
    across the same cases the roundtrip test covers (VERDICT r2 #6)."""
    from huffman_codec_tpu.ops.pallas_kernels import lane_decode, lane_words_cap

    mat, lens, L = _chunks(rows)
    buf, lane_words, tables = canonical_encode_batch(mat, lens, lane=512)
    words = _to_wire(buf, lane_words)
    ref = np.asarray(canonical_decode_batch(words, tables, lane_words, lens,
                                            lane=512, out_len=L))
    C = mat.shape[0]
    n_lanes = L // 512
    Wl = lane_words_cap(512)
    got = np.asarray(lane_decode(words.reshape(C, n_lanes, Wl), tables, lens,
                                 lane=512, interpret=True))
    for i, row in enumerate(rows):
        assert bytes(got[i][: len(row)]) == row
        np.testing.assert_array_equal(got[i][: len(row)],
                                      ref[i][: len(row)])


def test_pallas_lane_pack_decode_roundtrip_interpret():
    """lane_pack -> lane_decode, both in interpret mode: the full Pallas
    entropy path round-trips without touching the XLA formulations."""
    from huffman_codec_tpu.ops.canonical import assign_codes
    from huffman_codec_tpu.ops.pallas_kernels import lane_decode, lane_pack

    data = RNG.integers(0, 48, (2, 8 * 512)).astype(np.uint8)
    data[0, 100:1800] = 3  # long runs: skewed table + multi-word lanes
    lens = np.array([8 * 512, 2901], np.int32)
    counts = histogram(jnp.asarray(data), jnp.asarray(lens))
    lt = build_lengths(counts)
    codes = assign_codes(lt)
    tables = codes | (lt.astype(jnp.uint32) << 26)
    buf, bits = lane_pack(jnp.asarray(data), jnp.asarray(lens), tables, 512,
                          interpret=True)
    got = np.asarray(lane_decode(buf, lt.astype(jnp.uint8),
                                 jnp.asarray(lens), lane=512, interpret=True))
    for i in range(2):
        np.testing.assert_array_equal(got[i][: lens[i]], data[i][: lens[i]])


def test_pallas_lane_pack_interpret_matches_xla():
    from huffman_codec_tpu.ops.canonical import assign_codes
    from huffman_codec_tpu.ops.pallas_kernels import lane_pack, lane_pack_xla

    data = RNG.integers(0, 90, (2, 16 * 512)).astype(np.uint8)
    lens = np.array([16 * 512, 5000], np.int32)
    counts = histogram(jnp.asarray(data), jnp.asarray(lens))
    lt = build_lengths(counts)
    codes = assign_codes(lt)
    tables = codes | (lt.astype(jnp.uint32) << 26)
    wx, bx = lane_pack_xla(jnp.asarray(data), jnp.asarray(lens), tables, 512)
    wp, bp = lane_pack(jnp.asarray(data), jnp.asarray(lens), tables, 512,
                       interpret=True)
    np.testing.assert_array_equal(np.asarray(bx), np.asarray(bp))
    np.testing.assert_array_equal(np.asarray(wx).astype(np.uint32),
                                  np.asarray(wp))


def test_pallas_lane_decode_lanemajor_interpret():
    """lane_decode_lanemajor (the fat-lane whole-file variant) must be
    bit-exact with the XLA decoder on its target geometry: one chunk,
    few fat lanes, re-batched across the chunk axis."""
    from huffman_codec_tpu.ops.pallas_kernels import (
        lane_decode_lanemajor, lane_words_cap)

    lane = 2048  # fat-lane shape kept small for interpret-mode speed
    data = RNG.integers(0, 200, 6 * lane, dtype=np.uint8)
    data[3000:7000] = 9
    n = 5 * lane + 321  # partial final lane
    L = 8 * lane
    mat = jnp.zeros((1, L), jnp.uint8).at[0, :data.size].set(
        jnp.asarray(data))
    lens = jnp.asarray(np.array([n], np.int32))
    buf, lane_words, tables = canonical_encode_batch(mat, lens, lane=lane)
    words = _to_wire(buf, lane_words)
    ref = np.asarray(canonical_decode_batch(words, tables, lane_words, lens,
                                            lane=lane, out_len=L))
    Wl = lane_words_cap(lane)
    got = np.asarray(lane_decode_lanemajor(
        words.reshape(1, 8, Wl), tables, lens, lane=lane, interpret=True))
    np.testing.assert_array_equal(got[0][:n], ref[0][:n])
    # re-batched layout (2 pseudo-chunks x 4 lanes) decodes identically
    lw2 = np.asarray(lane_words).reshape(2, 4)
    t2 = np.tile(np.asarray(tables), (2, 1))
    l2 = np.clip(n - np.arange(2) * (L // 2), 0, L // 2).astype(np.int32)
    got2 = np.asarray(lane_decode_lanemajor(
        words.reshape(2, 4, Wl), jnp.asarray(t2), jnp.asarray(l2),
        lane=lane, interpret=True)).reshape(-1)
    np.testing.assert_array_equal(got2[:n], ref[0][:n])
