"""Batched JAX FGK vs the scalar pyref model — bit-exact code streams."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from huffman_codec_tpu.ops.fgk import (  # noqa: E402
    fgk_decode_chunk,
    fgk_encode_batch,
    fgk_encode_chunk,
    max_code_bits,
)
from huffman_codec_tpu.ops.pack import bytes_to_words, words_to_bytes  # noqa: E402
from huffman_codec_tpu.pyref import fgk as pyfgk  # noqa: E402

RNG = np.random.default_rng(11)


def _pyref_bytes(data: bytes) -> tuple[bytes, int]:
    bits = pyfgk.fgk_encode(data)
    nbits = len(bits)
    acc = bytearray()
    cur = 0
    for i, b in enumerate(bits):
        cur = (cur << 1) | b
        if i % 8 == 7:
            acc.append(cur)
            cur = 0
    if nbits % 8:
        acc.append(cur << (8 - nbits % 8))
    return bytes(acc), nbits


CASES = [
    b"",
    b"a",
    b"ab",
    b"aab",
    b"abracadabra",
    b"aaaaaaaabbbbcccd" * 4,
    bytes(RNG.integers(0, 4, 200, dtype=np.uint8)),
    bytes(RNG.integers(0, 256, 300, dtype=np.uint8)),
    bytes(range(256)),
    bytes(RNG.integers(0, 256, 1000, dtype=np.uint8)),
]


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_encode_bit_exact_vs_pyref(data):
    expect, expect_bits = _pyref_bytes(data)
    L = max(8, len(data))
    n_words = (L * max_code_bits(L) + 31) // 32 + 2
    x = jnp.zeros((L,), jnp.uint8).at[: len(data)].set(
        jnp.asarray(np.frombuffer(data, np.uint8)))
    words, bits = fgk_encode_chunk(x, jnp.int32(len(data)), n_words)
    assert int(bits) == expect_bits
    nbytes = (int(bits) + 7) // 8
    got = bytes(np.asarray(words_to_bytes(words, max(1, nbytes)))[:nbytes])
    assert got == expect


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_decode_roundtrip(data):
    L = max(8, len(data))
    n_words = (L * max_code_bits(L) + 31) // 32 + 2
    x = jnp.zeros((L,), jnp.uint8).at[: len(data)].set(
        jnp.asarray(np.frombuffer(data, np.uint8)))
    words, bits = fgk_encode_chunk(x, jnp.int32(len(data)), n_words)
    out = fgk_decode_chunk(words, jnp.int32(len(data)), out_len=L)
    assert bytes(np.asarray(out)[: len(data)]) == data


def test_decode_oracle_stream():
    """Decode a stream produced by the pyref encoder (cross-impl)."""
    data = bytes(RNG.integers(0, 16, 400, dtype=np.uint8))
    enc, nbits = _pyref_bytes(data)
    n_words = (len(enc) + 3) // 4
    words = bytes_to_words(jnp.asarray(np.frombuffer(enc, np.uint8)), n_words)
    out = fgk_decode_chunk(words, jnp.int32(len(data)), out_len=len(data))
    assert bytes(np.asarray(out)) == data


def test_batched_chunks_match_streamwise():
    """vmap'd batch == independent per-chunk encodes (v2 semantics)."""
    chunks = [bytes(RNG.integers(0, 64, int(n), dtype=np.uint8))
              for n in (128, 57, 128, 1)]
    L = 128
    n_words = (L * max_code_bits(L) + 31) // 32 + 2
    mat = np.zeros((len(chunks), L), np.uint8)
    lens = np.array([len(c) for c in chunks], np.int32)
    for i, c in enumerate(chunks):
        mat[i, : len(c)] = np.frombuffer(c, np.uint8)
    words, bits = fgk_encode_batch(jnp.asarray(mat), jnp.asarray(lens), n_words)
    for i, c in enumerate(chunks):
        expect, expect_bits = _pyref_bytes(c)
        assert int(bits[i]) == expect_bits
        nb = (int(bits[i]) + 7) // 8
        got = bytes(np.asarray(words_to_bytes(words[i], max(1, nb)))[:nb])
        assert got == expect
