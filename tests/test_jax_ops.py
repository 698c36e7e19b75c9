"""JAX device ops vs the scalar pyref / native oracle implementations."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from huffman_codec_tpu.ops import (  # noqa: E402
    diff_apply,
    diff_revert,
    rle_decode,
    rle_encode,
    rle_encoded_size,
    rle_max_encoded_len,
)
from huffman_codec_tpu.pyref import rle as pyrle  # noqa: E402

RNG = np.random.default_rng(7)


def _runny(n, alphabet=4, run=12):
    """Run-heavy random bytes — stresses every RLE rule."""
    out = []
    while sum(map(len, out)) < n:
        out.append([int(RNG.integers(alphabet))] * int(RNG.integers(1, run)))
    return bytes([b for r in out for b in r])[:n]


EDGE_CASES = [
    b"",
    b"A",
    b"AB",
    b"AAA",
    b"AAAA",
    b"AAAAA",
    b"A" * 258,
    b"A" * 259,
    b"A" * 260,
    b"A" * 262,
    b"A" * 516,
    b"A" * 517,
    b"XYZ" + b"A" * 258 + b"Q",
    b"XYZ" + b"A" * 516,
    b"ABBB",
    b"ABBBB",
    b"AAABBB",
    b"\x00" * 1000,
    bytes(range(256)) * 3,
]


@pytest.mark.parametrize("data", EDGE_CASES, ids=range(len(EDGE_CASES)))
def test_rle_encode_matches_pyref(data):
    expect = pyrle.rle_encode(data)
    x = jnp.asarray(np.frombuffer(data, np.uint8))
    out, n = rle_encode(x)
    got = bytes(np.asarray(out)[: int(n)])
    assert got == expect
    assert int(rle_encoded_size(x, len(data))) == len(expect)


@pytest.mark.parametrize("data", EDGE_CASES, ids=range(len(EDGE_CASES)))
def test_rle_decode_matches_pyref(data):
    enc = pyrle.rle_encode(data)
    if not enc:
        return
    out_len = max(1, len(data))
    y = jnp.asarray(np.frombuffer(enc, np.uint8))
    out, n = rle_decode(y, out_len=out_len, block=16)
    assert bytes(np.asarray(out)[: int(n)]) == data


@pytest.mark.parametrize("n", [1, 5, 100, 1000, 10_000])
def test_rle_roundtrip_random(n):
    data = _runny(n)
    expect = pyrle.rle_encode(data)
    x = jnp.asarray(np.frombuffer(data, np.uint8))
    out, m = rle_encode(x)
    got = bytes(np.asarray(out)[: int(m)])
    assert got == expect
    dec, k = rle_decode(jnp.asarray(np.frombuffer(got, np.uint8)),
                        out_len=rle_max_decoded(len(got), n))
    assert bytes(np.asarray(dec)[: int(k)]) == data


def rle_max_decoded(enc_len, hint):
    return max(hint + 8, enc_len)


def test_rle_padded_lengths():
    """Ops must honor the true length, ignoring buffer padding."""
    data = b"AAAAABBB"
    x = jnp.zeros(64, jnp.uint8).at[: len(data)].set(
        jnp.asarray(np.frombuffer(data, np.uint8)))
    out, n = rle_encode(x, length=len(data))
    assert bytes(np.asarray(out)[: int(n)]) == pyrle.rle_encode(data)


def test_rle_decode_block_boundary_runs():
    """Runs spanning FSM block boundaries at every alignment."""
    for shift in range(9):
        data = bytes([1] * shift) + b"\x07" * 700 + bytes([2, 3]) + b"\x07" * 300
        enc = pyrle.rle_encode(data)
        y = jnp.asarray(np.frombuffer(enc, np.uint8))
        out, n = rle_decode(y, out_len=len(data) + 8, block=8)
        assert bytes(np.asarray(out)[: int(n)]) == data, shift


def test_diff_roundtrip():
    data = np.frombuffer(_runny(4096, alphabet=256), np.uint8)
    x = jnp.asarray(data)
    d = diff_apply(x)
    expect = (data - np.roll(data, 1)).astype(np.uint8)
    expect[0] = data[0]
    np.testing.assert_array_equal(np.asarray(d), expect)
    np.testing.assert_array_equal(np.asarray(diff_revert(d)), data)


def test_diff_carry_chaining():
    """Sharded diff: chunk boundaries carry one byte (SURVEY.md §5)."""
    data = np.frombuffer(_runny(1024, alphabet=256), np.uint8)
    whole = np.asarray(diff_apply(jnp.asarray(data)))
    a, b = data[:500], data[500:]
    da = np.asarray(diff_apply(jnp.asarray(a)))
    db = np.asarray(diff_apply(jnp.asarray(b), carry_in=int(a[-1])))
    np.testing.assert_array_equal(np.concatenate([da, db]), whole)
    ra = np.asarray(diff_revert(jnp.asarray(da)))
    rb = np.asarray(diff_revert(jnp.asarray(db), carry_in=int(ra[-1])))
    np.testing.assert_array_equal(np.concatenate([ra, rb]), data)
