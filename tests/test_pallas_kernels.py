"""Pallas kernels vs their XLA formulations (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from huffman_codec_tpu.ops.canonical import histogram  # noqa: E402
from huffman_codec_tpu.ops.pallas_kernels import histogram256  # noqa: E402

RNG = np.random.default_rng(9)


@pytest.mark.parametrize("C,L", [(1, 2048), (3, 4096), (2, 65536)])
def test_histogram256_matches_xla(C, L):
    data = jnp.asarray(RNG.integers(0, 256, (C, L), dtype=np.uint8))
    lens = jnp.asarray(
        np.r_[[L], RNG.integers(0, L, C - 1)].astype(np.int32)
        if C > 1 else np.array([L - 5], np.int32))
    got = histogram256(data, lens, interpret=True)
    expect = histogram(data, lens)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


def test_histogram256_skewed():
    data = jnp.asarray(np.zeros((2, 2048), np.uint8))
    lens = jnp.asarray(np.array([2048, 100], np.int32))
    got = np.asarray(histogram256(data, lens, interpret=True))
    assert got[0, 0] == 2048 and got[1, 0] == 100
    assert got[:, 1:].sum() == 0


# ---------------------------------------------------------------------------
# fused diff + RLE encode kernel (the production TPU encode path,
# models/chunked.py:_encode_sharded_stage) vs the XLA formulation
# ---------------------------------------------------------------------------

from huffman_codec_tpu.ops.diff import diff_apply  # noqa: E402
from huffman_codec_tpu.ops.pallas_kernels import (  # noqa: E402
    rle_diff_encode_fused,
)
from huffman_codec_tpu.ops.rle import (  # noqa: E402
    rle_encode,
    rle_max_encoded_len,
)

import sys as _sys
import pathlib as _pl

_sys.path.insert(0, str(_pl.Path(__file__).parent))
from test_jax_ops import EDGE_CASES  # noqa: E402


def _xla_ref(chunks, lens, carries, use_diff, cap):
    """Per-chunk diff (carry-seeded) + rle_encode — the XLA branch the
    fused kernel claims bit-exactness with (chunked.py:257-263)."""
    if use_diff:
        prev = jnp.concatenate([carries[:, None], chunks[:, :-1]], axis=1)
        work = (chunks - prev).astype(jnp.uint8)
    else:
        work = chunks
    enc = jax.vmap(lambda x, l: rle_encode(x, l, out_len=cap))
    return enc(work, lens)


def _run_fused_case(rows, n, use_diff):
    """rows: list of (bytes, carry) padded into an (C, n) chunk batch."""
    C = len(rows)
    cap = -(-rle_max_encoded_len(n) // 128) * 128
    chunks = np.zeros((C, n), np.uint8)
    lens = np.zeros((C,), np.int32)
    carries = np.zeros((C,), np.uint8)
    for i, (data, carry) in enumerate(rows):
        chunks[i, : len(data)] = np.frombuffer(data, np.uint8)
        lens[i] = len(data)
        carries[i] = carry
    got_s, got_n = rle_diff_encode_fused(
        jnp.asarray(chunks), jnp.asarray(lens), jnp.asarray(carries),
        use_diff, cap, interpret=True)
    exp_s, exp_n = _xla_ref(jnp.asarray(chunks), jnp.asarray(lens),
                            jnp.asarray(carries), use_diff, cap)
    np.testing.assert_array_equal(np.asarray(got_n), np.asarray(exp_n))
    gs, es = np.asarray(got_s), np.asarray(exp_s)
    for i in range(C):
        np.testing.assert_array_equal(gs[i, : int(exp_n[i])],
                                      es[i, : int(exp_n[i])],
                                      err_msg=f"row {i}")


@pytest.mark.parametrize("use_diff", [False, True])
def test_fused_rle_edge_cases(use_diff):
    # the test_jax_ops edge corpus, batched 4 rows at a time with mixed
    # carries and short tails (length < n)
    rows = [(d, c) for d, c in zip(EDGE_CASES, [0, 1, 65, 255] * 5)]
    for i in range(0, len(rows), 4):
        batch = rows[i : i + 4]
        n = max(128, -(-max(len(d) for d, _ in batch) // 128) * 128)
        _run_fused_case(batch, n, use_diff)


@pytest.mark.parametrize("use_diff", [False, True])
def test_fused_rle_chunk_boundary_carries(use_diff):
    # split one stream across chunks: each chunk's carry is the previous
    # chunk's last byte — exactly how _encode_sharded_stage seeds the rows
    stream = bytes(
        np.asarray(RNG.integers(0, 4, 2048), np.uint8)) + b"Z" * 300
    n = 512
    rows = []
    for lo in range(0, len(stream), n):
        carry = stream[lo - 1] if lo else 0
        rows.append((stream[lo : lo + n], carry))
    _run_fused_case(rows, n, use_diff)


def test_fused_rle_long_run_past_mod258_domain():
    # a single 70000-byte run makes (i - segment_start) exceed 66048, the
    # round-3 _mod258 chain's exactness bound — the chain must extend with
    # the static chunk size (ADVICE r3 medium #1)
    n = 128 * 1024
    data = b"A" * 70000 + b"BC" * 1000
    _run_fused_case([(data, 0)], n, False)


def test_fused_rle_run_ending_at_length():
    # runs that end exactly at the valid length (the forced last-byte
    # literal, transform.cpp:252) for lengths not on a lane boundary
    for ln in (1, 2, 3, 127, 128, 129, 258, 259, 260, 300):
        data = b"A" * ln
        _run_fused_case([(data, 0)], 512, True)


@pytest.mark.parametrize("tile", [64, 256])
def test_fused_rle_tiled_equals_per_tile_encode(tile):
    # tile mode == per-tile rle_encode concatenated in order (the adaptive
    # band-stage contract, chunked.py _encode_sharded_adapt_stage):
    # runs crossing tile boundaries restart, every tile's last byte is a
    # forced literal, and in-chunk offsets concatenate the tile streams
    n = 1024
    cap = -(-rle_max_encoded_len(n) // 128) * 128
    data = np.concatenate([
        np.asarray(RNG.integers(0, 3, n // 2), np.uint8),
        np.full((n // 2,), 7, np.uint8),  # one run spanning many tiles
    ])
    chunks = data[None, :]
    got_s, got_n = rle_diff_encode_fused(
        jnp.asarray(chunks), jnp.full((1,), n, jnp.int32),
        jnp.zeros((1,), jnp.uint8), False, cap, interpret=True, tile=tile)
    parts = []
    for t0 in range(0, n, tile):
        s, ln = rle_encode(jnp.asarray(data[t0:t0 + tile]),
                           jnp.int32(tile))
        parts.append(np.asarray(s)[: int(ln)])
    exp = np.concatenate(parts)
    assert int(got_n[0]) == len(exp)
    np.testing.assert_array_equal(np.asarray(got_s)[0, : len(exp)], exp)


# ---------------------------------------------------------------------------
# fused RLE expansion (+ diff revert) kernel — the production TPU decode
# tail (models/chunked.py:_decode_sharded_tail) vs the XLA formulation
# ---------------------------------------------------------------------------

from huffman_codec_tpu.ops.diff import diff_revert  # noqa: E402
from huffman_codec_tpu.ops.pallas_kernels import rle_expand  # noqa: E402
from huffman_codec_tpu.ops.rle import rle_classify, rle_decode  # noqa: E402


def _expand_case(rows, n, out_len, use_diff):
    from huffman_codec_tpu.pyref import rle as pyrle

    C = len(rows)
    streams = np.zeros((C, n), np.uint8)
    lens = np.zeros((C,), np.int32)
    carries = (np.arange(C) * 37 % 256).astype(np.uint8)
    for i, row in enumerate(rows):
        enc = pyrle.rle_encode(row)
        assert len(enc) <= n
        streams[i, : len(enc)] = np.frombuffer(enc, np.uint8)
        lens[i] = len(enc)
    sd, ld, cd = (jnp.asarray(streams), jnp.asarray(lens),
                  jnp.asarray(carries))
    ic = jax.vmap(lambda s, l: rle_classify(s, l))(sd, ld)
    got = np.asarray(rle_expand(sd, ic, ld, cd, out_len, use_diff,
                                interpret=True))
    exp = np.asarray(jax.vmap(
        lambda s, l: rle_decode(s, l, out_len=out_len)[0])(sd, ld))
    if use_diff:
        exp = np.asarray(jax.vmap(diff_revert)(jnp.asarray(exp), cd))
    for i, row in enumerate(rows):
        np.testing.assert_array_equal(got[i][: len(row)],
                                      exp[i][: len(row)], err_msg=f"row {i}")


@pytest.mark.parametrize("use_diff", [False, True])
def test_rle_expand_edge_cases(use_diff):
    rows = [r for r in EDGE_CASES if len(r)]
    for i in range(0, len(rows), 4):
        batch = rows[i : i + 4]
        out_len = max(128, -(-max(len(r) for r in batch) // 128) * 128)
        _expand_case(batch, 2 * out_len, out_len, use_diff)


def test_rle_expand_long_runs_and_mixed():
    data = (b"A" * 700 + bytes(RNG.integers(0, 3, 900, dtype=np.uint8))
            + b"\xff" * 600)
    _expand_case([data], 4096, 2304, True)


# ---------------------------------------------------------------------------
# repad kernel (wire payload -> padded fixed-stride lane layout)
# ---------------------------------------------------------------------------

from huffman_codec_tpu.models.chunked import _repad_words  # noqa: E402
from huffman_codec_tpu.ops.pallas_kernels import repad_words  # noqa: E402


def test_repad_words_interpret_matches_xla_spread():
    rng = np.random.default_rng(31)
    C, nl, wb = 3, 16, 8
    lw = rng.integers(0, wb + 1, (C, nl)).astype(np.int32)
    lw[1, 5:] = 0  # zero tail lanes (short chunk)
    wc = lw.sum(1)
    rows_per = (wc + 127) // 128
    aoff = np.zeros(C, np.int64)
    aoff[1:] = np.cumsum(rows_per)[:-1]
    dense = np.zeros(16 * 128, np.uint32)
    parts = []
    for c in range(C):
        w = rng.integers(1, 2**31, wc[c], dtype=np.int64).astype(np.uint32)
        dense[int(aoff[c]) * 128: int(aoff[c]) * 128 + wc[c]] = w
        parts.append(w)
    got = np.asarray(repad_words(
        jnp.asarray(dense.reshape(16, 128)),
        jnp.asarray(aoff.astype(np.int32)),
        jnp.asarray(wc.astype(np.int32)), jnp.asarray(lw), nl, wb,
        interpret=True))
    flat = np.concatenate(parts)
    fp = np.zeros(1024, np.uint32)
    fp[: flat.size] = flat
    exp = np.asarray(_repad_words(jnp.asarray(fp), jnp.asarray(lw), nl, wb))
    # padding slots are unspecified in both formulations; compare REAL
    col = np.arange(wb)
    mask = (col[None, None, :] < lw[:, :, None]).reshape(C, nl * wb)
    np.testing.assert_array_equal(got[mask], exp[mask])
