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
