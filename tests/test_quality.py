"""Compression-quality guard: ours vs the reference's measured compressed
sizes (BASELINE.md §B), ALL 12 corpus files x ALL 4 pipeline configs — the
north-star bound, STRICT ``ours <= ref`` on every cell, no exceptions.

Small/gradient-heavy payloads, where the v3 container's fixed costs or its
static tables would lose to the reference's 9-byte header + per-symbol FGK
adaptation, are covered by the encoder's v1-profile finalist
(models/chunked.py _race_v1): the bit-exact v1 encoder ties the reference
byte-for-byte there, so no cell can exceed it."""

import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from huffman_codec_tpu.models import CodecConfig, TPUCodec  # noqa: E402

DATA = pathlib.Path("/root/reference/data")

# quality cells split across two modules so the xdist loadfile scheduler
# runs the suite's longest pole on both workers (test_quality_b.py has
# the other half)
_SPLIT_A = ['df1h.raw', 'df1hvx.raw', 'df1v.raw', 'hd01.raw', 'hd01double.raw', 'hd01extra.raw']


_CELLS_SINCE_CLEAR = [0]


@pytest.fixture(autouse=True)
def _clear_caches_every_8_cells():
    """test_quality compiles 48 distinct heavy shapes in one process —
    enough to cross the XLA:CPU compiled-executable crash threshold
    (conftest.py) even with the per-module clear. Clearing every 8 cells
    keeps the executable count well under the threshold without paying
    full recompiles on shared subroutines for every cell."""
    yield
    _CELLS_SINCE_CLEAR[0] += 1
    if _CELLS_SINCE_CLEAR[0] % 8 == 0:
        jax.clear_caches()

# reference compressed bytes measured on this machine (BASELINE.md §B);
# columns: static, -m, -a, -a -m
REF = {
    "df1h.raw": (262536, 648, 3931, 662),
    "df1hvx.raw": (80254, 33499, 54436, 16786),
    "df1v.raw": (3906, 975, 3947, 658),
    "hd01.raw": (100357, 88113, 99492, 87901),
    "hd01double.raw": (200325, 175866, 198585, 175428),
    "hd01extra.raw": (100395, 88134, 99531, 87921),
    "hd02.raw": (95543, 86556, 94757, 86593),
    "hd07.raw": (157708, 109682, 156921, 108930),
    "hd08.raw": (113784, 98692, 112142, 98643),
    "hd09.raw": (217967, 152382, 215665, 151875),
    "hd12.raw": (178002, 126773, 176367, 125762),
    "nk01.raw": (212556, 198352, 212377, 198357),
}
CONFIGS = [  # (column index, use_diff, use_adapt)
    (0, False, False),
    (1, True, False),
    (2, False, True),
    (3, True, True),
]


@pytest.mark.parametrize("col,use_diff,use_adapt", CONFIGS,
                         ids=["static", "m", "a", "am"])
@pytest.mark.parametrize("name", sorted(n for n in REF if n in _SPLIT_A))
def test_v3_size_vs_reference(name, col, use_diff, use_adapt):
    raw = (DATA / name).read_bytes()
    codec = TPUCodec(CodecConfig(use_diff=use_diff, use_adapt=use_adapt,
                                 chunk_size=65536))
    blob = codec.encode(raw)
    ref = REF[name][col]
    assert len(blob) <= ref, (name, col, len(blob), ref)
    assert codec.decode(blob) == raw


def test_incompressible_expansion_bounded():
    raw = np.random.default_rng(0).integers(
        0, 256, 1 << 16, dtype=np.uint8).tobytes()
    codec = TPUCodec(CodecConfig(use_diff=True, chunk_size=65536))
    blob = codec.encode(raw)
    # random bytes: ~8 bpc + container overhead must stay small
    assert len(blob) <= len(raw) * 1.40
    assert codec.decode(blob) == raw
