"""Second half of the quality matrix — see test_quality.py (the split
lets pytest-xdist run the suite's longest pole on both workers)."""

import pathlib
import sys

import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from test_quality import (  # noqa: E402
    CONFIGS,
    DATA,
    REF,
    _SPLIT_A,
    CodecConfig,
    TPUCodec,
)


@pytest.fixture(autouse=True)
def _clear_caches_every_8_cells():
    from test_quality import _CELLS_SINCE_CLEAR
    yield
    _CELLS_SINCE_CLEAR[0] += 1
    if _CELLS_SINCE_CLEAR[0] % 8 == 0:
        jax.clear_caches()


@pytest.mark.parametrize("col,use_diff,use_adapt", CONFIGS,
                         ids=["static", "m", "a", "am"])
@pytest.mark.parametrize(
    "name", sorted(n for n in REF if n not in _SPLIT_A))
def test_v3_size_vs_reference_b(name, col, use_diff, use_adapt):
    raw = (DATA / name).read_bytes()
    codec = TPUCodec(CodecConfig(use_diff=use_diff, use_adapt=use_adapt,
                                 chunk_size=65536))
    blob = codec.encode(raw)
    ref = REF[name][col]
    assert len(blob) <= ref, (name, col, len(blob), ref)
    assert codec.decode(blob) == raw
