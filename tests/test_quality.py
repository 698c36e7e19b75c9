"""Compression-quality guard: ours vs the reference's measured compressed
sizes, ALL 12 corpus files x ALL 4 pipeline configs — the north-star bound,
STRICT ``ours <= ref`` on every cell, no exceptions.

Small/gradient-heavy payloads, where the v3 container's fixed costs or its
static tables would lose to the reference's 9-byte header + per-symbol FGK
adaptation, are covered by the encoder's v1-profile finalist
(models/chunked.py _race_v1): the bit-exact v1 encoder ties the reference
byte-for-byte there, so no cell can exceed it.

Suite-time design (VERDICT r4 #7 — the matrix was the 28-minute pole):

- hd01.raw runs FULL SIZE and pins the exact BASELINE.md §B numbers (the
  flagship anchor); every other file runs a 256-row slice (hd01extra:
  251 rows, preserving its height-not-divisible-by-8 edge-case role;
  hd01double stays non-square at 256x512) whose expected sizes were
  measured from the compiled oracle with verified round-trips.
- ONE module (not the r4 A/B split): two workers each compiling the
  same (shape family x config) sets doubled the XLA:CPU compile work
  that dominates the wall time.
- cells run FAMILY-MAJOR (all 131072-byte slices, then hd01, then
  hd01extra) and the crash-mitigation `jax.clear_caches()` (conftest)
  fires only at family BOUNDARIES — a fixed every-N clear kept wiping
  the shared family mid-run, recharging ~2 min of compiles per cell.
"""

import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from huffman_codec_tpu.models import CodecConfig, TPUCodec  # noqa: E402

DATA = pathlib.Path("/root/reference/data")

# reference compressed bytes: hd01.raw measured on the FULL file
# (BASELINE.md §B); all others measured from the compiled oracle on the
# sliced inputs (row counts below), round-trips verified.
# columns: rows, (static, -m, -a, -a -m)
REF = {
    "df1h.raw": (256, (131400, 330, 2057, 343)),
    "df1hvx.raw": (256, (30755, 16286, 27187, 8114)),
    "df1v.raw": (256, (2081, 495, 2083, 340)),
    "hd01.raw": (512, (100357, 88113, 99492, 87901)),
    "hd01double.raw": (256, (48519, 43467, 48433, 43749)),
    "hd01extra.raw": (251, (46977, 42155, 46898, 42269)),
    "hd02.raw": (256, (47392, 44210, 47221, 44263)),
    "hd07.raw": (256, (78181, 55156, 78061, 54838)),
    "hd08.raw": (256, (43261, 36383, 42879, 36637)),
    "hd09.raw": (256, (115134, 80466, 113780, 80162)),
    "hd12.raw": (256, (86408, 64198, 85630, 63723)),
    "nk01.raw": (256, (108055, 99778, 107852, 99772)),
}
CONFIGS = [  # (column index, use_diff, use_adapt)
    (0, False, False),
    (1, True, False),
    (2, False, True),
    (3, True, True),
]

# family-major cell order: same input shape -> consecutive cells share
# every compiled executable; the clear fixture fires on family change
_FAMILY_ORDER = sorted(REF, key=lambda n: (REF[n][0], n))
CELLS = [(name, col, d, a)
         for name in _FAMILY_ORDER
         for (col, d, a) in CONFIGS]

_LAST_FAMILY = [None]


@pytest.fixture(autouse=True)
def _clear_caches_on_family_change(request):
    """XLA:CPU segfaults once a process accumulates enough compiled
    executables (conftest.py). Clearing between shape FAMILIES (not on a
    fixed cell count) keeps the executable window to one family's
    compile set while never wiping a family that later cells still
    need."""
    name = request.node.callspec.params.get("name") if hasattr(
        request.node, "callspec") else None
    fam = REF[name][0] if name in REF else None
    if fam is not None and _LAST_FAMILY[0] not in (None, fam):
        jax.clear_caches()
    if fam is not None:
        _LAST_FAMILY[0] = fam
    yield


def _cell_input(name: str) -> bytes:
    rows = REF[name][0]
    return (DATA / name).read_bytes()[: rows * 512]


def test_incompressible_expansion_bounded():
    # defined FIRST so it runs before the matrix and pre-warms the
    # 131072-byte `-m` compile set instead of adding its own family
    raw = np.random.default_rng(0).integers(
        0, 256, 1 << 17, dtype=np.uint8).tobytes()
    codec = TPUCodec(CodecConfig(use_diff=True, chunk_size=65536))
    blob = codec.encode(raw)
    # random bytes: ~8 bpc + container overhead must stay small
    assert len(blob) <= len(raw) * 1.40
    assert codec.decode(blob) == raw


@pytest.mark.parametrize(
    "name,col,use_diff,use_adapt", CELLS,
    ids=[f"{n}-{'static m a am'.split()[c]}" for n, c, _, _ in CELLS])
def test_v3_size_vs_reference(name, col, use_diff, use_adapt):
    raw = _cell_input(name)
    codec = TPUCodec(CodecConfig(use_diff=use_diff, use_adapt=use_adapt,
                                 chunk_size=65536))
    blob = codec.encode(raw)
    ref = REF[name][1][col]
    assert len(blob) <= ref, (name, col, len(blob), ref)
    assert codec.decode(blob) == raw
