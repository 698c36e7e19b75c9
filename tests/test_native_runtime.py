"""Differential matrix: native C++ runtime vs the reference oracle.

The primary correctness gate (SURVEY.md §4): over the full reference corpus
and all 4 pipeline configs,
  (a) our v1 output is byte-identical to the oracle's,
  (b) we decode the oracle's files,
  (c) the oracle decodes our files,
  (d) round-trips are bit-exact,
and the v2 chunked container self-round-trips at every chunk size.
"""

import subprocess

import pytest

from huffman_codec_tpu import native, pyref

CONFIGS = [
    ("static", [], dict()),
    ("model", ["-m"], dict(use_diff=True)),
    ("adapt", ["-a"], dict(use_adapt=True)),
    ("adapt_model", ["-a", "-m"], dict(use_diff=True, use_adapt=True)),
]


@pytest.fixture(scope="module")
def corpus_data(corpus):
    return {p.name: p.read_bytes() for p in corpus}


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_full_corpus_matrix(oracle, corpus, corpus_data, tmp_path, cfg):
    _, flags, kw = cfg
    for path in corpus:
        data = corpus_data[path.name]
        inp = tmp_path / "in.raw"
        ref_out = tmp_path / "ref.bin"
        inp.write_bytes(data)
        subprocess.run(
            [str(oracle), "-c", *flags, "-i", str(inp), "-o", str(ref_out)],
            check=True, capture_output=True,
        )
        ref = ref_out.read_bytes()

        ours = native.v1_compress(data, **kw)
        assert ours == ref, f"{path.name} {flags}: size {len(ours)} vs {len(ref)}"
        assert native.v1_decompress(ref) == data
        # oracle decodes our bytes
        mine = tmp_path / "mine.bin"
        dec = tmp_path / "dec.raw"
        mine.write_bytes(ours)
        subprocess.run(
            [str(oracle), "-d", "-i", str(mine), "-o", str(dec)],
            check=True, capture_output=True,
        )
        assert dec.read_bytes() == data


def test_exact_dfs_mode_agrees(corpus_data):
    data = corpus_data["hd01.raw"][: 512 * 64]
    fast = native.v1_compress(data, use_diff=True)
    exact = native.v1_compress(data, use_diff=True, exact=True)
    assert fast == exact
    assert native.v1_decompress(fast, exact=True) == data


@pytest.mark.parametrize("chunk_size", [256, 4096, 65536, 1 << 20])
def test_v2_roundtrip(corpus_data, chunk_size):
    data = corpus_data["hd02.raw"]
    for kw in (dict(), dict(use_diff=True), dict(use_diff=True, use_adapt=True)):
        blob = native.v2_compress(data, chunk_size=chunk_size, **kw)
        assert native.v2_decompress(blob) == data


def test_v2_empty_and_tiny():
    assert native.v2_decompress(native.v2_compress(b"")) == b""
    assert native.v2_decompress(native.v2_compress(b"x")) == b"x"
    assert native.v2_decompress(native.v2_compress(b"ab" * 5000,
                                                   chunk_size=100)) == b"ab" * 5000


def test_v2_overhead_is_small(corpus_data):
    data = corpus_data["hd01.raw"]
    v1 = native.v1_compress(data, use_diff=True)
    v2 = native.v2_compress(data, use_diff=True, chunk_size=65536)
    assert len(v2) < len(v1) * 1.02  # <2% container+tree-restart overhead


def test_native_matches_pyref_small():
    data = b"the quick brown fox" * 20
    for kw in (dict(), dict(use_diff=True)):
        assert native.v1_compress(data, **kw) == pyref.compress(bytes(data), **kw)


def test_error_codes():
    with pytest.raises(native.NativeError) as e:
        native.v1_decompress(b"\x00\x01")
    assert e.value.code == 8
    with pytest.raises(native.NativeError) as e:
        native.v1_decompress((10).to_bytes(8, "little") + b"\x00")
    assert e.value.code == 9
    with pytest.raises(native.NativeError) as e:
        native.v1_compress(b"x" * 100, use_adapt=True, width=512)
    assert e.value.code == 6
    with pytest.raises(native.NativeError) as e:
        native.v1_compress(b"x" * 512 * 4, use_adapt=True, width=512)
    assert e.value.code == 12
    with pytest.raises(native.NativeError) as e:
        native.v2_decompress(b"NOTAV2FILE" + bytes(30))
    assert e.value.code == 40


def test_rle_primitives():
    data = b"A" * 516 + b"xyz"
    enc = native.rle_encode(data)
    assert enc == bytes(pyref.rle_encode(data))
    assert native.rle_decode(enc) == data
