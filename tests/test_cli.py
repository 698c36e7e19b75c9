"""CLI parity: flags, defaults, stderr contract, exit codes vs the oracle."""

import os
import pathlib
import subprocess
import sys

import pytest

PY = [sys.executable, "-m", "huffman_codec_tpu"]
REPO = str(pathlib.Path(__file__).resolve().parent.parent)


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(PY + args, capture_output=True, cwd=cwd, text=False,
                          env=env)


@pytest.fixture()
def sample(tmp_path):
    p = tmp_path / "in.raw"
    p.write_bytes(bytes(range(256)) * 8)
    return p


def test_roundtrip_default_output(tmp_path, sample):
    r = run_cli(["-c", "-i", str(sample)], cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    out = tmp_path / "b.out"  # default path (main.cpp:160)
    assert out.exists()
    assert b"writing" in r.stderr and b"b.out" in r.stderr
    r = run_cli(["-d", "-i", str(out), "-o", str(tmp_path / "dec.bin")],
                cwd=tmp_path)
    assert r.returncode == 0
    assert (tmp_path / "dec.bin").read_bytes() == sample.read_bytes()


def test_later_flags_override(tmp_path, sample):
    """-c -d == decompress (main.cpp getopt loop semantics)."""
    c = run_cli(["-c", "-m", "-i", str(sample), "-o", str(tmp_path / "c.bin")],
                cwd=tmp_path)
    assert c.returncode == 0
    r = run_cli(["-c", "-d", "-i", str(tmp_path / "c.bin"),
                 "-o", str(tmp_path / "d.bin")], cwd=tmp_path)
    assert r.returncode == 0
    assert (tmp_path / "d.bin").read_bytes() == sample.read_bytes()


def test_exit_codes(tmp_path, sample):
    # 1: missing option argument
    assert run_cli(["-i"], cwd=tmp_path).returncode == 1
    # 2: unknown option
    assert run_cli(["-x"], cwd=tmp_path).returncode == 2
    # 3: no input path
    assert run_cli(["-c"], cwd=tmp_path).returncode == 3
    # 4: zero width with compression
    assert run_cli(["-c", "-w", "0", "-i", str(sample)],
                   cwd=tmp_path).returncode == 4
    # 5: unreadable input
    assert run_cli(["-c", "-i", str(tmp_path / "nope")],
                   cwd=tmp_path).returncode == 5
    # 6: size % width != 0 with -a
    odd = tmp_path / "odd.bin"
    odd.write_bytes(b"x" * 100)
    assert run_cli(["-c", "-a", "-w", "512", "-i", str(odd)],
                   cwd=tmp_path).returncode == 6
    # 8: truncated huffman header
    short = tmp_path / "short.bin"
    short.write_bytes(b"abc")
    assert run_cli(["-d", "-i", str(short)], cwd=tmp_path).returncode == 8
    # 9: bitstream underrun
    bad = tmp_path / "bad.bin"
    bad.write_bytes(bytes([255, 0, 0, 0, 0, 0, 0, 0, 0, 0]))
    assert run_cli(["-d", "-i", str(bad)], cwd=tmp_path).returncode == 9
    # 12: too small matrix with -a
    tiny = tmp_path / "tiny.bin"
    tiny.write_bytes(b"x" * 12)
    assert run_cli(["-c", "-a", "-w", "4", "-i", str(tiny)],
                   cwd=tmp_path).returncode == 12


def test_help():
    r = subprocess.run(PY + ["-h"], capture_output=True, text=True)
    assert r.returncode == 0
    assert "USAGE" in r.stdout and "-w" in r.stdout


def test_interop_with_oracle(tmp_path, sample, oracle):
    """CLI output decodes with the C++ binary and vice versa."""
    ours = tmp_path / "ours.bin"
    r = run_cli(["-c", "-m", "-i", str(sample), "-o", str(ours)], cwd=tmp_path)
    assert r.returncode == 0
    dec = tmp_path / "dec.bin"
    o = subprocess.run([str(oracle), "-d", "-i", str(ours), "-o", str(dec)],
                       capture_output=True)
    assert o.returncode == 0
    assert dec.read_bytes() == sample.read_bytes()

    ref = tmp_path / "ref.bin"
    o = subprocess.run([str(oracle), "-c", "-m", "-i", str(sample),
                        "-o", str(ref)], capture_output=True)
    assert o.returncode == 0
    assert ref.read_bytes() == ours.read_bytes()
    back = tmp_path / "back.bin"
    r = run_cli(["-d", "-i", str(ref), "-o", str(back)], cwd=tmp_path)
    assert r.returncode == 0
    assert back.read_bytes() == sample.read_bytes()


def test_v2_v3_formats(tmp_path, sample):
    for fmt in ["v2", "v3"]:
        c = tmp_path / f"{fmt}.bin"
        d = tmp_path / f"{fmt}.dec"
        r = run_cli(["-c", "-m", f"--format={fmt}", "--chunk-size=4096",
                     "-i", str(sample), "-o", str(c)], cwd=tmp_path)
        assert r.returncode == 0, (fmt, r.stderr)
        r = run_cli(["-d", f"--format={fmt}", "--chunk-size=4096",
                     "-i", str(c), "-o", str(d)], cwd=tmp_path)
        assert r.returncode == 0, (fmt, r.stderr)
        assert d.read_bytes() == sample.read_bytes()


# ---------------------------------------------------------------------------
# corrupted-payload exit codes (7, 10, 11, 13-15) — both the code AND the
# stderr line must match the oracle's (SURVEY.md §2.7 table)
# ---------------------------------------------------------------------------


def _v1_adapt_blob(payload: bytes) -> bytes:
    """Wrap raw payload bytes in a v1 adaptive container: FGK-encode them
    and prepend the Huffman header (flags = adapt only). Lets the tests
    craft adaptive payloads that are structurally broken INSIDE the
    Huffman coding (headers.cpp:67-98, transform.cpp:170-184, 354-358)."""
    import numpy as np
    import jax.numpy as jnp

    from huffman_codec_tpu.formats import make_huff_header
    from huffman_codec_tpu.models.chunked import _cdiv
    from huffman_codec_tpu.ops.fgk import fgk_encode_chunk, max_code_bits
    from huffman_codec_tpu.ops.pack import words_to_bytes

    n = len(payload)
    n_words = _cdiv(n * max_code_bits(n), 32) + 2
    words, bits = fgk_encode_chunk(
        jnp.asarray(np.frombuffer(payload, np.uint8)), jnp.int32(n), n_words)
    nb = (int(bits) + 7) // 8
    body = bytes(np.asarray(words_to_bytes(words, max(1, nb)))[:nb])
    return make_huff_header(n, False, True) + body


def _check_vs_oracle(tmp_path, oracle, blob: bytes, expect_code: int):
    bad = tmp_path / f"bad{expect_code}.bin"
    bad.write_bytes(blob)
    ours = run_cli(["-d", "-i", str(bad), "-o", str(tmp_path / "o.bin")],
                   cwd=tmp_path)
    ref = subprocess.run(
        [str(oracle), "-d", "-i", str(bad), "-o", str(tmp_path / "r.bin")],
        capture_output=True, cwd=tmp_path)
    assert ours.returncode == ref.returncode == expect_code, (
        expect_code, ours.returncode, ref.returncode, ours.stderr, ref.stderr)
    assert ours.stderr == ref.stderr, (ours.stderr, ref.stderr)


def test_exit_7_unwritable_output(tmp_path, sample, oracle):
    dest = str(tmp_path / "no_such_dir" / "x.bin")
    ours = run_cli(["-c", "-i", str(sample), "-o", dest], cwd=tmp_path)
    ref = subprocess.run([str(oracle), "-c", "-i", str(sample), "-o", dest],
                         capture_output=True, cwd=tmp_path)
    assert ours.returncode == ref.returncode == 7, (ours.stderr, ref.stderr)
    assert ours.stderr == ref.stderr


def test_exit_10_truncated_adapt_u64s(tmp_path, oracle):
    # Huffman payload shorter than the 24 header bytes (headers.cpp:67-71)
    _check_vs_oracle(tmp_path, oracle, _v1_adapt_blob(b"\x01\x02\x03four"), 10)


def test_exit_11_missing_scandirs(tmp_path, oracle):
    # valid W/H/bs but zero of the required scanDir bytes (headers.cpp:94-98)
    import struct as st
    _check_vs_oracle(tmp_path, oracle,
                     _v1_adapt_blob(st.pack(">QQQ", 512, 512, 8)), 11)


def test_exit_13_block_overshoot(tmp_path, oracle):
    # count byte expands past the 8x8 tile (transform.cpp:180-184)
    import struct as st
    payload = (st.pack(">QQQ", 8, 8, 8) + b"\x80"  # 1 tile, horizontal
               + b"AAA" + bytes([200]))
    _check_vs_oracle(tmp_path, oracle, _v1_adapt_blob(payload), 13)


def test_exit_14_block_underrun(tmp_path, oracle):
    # payload ends before the tile is complete (transform.cpp:170-174)
    import struct as st
    payload = st.pack(">QQQ", 8, 8, 8) + b"\x80" + b"AB"
    _check_vs_oracle(tmp_path, oracle, _v1_adapt_blob(payload), 14)


def test_exit_15_leftover_bytes(tmp_path, oracle):
    # bytes remain after the last tile decoded (transform.cpp:354-358)
    import struct as st
    payload = (st.pack(">QQQ", 8, 8, 8) + b"\x80"
               + bytes(range(64)) + b"ZZ")
    _check_vs_oracle(tmp_path, oracle, _v1_adapt_blob(payload), 15)


def test_stats_flag(tmp_path, sample):
    r = run_cli(["-c", "-m", "--stats", "--format=v3", "--chunk-size=1024",
                 "-i", str(sample), "-o", str(tmp_path / "s.bin")],
                cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    import json as _json
    line = [l for l in r.stderr.decode().splitlines()
            if l.startswith("{")][-1]
    m = _json.loads(line)
    assert m["input_bytes"] == 2048 and m["n_chunks"] == 2
    # tiny input under compile latency can round to 0.000 MB/s
    assert 0 < m["bpc"] < 16 and m["encode_s"] > 0


def test_dump_tables_v3_and_v1(tmp_path, capsys):
    """--dump-tables analogue of HuffTree::print (huffman.cpp:231-266):
    canonical per-chunk tables for v3, replayed FGK tree for v1."""
    import io

    from huffman_codec_tpu.models import CodecConfig, TPUCodec
    from huffman_codec_tpu.pyref.codec import compress
    from huffman_codec_tpu.utils.dump import dump_v1_tree, dump_v3_tables

    raw = pathlib.Path("/root/reference/data/hd01.raw").read_bytes()[:16384]
    blob3 = TPUCodec(CodecConfig(use_diff=True, chunk_size=16384,
                                 lane=512, whole_file=False)).encode(raw)
    buf = io.StringIO()
    dump_v3_tables(blob3, out=buf)
    s = buf.getvalue()
    assert "chunk 0:" in s and "len" in s and "code" in s

    blob1 = compress(raw[:2048], use_diff=True)
    buf = io.StringIO()
    dump_v1_tree(blob1, out=buf)
    s = buf.getvalue()
    assert "FGK tree" in s and "NYT" in s
